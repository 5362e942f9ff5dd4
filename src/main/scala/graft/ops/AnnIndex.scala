package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.tables.TableStore
import Tables.t

/** Persistent ANN index as a MANAGED TABLE (VERDICT r8 #4): the LSH
  * index — (bucket, vec_id, embedding, label) covering rows — lives in
  * TableStore, is maintained INCREMENTALLY from the corpus table's
  * append feed, and serves queries by scanning only the probed buckets'
  * files. The per-query pipelines ([[Similarity.annTopK]]) rebuild
  * signatures over the whole corpus on every call; at 100 TB that is a
  * full-corpus map pass per query batch. With the index stored:
  *
  *  - build cost is paid ONCE (and only for NEW vectors thereafter —
  *    `refresh` indexes exactly the corpus rows appended since the last
  *    indexed snapshot via [[TableStore.readAppendedSince]], a
  *    manifest-sidecar read, never a corpus rescan);
  *  - the index table is range-clustered by bucket with zone stats, so
  *    a query's probe set (a few dozen bucket ids) FILE-SKIPS to the
  *    touched buckets — query cost scales with bucket volume, not
  *    corpus volume;
  *  - rows are COVERING (embedding + payload in the index), so serving
  *    needs no join back to the corpus — the classic covering-index
  *    trade: ×tables storage for zero-join reads.
  *
  * Results are IDENTICAL to [[Similarity.annTopK]] over the same corpus
  * (same quantized-plane signatures, same multiprobe probes, same
  * bounded top-k) — pinned by the `sim_ann_incremental` gate whose
  * DuckDB oracle recomputes the whole pipeline from inlined constants. */
object AnnIndex {

  /** Property on the INDEX table: the corpus snapshot version whose
    * rows the index covers. */
  private val IndexedVersionProp = "ann.indexed-version"

  private def indexRows(corpus: DataFrame): DataFrame =
    corpus.select(
      explode_outer(Similarity.lshBucketsQ(col("embedding"))).as("bucket"),
      col("vec_id"), col("embedding"), col("label"))

  /** Create/refresh `indexTable` to cover `corpusTable`'s CURRENT
    * snapshot. Incremental by construction: only rows appended since
    * the last indexed version are signed and appended (clustered by
    * bucket before the write so zone stats stay tight). A corpus
    * mutation (delete/update/compact) since the indexed version cannot
    * be served by an append-only delta — the index rebuilds from
    * scratch, loudly, rather than silently serving deleted vectors.
    * Returns the number of corpus rows indexed by THIS call. */
  /** LSH tables in the signature expression (lshBucketsQ default): each
    * corpus row contributes exactly this many covering index rows. */
  private val LshTables = 4L

  def refresh(store: TableStore, corpusTable: String,
      indexTable: String): Long = {
    val corpusV = store.currentVersion(corpusTable)
    val exists = store.exists(indexTable)
    val indexedV =
      if (!exists) 0
      else store.properties(indexTable)
        .get(IndexedVersionProp).flatMap(_.toIntOption).getOrElse(0)
    if (exists && indexedV == corpusV) return 0L
    // append-only delta is valid only if every commit since indexedV
    // appended (no removals, no new delete sidecars). A stale pointer
    // PAST the corpus head (the corpus was re-created under the index)
    // can never serve a delta — full rebuild.
    val appendOnly = exists && indexedV > 0 && indexedV < corpusV &&
      ((indexedV + 1) to corpusV).forall(v =>
        store.commitAppendedOnly(corpusTable, v).isDefined)
    val (src, fullRebuild) =
      if (appendOnly) (store.readAppendedSince(corpusTable, indexedV), false)
      else (store.read(corpusTable), true)
    val rows = indexRows(src).persist()
    try {
      val n = rows.count()
      if (fullRebuild || !exists) {
        store.create(indexTable, rows.schema, overwrite = true,
          zoneCols = Seq("bucket"))
      }
      // range-clustered by bucket: each probe's files are contiguous and
      // zone stats carry tight bucket bounds per file
      store.append(indexTable,
        rows.repartitionByRange(8, col("bucket")))
      store.setProperties(indexTable,
        Map(IndexedVersionProp -> Some(corpusV.toString)))
      n / LshTables // each corpus row contributes LshTables index rows
    } finally { rows.unpersist(); () }
  }

  /** Serve top-k ANN from the STORED index: probe buckets come from the
    * query set (multiprobe — same probes as [[Similarity.annTopK]]),
    * the index scan is FILE-SKIPPED to those buckets via an IN filter
    * over the zone-indexed bucket column, and exact cosine ranks within
    * candidates through the bounded [[graft.functions.TopKAggregator]].
    * No join back to the corpus — the index rows are covering. */
  def query(store: TableStore, indexTable: String, queries: DataFrame,
      k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qT = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode_outer(Similarity.lshBucketsQ(col("embedding"),
          multiprobe = true)).as("bucket"))
      .persist()
    try {
      // the probe set is tiny (queries × 2·tables); collecting it lets
      // the scan's pushed IN-filter zone-prune index files at plan time
      val probeBuckets = qT.select("bucket").distinct()
        .collect().map(_.getLong(0)).toSeq
      store.read(indexTable)
        .filter(col("bucket").isin(probeBuckets: _*))
        .join(broadcast(qT), Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"),
          Similarity.cosine(col("embedding"), col("qv")).as("score"),
          col("vec_id").as("id"), col("label").as("payload"))
        .as[graft.functions.ScoredRow]
        .groupByKey(_.query_id)
        .agg(new graft.functions.TopKAggregator(k).toColumn.name("topk"))
        .toDF("query_id", "topk")
        .select(col("query_id"), posexplode(col("topk")))
        .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
          col("col.id").as("vec_id"), col("col.payload").as("label"),
          col("col.score").as("cos"))
    } finally { qT.unpersist(); () }
  }

  // ---- gate ------------------------------------------------------------

  /** Incremental-index gate: corpus lands in two appends; the index is
    * built after the first and REFRESHED after the second — the refresh
    * require()s that only the second batch was signed (no rebuild: the
    * first refresh's index files survive untouched). Queries served
    * from the stored index must equal the per-query ANN pipeline, which
    * the DuckDB oracle recomputes end-to-end from inlined plane
    * constants (same oracle family as sim_ann_lsh). */
  private def simAnnIncremental(spark: SparkSession, dir: String): DataFrame = {
    val store = new TableStore(spark,
      Scratch.dir("sim-ann-inc", Scratch.tag(dir)))
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), Similarity.quantize(col("embedding"))
        .as("embedding"), col("label"))
    val first = emb.filter(col("vec_id") % 3 =!= 0)
    val second = emb.filter(col("vec_id") % 3 === 0)
    // gate idempotence: a previous run's index would otherwise carry a
    // pointer into the corpus history this run is about to re-create
    if (store.exists("annidx")) store.drop("annidx")
    store.create("corpus", emb.schema, overwrite = true)
    store.append("corpus", first)
    val n1 = refresh(store, "corpus", "annidx")
    require(n1 > 0, "initial build indexed nothing")
    val filesAfterBuild = store.currentRelPaths("annidx").toSet
    store.append("corpus", second)
    val n2 = refresh(store, "corpus", "annidx")
    require(n2 == second.count(),
      s"refresh must index EXACTLY the appended rows, signed $n2 of " +
        s"${second.count()}")
    require(filesAfterBuild.subsetOf(store.currentRelPaths("annidx").toSet),
      "refresh must append to the index, not rebuild it")
    // idempotence: nothing new → nothing indexed
    require(refresh(store, "corpus", "annidx") == 0L,
      "refresh with no corpus change must be a no-op")
    val queries = emb.filter(col("vec_id") < 8)
    query(store, "annidx", queries, 10).orderBy("query_id", "rank")
  }

  val all: Seq[Q] = Seq(
    Q("sim_ann_incremental", simAnnIncremental,
      Some(Similarity.annOracleSql)))
}
