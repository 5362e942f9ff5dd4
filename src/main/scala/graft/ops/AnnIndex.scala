package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.tables.TableStore
import Tables.t

/** Persistent ANN indexes as MANAGED TABLES (VERDICT r8 #4) — all
  * three families: LSH (covering (bucket, vec_id, embedding, label)
  * rows), IVF (stored centroids + cell-clustered rows) and PQ (stored
  * codebooks + code rows). Each maintains INCREMENTALLY from the
  * corpus table's history — appends via the appended-files sidecar,
  * mutations via the CHANGE FEED ([[corpusDelta]]) — and serves
  * queries from the stored structure. The per-query pipelines
  * ([[Similarity.annTopK]] etc.) rebuild signatures over the whole
  * corpus on every call; at 100 TB that is a full-corpus map pass per
  * query batch. With the LSH index stored:
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

  /** Shared stamp on an index table AND its learned side table
    * (IVF centroids / PQ codebooks), written by [[rebuildIndex]] as
    * COMMIT METADATA of the two replacement commits — which publish in
    * ONE multi-table transaction, so the stamps (and the contents they
    * ride with) can never diverge. The pairing check is therefore an
    * ASSERTION against out-of-band mutation, no longer a retryable
    * race window; property-carried stamps from older staged-swap
    * rebuilds are honored as a fallback. Absent on both passes. */
  private val BuildIdProp = "ann.build-id"

  private def buildStampOf(store: TableStore, t: String): Option[String] =
    store.lastMetaValue(t, BuildIdProp)
      .orElse(store.properties(t).get(BuildIdProp))

  /** Call AFTER collecting the side table's rows (checking first would
    * be a check-then-act race against a concurrent rebuild). With the
    * atomic paired publish this cannot fire from a rebuild at all —
    * both stamps land in one transaction — it guards against tables
    * paired by hand or mutated outside the index machinery. */
  private def requirePaired(store: TableStore, indexTable: String,
      sideTable: String): Unit = {
    val a = buildStampOf(store, indexTable)
    val b = buildStampOf(store, sideTable)
    require(a == b,
      s"ANN index $indexTable and $sideTable carry different build " +
        "stamps — the pair was mutated outside maintain/rebuild_index; " +
        "CALL rebuild_index to restore the pairing")
  }

  /** Coverage pointer duplicated into the index commits' METADATA: the
    * property write ([[IndexedVersionProp]]) lands after the append
    * commit, so a crash between them would leave an index whose
    * CONTENTS cover the head while its pointer lags — the next refresh
    * would re-sign the gap and duplicate those vectors. The commit-meta
    * copy rides the append itself; [[indexedVersionOf]] trusts
    * whichever channel is FURTHER for the same corpus incarnation and
    * self-heals the property. (Delete-only deltas advance the pointer
    * property-only — safely: re-running a tombstone is idempotent.) */
  private val CoveredVersionMeta = "ann.covered-version"
  private val CoveredUuidMeta = "ann.covered-uuid"

  private def coverageMeta(corpusV: Int, corpusUuid: String,
      extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(CoveredVersionMeta -> corpusV.toString,
      CoveredUuidMeta -> corpusUuid) ++ extra

  /** Property on the INDEX table: the corpus table's identity token
    * ([[TableStore.tableUuid]]) the version pointer refers to. A bare
    * version is ambiguous across drop + re-create — if the new corpus's
    * head happens to equal the stored pointer, refresh would return 0
    * and silently serve a stale index. A uuid mismatch (or an index
    * predating the token) forces a full rebuild instead. */
  private val IndexedUuidProp = "ann.indexed-uuid"

  /** Version of `corpusUuid`'s corpus that `indexTable` covers; 0 when
    * the index doesn't exist, predates the uuid stamp, or was built
    * against a DIFFERENT incarnation of the corpus (→ full rebuild).
    * Reads BOTH channels — the property cache and the crash-safe
    * commit-meta copy ([[CoveredVersionMeta]]) — takes the further one
    * for this incarnation, and repairs a lagging property in place. */
  private def indexedVersionOf(store: TableStore, corpusUuid: String,
      indexTable: String): Int = {
    if (!store.exists(indexTable)) return 0
    val props = store.properties(indexTable)
    val propV =
      if (!props.get(IndexedUuidProp).contains(corpusUuid)) 0
      else props.get(IndexedVersionProp).flatMap(_.toIntOption).getOrElse(0)
    val metaV =
      if (!store.lastMetaValue(indexTable, CoveredUuidMeta)
        .contains(corpusUuid)) 0
      else store.lastMetaValue(indexTable, CoveredVersionMeta)
        .flatMap(_.toIntOption).getOrElse(0)
    if (metaV > propV) { // crash between append and property write
      store.setProperties(indexTable,
        Map(IndexedVersionProp -> Some(metaV.toString),
          IndexedUuidProp -> Some(corpusUuid)))
      metaV
    } else propV
  }

  private def indexRows(corpus: DataFrame): DataFrame =
    corpus.select(
      explode_outer(Similarity.lshBucketsQ(col("embedding"))).as("bucket"),
      col("vec_id"), col("embedding"), col("label"))

  /** Net corpus delta in `(indexedV, corpusV]` for index maintenance:
    * `(insert rows, Some(touched keys))` — or None when only a full
    * rebuild can serve (no prior coverage, or the feed's files expired).
    *
    *  - append-only history: inserts = the appended rows, no keys
    *    touched (the cheap path — a manifest-sidecar read);
    *  - mutations in range: the CHANGE FEED nets them — every touched
    *    `vec_id`'s stale index rows mask via ONE equality tombstone on
    *    the index (metadata-only, no index file rewritten), and keys
    *    whose LATEST change is an insert re-enter with their newest
    *    row (the index append commits after the tombstone, so the
    *    sequence rule keeps exactly the new rows visible). Index reads
    *    fold the tombstones like any merge-on-read table;
    *    `rewrite_deletes` / `materialize_deletes` are its maintenance.
    */
  private def corpusDelta(store: TableStore, corpusTable: String,
      indexedV: Int, corpusV: Int): Option[(DataFrame, Option[DataFrame])] = {
    if (indexedV <= 0 || indexedV >= corpusV) return None
    val appendOnly = ((indexedV + 1) to corpusV).forall(v =>
      store.commitAppendedOnly(corpusTable, v).isDefined)
    if (appendOnly)
      return Some((store.readAppendedSince(corpusTable, indexedV), None))
    try {
      val ch = store.changeFeed(corpusTable, indexedV, corpusV)
      // final state per key: latest commit wins; within one commit an
      // update is delete+insert of the same key — insert is the outcome
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id")
        .orderBy(col(TableStore.CommitVersionCol).desc,
          (col(TableStore.ChangeTypeCol) === "insert").desc)
      val latest = ch.withColumn("__rn",
          org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("__rn") === 1)
      val ins = latest
        .filter(col(TableStore.ChangeTypeCol) === "insert")
        .drop("__rn", TableStore.ChangeTypeCol, TableStore.CommitVersionCol)
      val touched = ch.select("vec_id").distinct()
      Some((ins, Some(touched)))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** LSH tables in the signature expression (lshBucketsQ default): each
    * corpus row contributes exactly this many covering index rows. */
  private val LshTables = 4L

  /** Deterministic seed selection by HASH RANK: the `n` vectors with the
    * smallest portable 60-bit id-hash (ties → lower id), evaluated as a
    * distributed top-k (TakeOrdered — no global sort). Unlike the
    * modular rule ([[Similarity.seedCentroids]], kept for its oracled
    * gates), this never degenerates on sparse or shifted id spaces —
    * the 100× corpus (ids offset by 1e8 per replica) left the modular
    * rule ZERO seeds. Cross-engine: the oracle ranks by the same
    * `md5`-prefix hash. Returned sorted by id (stable cell/codebook
    * ordering). */
  private def hashSeeds(corpus: DataFrame,
      n: Int): Array[(Long, Array[Double])] =
    corpus.select(col("vec_id"), col("embedding"),
        PortableHash.h60(col("vec_id")
          .cast(org.apache.spark.sql.types.StringType)).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(n)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
        case other => other.toString.toDouble
      }.toArray))
      .sortBy(_._1)

  /** Create/refresh `indexTable` to cover `corpusTable`'s CURRENT
    * snapshot, incrementally: appended corpus rows sign and append;
    * mutated history maintains THROUGH THE CHANGE FEED
    * ([[corpusDelta]] — deleted keys tombstone the index, changed keys
    * re-enter with their newest row) — a full rebuild happens only on
    * first build, a stale pointer, or an unreadable feed. Returns the
    * number of corpus rows indexed by THIS call. */
  def refresh(store: TableStore, corpusTable: String,
      indexTable: String): Long = {
    val corpusV = store.currentVersion(corpusTable)
    val corpusUuid = store.tableUuid(corpusTable)
    val exists = store.exists(indexTable)
    val indexedV = indexedVersionOf(store, corpusUuid, indexTable)
    if (exists && indexedV == corpusV && indexedV > 0) return 0L
    // delta maintenance needs prior coverage; a stale pointer PAST the
    // corpus head (the corpus was re-created under the index) or an
    // unreadable feed falls back to a full rebuild
    val delta =
      if (exists) corpusDelta(store, corpusTable, indexedV, corpusV)
      else None
    val (src, touched) = delta match {
      case Some((ins, t)) => (ins, t)
      case None => (store.read(corpusTable), None)
    }
    // mutations: ONE equality tombstone on the index masks every
    // touched key's stale rows (metadata-only); the append below
    // commits after it, so re-inserted keys stay visible (sequence rule)
    touched.foreach { keys =>
      if (!keys.isEmpty) store.deleteMoR(indexTable, keys, Seq("vec_id"))
    }
    val rows = indexRows(src).persist()
    try {
      val n = rows.count()
      if (delta.isEmpty || !exists) {
        store.create(indexTable, rows.schema, overwrite = true,
          zoneCols = Seq("bucket"))
      }
      // range-clustered by bucket: each probe's files are contiguous and
      // zone stats carry tight bucket bounds per file
      if (n > 0) store.append(indexTable,
        rows.repartitionByRange(8, col("bucket")),
        meta = coverageMeta(corpusV, corpusUuid))
      store.setProperties(indexTable,
        Map(IndexedVersionProp -> Some(corpusV.toString),
          IndexedUuidProp -> Some(corpusUuid)))
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

  // ---- persistent IVF --------------------------------------------------

  /** The IVF index family persisted the same way: the CENTROIDS are the
    * index's stateful core — seeded once from the corpus at first build
    * and STORED as a tiny managed table `<index>_centroids`
    * (cell, cv) — and the covering rows `(cell, vec_id, embedding,
    * label)` range-cluster by cell. `refreshIvf` assigns ONLY the
    * appended vectors to the FIXED stored centroids (one map-only pass,
    * centroids broadcast inside the codegen'd MatVecDots literal) — no
    * re-seeding, no reassignment of already-indexed vectors, which is
    * exactly what makes the refresh incremental and the served results
    * stable. Centroid DRIFT is the documented trade: after heavy
    * distribution shift, rebuild (drop the index) — same as every
    * IVF system; recall against brute force is the drift monitor. */
  def refreshIvf(store: TableStore, corpusTable: String,
      indexTable: String, nCells: Int = 16): Long = {
    val corpusV = store.currentVersion(corpusTable)
    val corpusUuid = store.tableUuid(corpusTable)
    val exists = store.exists(indexTable)
    val indexedV = indexedVersionOf(store, corpusUuid, indexTable)
    if (exists && indexedV == corpusV && indexedV > 0) return 0L
    val delta =
      if (exists) corpusDelta(store, corpusTable, indexedV, corpusV)
      else None
    val centTable = s"${indexTable}_centroids"
    val corpusDf = store.read(corpusTable)
    val spark = corpusDf.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Double])] =
      if (delta.isDefined && store.exists(centTable))
        store.read(centTable).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1)
      else {
        // first build (or forced rebuild): seed from the CURRENT corpus
        // by hash rank (never degenerates on sparse id spaces)
        val seeds = hashSeeds(corpusDf, nCells)
        require(seeds.nonEmpty, s"cannot seed IVF index: $corpusTable empty")
        val seedDf = seeds.toSeq.map(s => (s._1, s._2.toSeq))
          .toDF("cell", "cv")
        store.create(centTable, seedDf.schema, overwrite = true)
        store.append(centTable, seedDf)
        seeds
      }
    val (src, touched) = delta match {
      case Some((ins, t)) => (ins, t)
      case None => (store.read(corpusTable), None)
    }
    touched.foreach { keys =>
      if (!keys.isEmpty) store.deleteMoR(indexTable, keys, Seq("vec_id"))
    }
    val rows = src
      .select(col("vec_id"), col("embedding"), col("label"),
        Similarity.cellDotsFor(cents)(col("embedding")).as("_s"))
      .select(
        Similarity.bestCellsFor(cents)(col("_s"), 1)
          .getItem(0).getField("cell").as("cell"),
        col("vec_id"), col("embedding"), col("label"))
      .persist()
    try {
      val n = rows.count()
      if (delta.isEmpty || !store.exists(indexTable))
        store.create(indexTable, rows.schema, overwrite = true,
          zoneCols = Seq("cell"))
      if (n > 0)
        store.append(indexTable, rows.repartitionByRange(8, col("cell")),
          meta = coverageMeta(corpusV, corpusUuid))
      store.setProperties(indexTable,
        Map(IndexedVersionProp -> Some(corpusV.toString),
          IndexedUuidProp -> Some(corpusUuid)))
      n
    } finally { rows.unpersist(); () }
  }

  /** Top-k from the stored IVF index: probe cells come from the stored
    * centroids (a tiny collect), the index scan file-skips to the
    * probed cells, exact cosine ranks within candidates. */
  def queryIvf(store: TableStore, indexTable: String, queries: DataFrame,
      k: Int, nprobe: Int = 3): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // ONE consistent snapshot pins the centroids AND the index rows —
    // a rebuild publishing mid-query (its transaction moves both
    // pointers together) can no longer slip new index rows under
    // old-collected centroids: the pinned pair is from one instant,
    // and pinned manifests stay readable regardless of later commits
    val pinned = store.readConsistent(
      Seq(indexTable, s"${indexTable}_centroids"))
    val centRows = pinned(s"${indexTable}_centroids").collect()
    requirePaired(store, indexTable, s"${indexTable}_centroids")
    val cents = centRows
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val qProbes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        Similarity.cellDotsFor(cents)(col("embedding")).as("_s"))
      .select(col("query_id"), col("qv"),
        explode(Similarity.bestCellsFor(cents)(col("_s"), nprobe)).as("p"))
      .select(col("query_id"), col("qv"), col("p.cell").as("cell"))
      .persist()
    try {
      val probeCells = qProbes.select("cell").distinct()
        .collect().map(_.getLong(0)).toSeq
      pinned(indexTable)
        .filter(col("cell").isin(probeCells: _*))
        .join(broadcast(qProbes), Seq("cell"))
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
    } finally { qProbes.unpersist(); () }
  }

  // ---- persistent PQ ---------------------------------------------------

  /** The third index family persisted: PRODUCT QUANTIZATION. The
    * codebooks (m subspaces × ksub centroids) are the stateful core —
    * trained once from the corpus at first build and stored as
    * `<index>_codebooks` rows (s, j, cv) — and the covering rows carry
    * `(vec_id, codes, embedding, label)`. `refreshPq` ENCODES only the
    * appended vectors against the FIXED stored codebooks (map-only,
    * books broadcast inside the codegen'd distance expression).
    * Serving is the classic two-phase PQ read: the ADC scan projects
    * ONLY the codes column (parquet column pruning skips the vector
    * bytes — the 64× bandwidth trade PQ exists for), bounded top-`r`
    * candidates re-rank by exact cosine against the same table.
    * Codebook drift after distribution shift = rebuild, as with IVF. */
  def refreshPq(store: TableStore, corpusTable: String,
      indexTable: String, m: Int = 8, ksub: Int = 16): Long = {
    val corpusV = store.currentVersion(corpusTable)
    val corpusUuid = store.tableUuid(corpusTable)
    val exists = store.exists(indexTable)
    val indexedV = indexedVersionOf(store, corpusUuid, indexTable)
    if (exists && indexedV == corpusV && indexedV > 0) return 0L
    val delta =
      if (exists) corpusDelta(store, corpusTable, indexedV, corpusV)
      else None
    val bookTable = s"${indexTable}_codebooks"
    val corpusDf = store.read(corpusTable)
    val spark = corpusDf.sparkSession
    import spark.implicits._
    val books: Array[Array[Array[Double]]] =
      if (delta.isDefined && store.exists(bookTable)) {
        val rows = store.read(bookTable).collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
        val bySub = rows.groupBy(_._1)
        Array.tabulate(bySub.size)(s =>
          bySub(s).sortBy(_._2).map(_._3))
      } else {
        // hash-ranked seeds sliced into subspaces (same construction as
        // pqCodebooks, robust seeding)
        val seeds = hashSeeds(corpusDf, ksub)
        require(seeds.nonEmpty, s"cannot seed PQ index: $corpusTable empty")
        val dim = seeds.head._2.length
        require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
        val dsub = dim / m
        val trained = Array.tabulate(m)(s =>
          seeds.map(_._2.slice(s * dsub, (s + 1) * dsub)))
        val bookDf = trained.zipWithIndex.flatMap { case (book, s) =>
          book.zipWithIndex.map { case (cv, j) => (s, j, cv.toSeq) }
        }.toSeq.toDF("s", "j", "cv")
        store.create(bookTable, bookDf.schema, overwrite = true)
        store.append(bookTable, bookDf)
        trained
      }
    val (src, touched) = delta match {
      case Some((ins, t)) => (ins, t)
      case None => (corpusDf, None)
    }
    touched.foreach { keys =>
      if (!keys.isEmpty) store.deleteMoR(indexTable, keys, Seq("vec_id"))
    }
    val rows = src.select(col("vec_id"),
      Similarity.pqCodes(col("embedding"), books).as("codes"),
      col("embedding"), col("label")).persist()
    try {
      val n = rows.count()
      if (delta.isEmpty || !store.exists(indexTable))
        store.create(indexTable, rows.schema, overwrite = true,
          zoneCols = Seq("vec_id"))
      if (n > 0) store.append(indexTable,
        rows.repartitionByRange(8, col("vec_id")),
        meta = coverageMeta(corpusV, corpusUuid))
      store.setProperties(indexTable,
        Map(IndexedVersionProp -> Some(corpusV.toString),
          IndexedUuidProp -> Some(corpusUuid)))
      n
    } finally { rows.unpersist(); () }
  }

  /** Top-k from the stored PQ index: ADC scan over the CODES column
    * (vectors never read in phase one), bounded `rerank` candidates,
    * exact-cosine re-rank fetching only the candidates' vectors from
    * the same table (zone stats on vec_id prune the fetch). */
  def queryPq(store: TableStore, indexTable: String, queries: DataFrame,
      k: Int, rerank: Int = 50): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // pin codebooks + index rows to ONE consistent snapshot (see
    // queryIvf) — both scan phases below read the pinned frame
    val pinned = store.readConsistent(
      Seq(indexTable, s"${indexTable}_codebooks"))
    val bookRows = pinned(s"${indexTable}_codebooks").collect()
    requirePaired(store, indexTable, s"${indexTable}_codebooks")
    val rows = bookRows
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val bySub = rows.groupBy(_._1)
    val books = Array.tabulate(bySub.size)(s => bySub(s).sortBy(_._2).map(_._3))
    val ql = queries.select(col("vec_id").as("query_id"),
      Similarity.pqLuts(col("embedding"), books).as("luts"))
    val cand = pinned(indexTable)
      .select(col("vec_id"), col("label"), col("codes")) // NOT embedding
      .crossJoin(broadcast(ql))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        aggregate(zip_with(col("codes"), col("luts"),
          (c, l) => element_at(l, c + 1)), lit(0.0), (acc, x) => acc + x)
          .as("score"),
        col("vec_id").as("id"), col("label").as("payload"))
      .as[graft.functions.ScoredRow]
      .groupByKey(_.query_id)
      .agg(new graft.functions.TopKAggregator(rerank).toColumn.name("cand"))
      .toDF("query_id", "cand")
      .select(col("query_id"), explode(col("cand")).as("c"))
      .select(col("query_id"), col("c").getField("id").as("vec_id"))
    val qv = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"))
    val rer = pinned(indexTable)
      .select(col("vec_id"), col("embedding"), col("label"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        Similarity.cosine(col("embedding"), col("qv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    rer.withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "label", "cos")
  }

  /** Composite index maintenance — the one CALL a scheduler fires per
    * index per interval: (1) refresh to the corpus head (incremental —
    * appended rows index, mutated keys tombstone + re-enter), (2) fold
    * the index's own pending tombstones (`rewrite_deletes` — CDC-heavy
    * corpora otherwise accumulate sidecars on the index), (3) measure
    * RECALL against brute force on a deterministic hash-ranked corpus
    * sample — the drift monitor for the fixed-seed structures (IVF
    * centroids / PQ codebooks drift under distribution shift; LSH
    * planes do not but its bucket balance can). Returns
    * (rows indexed, tombstone entries before, after, truth pairs
    * sampled, recall, action) where action is "ok" or
    * "rebuild-recommended" when recall fell below `recallFloor`.
    * The sample is O(sample·k) driver-side pairs; brute force scans the
    * corpus ONCE with the sample broadcast — the same cost profile as
    * one ANN query batch, safe to run routinely at scale. */
  def maintainIndex(store: TableStore, corpusTable: String,
      indexTable: String, kind: String, sample: Int = 8, k: Int = 5,
      recallFloor: Double = 0.0): (Long, Long, Long, Long, Double, String) = {
    require(sample > 0 && k > 0, "sample and k must be positive")
    val rows = kind match {
      case "lsh" => refresh(store, corpusTable, indexTable)
      case "ivf" => refreshIvf(store, corpusTable, indexTable)
      case "pq"  => refreshPq(store, corpusTable, indexTable)
      case other => throw new IllegalArgumentException(
        s"unknown index kind '$other' (lsh | ivf | pq)")
    }
    val (before, after) = store.rewriteDeletes(indexTable)
    val corpus = store.read(corpusTable)
    // deterministic sample by portable hash rank (the hashSeeds rule):
    // stable across runs and engines, never degenerate on sparse ids
    // queries feeds two plans and truth two actions — persist both so
    // the brute-force corpus scan (the dominant cost) runs ONCE, as the
    // routine-maintenance cost profile promises
    val queries = corpus
      .select(col("vec_id"), col("embedding"))
      .orderBy(PortableHash.h60(col("vec_id")
        .cast(org.apache.spark.sql.types.StringType)), col("vec_id"))
      .limit(sample)
    val truth = Similarity.bruteTopK(corpus, queries, k)
      .select("query_id", "vec_id")
    // persists inside the try: a planning/execution failure between a
    // persist and the finally would otherwise pin cached partitions for
    // the session's lifetime
    try {
      queries.persist()
      truth.persist()
      val approx = (kind match {
        case "lsh" => query(store, indexTable, queries, k)
        case "ivf" => queryIvf(store, indexTable, queries, k)
        case _     => queryPq(store, indexTable, queries, k)
      }).select("query_id", "vec_id")
      val nTrue = truth.count()
      val hits = truth.join(approx, Seq("query_id", "vec_id"), "left_semi")
        .count()
      val recall = if (nTrue == 0) 1.0 else hits.toDouble / nTrue
      val action =
        if (recall >= recallFloor) "ok" else "rebuild-recommended"
      (rows, before.toLong, after.toLong, nTrue, recall, action)
    } finally { truth.unpersist(); queries.unpersist(); () }
  }

  /** Full re-seed + ATOMIC paired publish — what a user runs when
    * [[maintainIndex]] reports "rebuild-recommended": IVF centroids /
    * PQ codebooks re-seed from the CURRENT corpus (the drifted
    * distribution), the whole index builds fresh under a STAGED name,
    * and then the live index AND its learned side table are replaced
    * in ONE multi-table transaction ([[TableStore.overwriteAll]] under
    * [[TableStore.transaction]] — both pointer swaps publish through
    * one swapAll). The shared [[BuildIdProp]] stamp and the coverage
    * pointer ride the SAME commits' metadata, so no crash ordering can
    * mis-pair the tables or lag the pointer; a concurrent query keeps
    * serving the PRIOR snapshot (its files survive until expiry —
    * there is no missing-file window, unlike a directory swap), and
    * the pairing check demotes to an assertion. Cost: the staged build
    * is copied once into the live tables' dirs — index-sized, the
    * price of transactional publication. Returns the [[maintainIndex]]
    * report measured on the REBUILT index. */
  def rebuildIndex(store: TableStore, corpusTable: String,
      indexTable: String, kind: String, sample: Int = 8, k: Int = 5,
      recallFloor: Double = 0.0): (Long, Long, Long, Long, Double, String) = {
    require(store.exists(indexTable),
      s"no index $indexTable to rebuild — CALL maintain_index builds one")
    val stage = s"$indexTable${TableStore.StageMarker}rb-" +
      java.util.UUID.randomUUID().toString.take(8)
    val side = kind match {
      case "ivf" => Some("_centroids")
      case "pq"  => Some("_codebooks")
      case "lsh" => None
      case other => throw new IllegalArgumentException(
        s"unknown index kind '$other' (lsh | ivf | pq)")
    }
    val buildId = java.util.UUID.randomUUID().toString
    try {
      // a fresh name has no coverage pointer → the refresh takes its
      // full-build path, which re-seeds the side state from the head
      val rows = kind match {
        case "lsh" => refresh(store, corpusTable, stage)
        case "ivf" => refreshIvf(store, corpusTable, stage)
        case _     => refreshPq(store, corpusTable, stage)
      }
      val stageProps = store.properties(stage)
      val coverage = for {
        v <- stageProps.get(IndexedVersionProp)
        u <- stageProps.get(IndexedUuidProp)
      } yield (v, u)
      val clusterCol = kind match {
        case "lsh" => "bucket"
        case "ivf" => "cell"
        case _     => "vec_id"
      }
      store.transaction { tx =>
        val meta = Map(BuildIdProp -> buildId) ++
          coverage.map { case (v, u) =>
            Map(CoveredVersionMeta -> v, CoveredUuidMeta -> u)
          }.getOrElse(Map.empty)
        tx.overwriteAll(indexTable,
          store.read(stage).repartitionByRange(8, col(clusterCol)),
          meta = meta)
        side.foreach { s =>
          val sideDf = store.read(s"$stage$s")
          if (!tx.exists(s"$indexTable$s"))
            tx.create(s"$indexTable$s", sideDf.schema)
          tx.overwriteAll(s"$indexTable$s", sideDf,
            meta = Map(BuildIdProp -> buildId))
        }
        ()
      }
      // property CACHE of the coverage pointer — the commit-meta copy
      // published atomically above is authoritative after any crash
      // (indexedVersionOf self-heals from it)
      coverage.foreach { case (v, u) =>
        store.setProperties(indexTable,
          Map(IndexedVersionProp -> Some(v), IndexedUuidProp -> Some(u)))
      }
      val (_, before, after, nTrue, recall, action) =
        maintainIndex(store, corpusTable, indexTable, kind, sample, k,
          recallFloor)
      (rows, before, after, nTrue, recall, action)
    } finally {
      // stage cleanup is ALWAYS safe: nothing live references the
      // staged dirs (the publish copied their contents) — a failure
      // before publish just drops the partial build, the live pair
      // untouched
      (stage +: side.map(s => s"$stage$s").toSeq).foreach { t =>
        if (store.exists(t)) { scala.util.Try(store.drop(t, force = true)); () }
      }
    }
  }

  /** Incremental PQ gate — same shape as the LSH/IVF ones: codebooks
    * fix at first build (pinned byte-identical), the second refresh
    * encodes only the appended vectors, and the served top-k matches a
    * DuckDB oracle that re-derives codebooks from the INITIAL subset
    * and replays encode → ADC → re-rank end-to-end. */
  private def simAnnPqIncremental(spark: SparkSession,
      dir: String): DataFrame = {
    val store = new TableStore(spark,
      Scratch.dir("sim-pq-inc", Scratch.tag(dir)))
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), Similarity.quantize(col("embedding"))
        .as("embedding"), col("label"))
    val first = emb.filter(col("vec_id") % 3 =!= 0)
    val second = emb.filter(col("vec_id") % 3 === 0)
    if (store.exists("pqidx")) store.drop("pqidx")
    if (store.exists("pqidx_codebooks")) store.drop("pqidx_codebooks")
    store.create("corpus", emb.schema, overwrite = true)
    store.append("corpus", first)
    require(refreshPq(store, "corpus", "pqidx") > 0,
      "initial PQ build indexed nothing")
    val filesAfterBuild = store.currentRelPaths("pqidx").toSet
    val booksAfterBuild = store.read("pqidx_codebooks")
      .orderBy("s", "j").collect().toSeq
    store.append("corpus", second)
    val n2 = refreshPq(store, "corpus", "pqidx")
    require(n2 == second.count(),
      s"PQ refresh must encode EXACTLY the appended rows, got $n2")
    require(filesAfterBuild.subsetOf(store.currentRelPaths("pqidx").toSet),
      "PQ refresh must append to the index, not rebuild it")
    require(store.read("pqidx_codebooks").orderBy("s", "j").collect()
        .toSeq == booksAfterBuild,
      "stored codebooks must stay FIXED across incremental refreshes")
    require(refreshPq(store, "corpus", "pqidx") == 0L,
      "PQ refresh with no corpus change must be a no-op")
    val queries = emb.filter(col("vec_id") < 8)
    queryPq(store, "pqidx", queries, 10).orderBy("query_id", "rank")
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

  /** Incremental IVF gate: centroids fix at first build (pinned
    * byte-identical across refreshes), the second refresh assigns only
    * the appended vectors, and queries served from the stored index
    * match the oracle's fixed-centroid assignment end-to-end. */
  private def simAnnIvfIncremental(spark: SparkSession,
      dir: String): DataFrame = {
    val store = new TableStore(spark,
      Scratch.dir("sim-ivf-inc", Scratch.tag(dir)))
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), Similarity.quantize(col("embedding"))
        .as("embedding"), col("label"))
    val first = emb.filter(col("vec_id") % 3 =!= 0)
    val second = emb.filter(col("vec_id") % 3 === 0)
    if (store.exists("ivfidx")) store.drop("ivfidx")
    if (store.exists("ivfidx_centroids")) store.drop("ivfidx_centroids")
    store.create("corpus", emb.schema, overwrite = true)
    store.append("corpus", first)
    require(refreshIvf(store, "corpus", "ivfidx") > 0,
      "initial IVF build indexed nothing")
    val filesAfterBuild = store.currentRelPaths("ivfidx").toSet
    val centsAfterBuild = store.read("ivfidx_centroids")
      .orderBy("cell").collect().toSeq
    store.append("corpus", second)
    val n2 = refreshIvf(store, "corpus", "ivfidx")
    require(n2 == second.count(),
      s"IVF refresh must assign EXACTLY the appended rows, got $n2")
    require(filesAfterBuild.subsetOf(store.currentRelPaths("ivfidx").toSet),
      "IVF refresh must append to the index, not rebuild it")
    require(store.read("ivfidx_centroids").orderBy("cell").collect()
        .toSeq == centsAfterBuild,
      "stored centroids must stay FIXED across incremental refreshes")
    require(refreshIvf(store, "corpus", "ivfidx") == 0L,
      "IVF refresh with no corpus change must be a no-op")
    val queries = emb.filter(col("vec_id") < 8)
    queryIvf(store, "ivfidx", queries, 10).orderBy("query_id", "rank")
  }

  val all: Seq[Q] = Seq(
    Q("sim_ann_incremental", simAnnIncremental,
      Some(Similarity.annOracleSql)),
    Q("sim_ann_ivf_incremental", simAnnIvfIncremental,
      Some(Similarity.ivfIncrementalOracleSql)),
    Q("sim_ann_pq_incremental", simAnnPqIncremental,
      Some(Similarity.pqIncrementalOracleSql)))
}
