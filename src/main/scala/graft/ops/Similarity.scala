package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables.t

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast, so the
  * big side streams through a map-only stage (exactly how you'd scan 100 TB
  * of vectors: no shuffle of the corpus, partial top-k per partition via
  * the rank-filter window on the small (query × k) result).
  *
  * Scale path: random-hyperplane LSH (4 tables × 6 bits) — candidates come
  * from bucket equality joins, cost proportional to collisions. Hyperplanes
  * are seeded constants, so results are deterministic run-to-run.
  */
object Similarity {

  /** Deterministic hyperplanes: 24 planes × 64 dims from a fixed seed. */
  private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(24, 64)(rnd.nextGaussian())
  }

  /** Dot product of two vector columns — native codegen'd expression
    * (graft.functions.VectorDot); same left-to-right double accumulation
    * as the HOF formulation, ~10× faster in the hot loop. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = graft.functions.VectorExprs.cosine_sim(a, b)

  /** Combined (table<<32 | signature) LSH bucket keys — the whole
    * dots→signature(→multiprobe flip) computation fused into ONE codegen'd
    * expression (graft.functions.LshBuckets). The spelled-out composition
    * of built-ins planned to a ~1500-node tree (≈0.5 s analysis + a
    * comparable codegen-compile hit per query) and originally evaluated
    * each hyperplane dot as an interpreted higher-order fold — the reason
    * round-1 sim_ann_lsh lost to the brute-force scan it is meant to
    * beat. Multiprobe adds, per table, the bucket with the
    * least-confident bit flipped (smallest |dot|; ties → lower bit). */
  def lshBuckets(v: Column, tables: Int = 4, bits: Int = 6,
      multiprobe: Boolean = false): Column = {
    require(tables * bits <= planes.length,
      s"tables*bits = ${tables * bits} exceeds the ${planes.length} seeded planes")
    graft.functions.LshExprs.lsh_buckets(
      v, planes.take(tables * bits).flatten, tables, bits, multiprobe)
  }

  /** LSH bucket keys exploded to (id, bucket) rows for bucket-equality
    * candidate generation. */
  def lshBucketRows(df: DataFrame, idCol: String, vecCol: String,
      outId: String, tables: Int = 4, bits: Int = 6): DataFrame =
    df.select(col(idCol).as(outId),
      explode_outer(lshBuckets(col(vecCol), tables, bits)).as("bucket"))

  /** Brute-force exact top-k neighbours for each query vector.
    *
    * Scoring is a map-only pass (query set broadcast, codegen'd cosine);
    * ranking uses the bounded TopKAggregator, so partial aggregation keeps
    * only k candidates per query map-side — (queries × k) rows cross the
    * shuffle, never the scored corpus (a window row_number would shuffle
    * and sort every scored row). */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = corpus.select(col("vec_id"), col("embedding"), col("label"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        cosine(col("embedding"), col("qv")).as("score"),
        col("vec_id").as("id"), col("label").as("payload"))
      .as[graft.functions.ScoredRow]
    scored.groupByKey(_.query_id)
      .agg(new graft.functions.TopKAggregator(k).toColumn.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("vec_id"), col("col.payload").as("label"),
        col("col.score").as("cos"))
  }

  /** ANN top-k: LSH-bucket candidates (union over tables), then exact
    * cosine rank within candidates. Approximate — recall tested vs brute.
    *
    * Single corpus scan: signatures AND scoring happen in one map-only
    * pass (query probes broadcast WITH their vectors), so no corpus
    * re-scan or shuffle rejoin for candidate vectors. Only scored
    * (query_id, id, score, payload) rows — never embeddings — cross the
    * two small shuffles (per-table dedup, then bounded top-k). */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // query probes (multiprobe) carry the query vector: 2×tables rows per
    // query — tiny, broadcast. No dedup needed: within a table the flip
    // probe always differs from the base signature by construction, so
    // (query_id, bucket) rows are already distinct.
    val qT = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode_outer(lshBuckets(col("embedding"), multiprobe = true)).as("bucket"))
    // corpus pass: one fused signature expression, bucket-match against
    // the broadcast probes, score in place
    val scored = corpus
      .select(col("vec_id"), col("embedding"), col("label"),
        explode_outer(lshBuckets(col("embedding"))).as("bucket"))
      .join(broadcast(qT), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        cosine(col("embedding"), col("qv")).as("score"),
        col("vec_id").as("id"), col("label").as("payload"))
    // a vector matching a query in several tables produces exact duplicate
    // (score, id) rows — TopKAggregator collapses those in its bounded
    // buffer, so no dedup shuffle stands between scoring and ranking
    scored
      .as[graft.functions.ScoredRow]
      .groupByKey(_.query_id)
      .agg(new graft.functions.TopKAggregator(k).toColumn.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("vec_id"), col("col.payload").as("label"),
        col("col.score").as("cos"))
  }

  /** IVF (inverted-file) ANN: the second scale path besides LSH.
    * Centroids are a deterministic corpus sample (every (n/k)-th vector);
    * each corpus vector is assigned to its best centroid ONCE (broadcast
    * centroids, codegen'd dot — a map-only pass), queries probe their
    * `nprobe` best cells, and exact cosine ranks within the probed cells.
    * At 100 TB the corpus side stays partitioned by cell; only the tiny
    * (query × nprobe) set is broadcast.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nprobe: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val n = corpus.count()
    val step = math.max(1L, n / nCells)
    val centroids = corpus.filter(col("vec_id") % step === 0)
      .limit(nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // all centroid dots in ONE codegen'd expression (MatVecDots) — bound
    // to an attribute so the argmax/probe derivation reads materialized
    // scores instead of re-evaluating 16 separate dot expressions
    val flatCentroids: Array[Double] =
      centroids.flatMap(_._2.map(_.toDouble))
    def cellDots(v: Column): Column =
      graft.functions.VectorExprs.mat_vec_dots(v, flatCentroids, centroids.length)
    // argmax centroid from bound scores (greatest over (score, cell) structs)
    def bestCells(scores: Column, take: Int): Column = {
      val scored = array(centroids.toIndexedSeq.zipWithIndex.map { case ((cid, _), i) =>
        struct(element_at(scores, i + 1).as("score"), lit(cid).as("cell"))
      }: _*)
      slice(reverse(array_sort(scored)), 1, take)
    }
    val cAssigned = corpus
      .select(col("vec_id"), col("embedding"), col("label"),
        cellDots(col("embedding")).as("_s"))
      .select(col("vec_id"), col("embedding"), col("label"),
        bestCells(col("_s"), 1).getItem(0).getField("cell").as("cell"))
    val qProbes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        cellDots(col("embedding")).as("_s"))
      .select(col("query_id"), col("qv"),
        explode(bestCells(col("_s"), nprobe)).as("p"))
      .select(col("query_id"), col("qv"), col("p.cell").as("cell"))
    // bounded top-k (not a window): partial aggregation keeps ≤k rows per
    // query map-side. No dedup concern — each corpus vector lives in
    // exactly one cell, so a (query, vec) pair scores at most once.
    import spark.implicits._
    cAssigned.join(broadcast(qProbes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        cosine(col("embedding"), col("qv")).as("score"),
        col("vec_id").as("id"), col("label").as("payload"))
      .as[graft.functions.ScoredRow]
      .groupByKey(_.query_id)
      .agg(new graft.functions.TopKAggregator(k).toColumn.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("vec_id"), col("col.payload").as("label"),
        col("col.score").as("cos"))
  }

  // ---- registered queries --------------------------------------------------

  private def queriesOf(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings").filter(col("vec_id") < 8)

  private def simBrute(spark: SparkSession, dir: String): DataFrame =
    bruteTopK(t(spark, dir, "embeddings"), queriesOf(spark, dir), 10)
      .orderBy("query_id", "rank")

  private def simAnn(spark: SparkSession, dir: String): DataFrame =
    annTopK(t(spark, dir, "embeddings"), queriesOf(spark, dir), 10)
      .orderBy("query_id", "rank")

  /** Embedding near-dup pairs: LSH candidates + cosine ≥ 0.4 across the
    * whole corpus (self-join flavour of the ANN machinery). */
  private def ddEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val withT = lshBucketRows(emb, "vec_id", "embedding", "doc_id")
    val byId = emb.select(col("vec_id"), col("embedding"))
    // single pass over the LSH pipeline (bucket collect + pair expansion),
    // vectors rejoin only for the candidate pairs
    Dedup.bucketPairs(withT, Seq("bucket"))
      .join(byId.withColumnRenamed("vec_id", "a").withColumnRenamed("embedding", "va"), Seq("a"))
      .join(byId.withColumnRenamed("vec_id", "b").withColumnRenamed("embedding", "vb"), Seq("b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= 0.4)
      .select("a", "b", "cos")
      .orderBy("a", "b")
  }

  /** Label-centroid stats: mean vector per label via element-wise array
    * aggregation, then each label's dispersion — exercises vector
    * aggregation (zip_with + fold) at group level. */
  private def simCentroids(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val summed = emb.groupBy("label")
      .agg(count(lit(1)).as("n"),
        // element-wise sum: reduce over collected arrays would not scale;
        // instead sum each dimension with posexplode → pivot-free groupBy
        sum(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast(DoubleType))).as("sum_all_dims"),
        sum(dot(col("embedding"), col("embedding"))).as("sum_sq_norm"))
    summed.select(col("label"), col("n"),
      (col("sum_all_dims") / col("n")).as("mean_component_sum"),
      (col("sum_sq_norm") / col("n")).as("mean_sq_norm"))
      .orderBy("label")
  }

  private def simIvf(spark: SparkSession, dir: String): DataFrame =
    ivfTopK(t(spark, dir, "embeddings"), queriesOf(spark, dir), 10)
      .orderBy("query_id", "rank")

  val all: Seq[Q] = Seq(
    Q("sim_brute_topk", simBrute, None),
    Q("sim_ann_lsh", simAnn, None),
    Q("sim_ann_ivf", simIvf, None),
    Q("dd_embedding_cosine", ddEmbedding, None),
    Q("sim_label_centroids", simCentroids, None))
}
