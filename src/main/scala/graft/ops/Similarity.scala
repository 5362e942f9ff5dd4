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

  /** Fold-based dot product of a vector column with a constant plane. */
  private def dotConst(v: Column, plane: Array[Double]): Column =
    aggregate(
      zip_with(v, array(plane.toIndexedSeq.map(lit): _*), (x, y) => x.cast(DoubleType) * y),
      lit(0.0), (acc, x) => acc + x)

  /** Dot product of two vector columns — native codegen'd expression
    * (graft.functions.VectorDot); same left-to-right double accumulation
    * as the HOF formulation, ~10× faster in the hot loop. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = graft.functions.VectorExprs.cosine_sim(a, b)

  /** t LSH tables of `bits` hyperplane signs each. Returns array of
    * (table, sig) structs for explode-join candidate generation. */
  def lshTables(v: Column, tables: Int = 4, bits: Int = 6): Column = {
    require(tables * bits <= planes.length,
      s"tables*bits = ${tables * bits} exceeds the ${planes.length} seeded planes")
    array((0 until tables).map { tb =>
      val sig = (0 until bits).map { b =>
        when(dotConst(v, planes(tb * bits + b)) >= 0,
          shiftleft(lit(1), b)).otherwise(lit(0))
      }.reduce(_.bitwiseOR(_))
      struct(lit(tb).as("tb"), sig.as("sig"))
    }: _*)
  }

  /** Multiprobe variant for the QUERY side: besides each table's bucket,
    * probe the bucket with the least-confident bit flipped (smallest |dot|
    * against its hyperplane) — the standard recall boost that costs one
    * extra probe instead of another full table. Deterministic. */
  def lshTablesMultiprobe(v: Column, tables: Int = 4, bits: Int = 6): Column = {
    require(tables * bits <= planes.length,
      s"tables*bits = ${tables * bits} exceeds the ${planes.length} seeded planes")
    array((0 until tables).flatMap { tb =>
      val dots = (0 until bits).map(b => dotConst(v, planes(tb * bits + b)))
      val sig = dots.zipWithIndex.map { case (d, b) =>
        when(d >= 0, shiftleft(lit(1), b)).otherwise(lit(0))
      }.reduce(_.bitwiseOR(_))
      // weakest bit = argmin |dot| (deterministic tie-break on bit index)
      val weakest = array_min(array(dots.zipWithIndex.map { case (d, b) =>
        struct(abs(d).as("a"), lit(b).as("b"))
      }: _*)).getField("b")
      // shiftleft needs a literal shift amount — select the flip via CASE
      val flipped = (0 until bits).map(b =>
        when(weakest === b, sig.bitwiseXOR(lit(1 << b))))
        .reduce((a, b) => coalesce(a, b))
      Seq(struct(lit(tb).as("tb"), sig.as("sig")),
        struct(lit(tb).as("tb"), flipped.as("sig")))
    }: _*)
  }

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
    * cosine rank within candidates. Approximate — recall tested vs brute. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // candidate generation carries IDs only — vectors rejoin after the
    // (id, id) distinct, so no array column crosses a shuffle twice
    val cT = corpus
      .select(col("vec_id"), explode(lshTables(col("embedding"))).as("t"))
      .select(col("vec_id"), col("t.tb").as("tb"), col("t.sig").as("sig"))
    val qT = queries
      .select(col("vec_id").as("query_id"),
        explode(lshTablesMultiprobe(col("embedding"))).as("t"))
      .select(col("query_id"), col("t.tb").as("tb"), col("t.sig").as("sig"))
      .distinct()
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    cT.join(broadcast(qT), Seq("tb", "sig"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
      .join(corpus.select(col("vec_id"), col("embedding"), col("label")), Seq("vec_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cos", cosine(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "label", "cos")
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
    def cellScores(v: Column): Seq[(Long, Column)] =
      centroids.toSeq.map { case (cid, cvec) =>
        cid -> graft.functions.VectorExprs.vec_dot(v, array(cvec.toIndexedSeq.map(lit): _*))
      }
    // argmax centroid per corpus vector (greatest over (score, cell) structs)
    def bestCells(v: Column, take: Int): Column = {
      val scored = array(cellScores(v).map { case (cid, s) =>
        struct(s.as("score"), lit(cid).as("cell"))
      }: _*)
      slice(reverse(array_sort(scored)), 1, take)
    }
    val cAssigned = corpus
      .select(col("vec_id"), col("embedding"), col("label"),
        bestCells(col("embedding"), 1).getItem(0).getField("cell").as("cell"))
    val qProbes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode(bestCells(col("embedding"), nprobe)).as("p"))
      .select(col("query_id"), col("qv"), col("p.cell").as("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    cAssigned.join(broadcast(qProbes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "label", "cos")
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
    val withT = emb.select(col("vec_id").as("doc_id"),
      explode(lshTables(col("embedding"))).as("t"))
      .select(col("doc_id"), col("t.tb").as("tb"), col("t.sig").as("sig"))
    val byId = emb.select(col("vec_id"), col("embedding"))
    // single pass over the LSH pipeline (bucket collect + pair expansion),
    // vectors rejoin only for the candidate pairs
    Dedup.bucketPairs(withT, Seq("tb", "sig"))
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
