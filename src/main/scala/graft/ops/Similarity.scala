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

  /** Hyperplanes quantized to whole-valued doubles (×1e6, rounded) — the
    * constants behind [[lshBucketsQ]] and inlined verbatim into the DuckDB
    * oracle SQL, so both engines hash with the exact same integers. */
  private lazy val qplanes: Array[Array[Double]] =
    planes.map(_.map(p => math.round(p * 1e6).toDouble))

  /** Quantize a float-vector column to WHOLE-VALUED doubles:
    * `round(x * 1e6)`. Components stay ≤ ~5e5 in magnitude, so every dot
    * product and squared norm over 64 dims is an exact integer below 2^53
    * — exactly representable in double REGARDLESS of accumulation order,
    * which makes cosine = dot/(sqrt(n1)*sqrt(n2)) a chain of correctly-
    * rounded IEEE ops: bit-identical in any engine. This is what lets the
    * similarity gates be DuckDB-oracled (floats would differ by summation
    * order); the ~1e-6 relative quantization error is far below any
    * similarity threshold in use. Spark `round` and DuckDB `ROUND` both
    * round half away from zero. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x * lit(1e6)))

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

  /** [[lshBuckets]] against the QUANTIZED planes, for quantized vectors:
    * every hyperplane dot is an exact integer, so the sign bits and the
    * multiprobe argmin are exact comparisons — cross-engine reproducible
    * (the oracle SQL recomputes them from the same inlined constants). */
  def lshBucketsQ(v: Column, tables: Int = 4, bits: Int = 6,
      multiprobe: Boolean = false): Column = {
    require(tables * bits <= qplanes.length,
      s"tables*bits = ${tables * bits} exceeds the ${qplanes.length} seeded planes")
    graft.functions.LshExprs.lsh_buckets(
      v, qplanes.take(tables * bits).flatten, tables, bits, multiprobe)
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
    * cosine rank within candidates. Approximate — recall tested vs brute.
    *
    * Single corpus scan: signatures AND scoring happen in one map-only
    * pass (query probes broadcast WITH their vectors), so no corpus
    * re-scan or shuffle rejoin for candidate vectors. Only scored
    * (query_id, id, score, payload) rows — never embeddings — cross the
    * two small shuffles (per-table dedup, then bounded top-k). */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      quantizedHashing: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    def bkts(v: Column, multiprobe: Boolean): Column =
      if (quantizedHashing) lshBucketsQ(v, multiprobe = multiprobe)
      else lshBuckets(v, multiprobe = multiprobe)
    // query probes (multiprobe) carry the query vector: 2×tables rows per
    // query — tiny, broadcast. No dedup needed: within a table the flip
    // probe always differs from the base signature by construction, so
    // (query_id, bucket) rows are already distinct.
    val qT = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        explode_outer(bkts(col("embedding"), multiprobe = true)).as("bucket"))
    // corpus pass: one fused signature expression, bucket-match against
    // the broadcast probes, score in place
    val scored = corpus
      .select(col("vec_id"), col("embedding"), col("label"),
        explode_outer(bkts(col("embedding"), multiprobe = false)).as("bucket"))
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
    * Centroids are a deterministic corpus sample (every (n/k)-th vector,
    * selected by an explicit id predicate — NOT limit(), whose row choice
    * depends on scan order); each corpus vector is assigned to its best
    * centroid ONCE (broadcast centroids, codegen'd dot — a map-only
    * pass), queries probe their `nprobe` best cells, and exact cosine
    * ranks within the probed cells. At 100 TB the corpus side stays
    * partitioned by cell; only the tiny (query × nprobe) set is
    * broadcast.
    */
  /** Deterministic centroid seeds: every (n/k)-th vector, selected by an
    * explicit id predicate — NOT limit(), whose row choice depends on
    * scan order. */
  def seedCentroids(corpus: DataFrame, nCells: Int): Array[(Long, Array[Double])] = {
    val n = corpus.count()
    val step = math.max(1L, n / nCells)
    corpus
      .filter(col("vec_id") % step === 0 && col("vec_id") < step * nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
        case other => other.toString.toDouble
      }.toArray))
  }

  /** All centroid dots in ONE codegen'd expression (MatVecDots) — bound
    * to an attribute so argmax/probe derivations read materialized scores
    * instead of re-evaluating k separate dot expressions. (Shared with
    * [[AnnIndex]]'s persistent IVF index.) */
  private[ops] def cellDotsFor(cents: Array[(Long, Array[Double])])(v: Column): Column =
    graft.functions.VectorExprs.mat_vec_dots(
      v, cents.flatMap(_._2), cents.length)

  /** Best `take` cells from bound scores (greatest over (score, cell)
    * structs; deterministic — cell id breaks score ties). */
  private[ops] def bestCellsFor(cents: Array[(Long, Array[Double])])(
      scores: Column, take: Int): Column = {
    val scored = array(cents.toIndexedSeq.zipWithIndex.map { case ((cid, _), i) =>
      struct(element_at(scores, i + 1).as("score"), lit(cid).as("cell"))
    }: _*)
    slice(reverse(array_sort(scored)), 1, take)
  }

  /** Lloyd-refined IVF centroids: start from the deterministic seeds and
    * run `iters` distributed assign+average rounds. Each round is one
    * map-only assignment (broadcast centroids inside the codegen'd
    * MatVecDots literal) plus one per-(cell, dim) sum — posexplode feeds
    * a partial aggregate that collapses to ≤ cells×dim rows map-side, so
    * the shuffle is centroid-sized, not corpus-sized. Only cells×dim
    * doubles ever reach the driver; a cell that loses all members keeps
    * its previous centroid (k never decays). Seeded init and id-tie-broken
    * assignment make the ROUND STRUCTURE deterministic; the per-dim double
    * sums combine in task-completion order, so centroid bits can differ at
    * the last ulp across runs on general float data (irrelevant to recall;
    * bit-exact only when components are exactly representable, as in the
    * unit tests). */
  def kmeansCentroids(corpus: DataFrame, nCells: Int = 16,
      iters: Int = 2): Array[(Long, Array[Double])] = {
    var cents = seedCentroids(corpus, nCells)
    require(cents.nonEmpty, "kmeansCentroids needs a non-empty corpus")
    val dim = cents.head._2.length
    for (_ <- 1 to iters) {
      val assigned = corpus
        .select(col("embedding"), cellDotsFor(cents)(col("embedding")).as("_s"))
        .select(col("embedding"),
          bestCellsFor(cents)(col("_s"), 1).getItem(0).getField("cell").as("cell"))
      val stats = assigned
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy("cell", "pos")
        .agg(sum(col("col").cast(DoubleType)).as("s"), count(lit(1)).as("cnt"))
        .collect()
        .groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        stats.get(cid) match {
          case Some(rows) =>
            val mean = Array.ofDim[Double](dim)
            rows.foreach { r =>
              mean(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
            }
            (cid, mean)
          case None => (cid, old) // empty cell: keep previous centroid
        }
      }
    }
    cents
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nprobe: Int = 3,
      centroidsOverride: Array[(Long, Array[Double])] = null): DataFrame = {
    val spark = corpus.sparkSession
    val centroids =
      if (centroidsOverride != null) centroidsOverride
      else seedCentroids(corpus, nCells)
    def cellDots(v: Column): Column = cellDotsFor(centroids)(v)
    def bestCells(scores: Column, take: Int): Column =
      bestCellsFor(centroids)(scores, take)
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

  // ---- Product quantization (PQ) -------------------------------------------

  /** Product-quantization codebooks — the third ANN scale path (besides
    * LSH and IVF): memory compression. The vector is split into `m`
    * subspaces; each subspace gets up to `ksub` centroids taken from the
    * same deterministic corpus sample as [[seedCentroids]] (every
    * (n/ksub)-th vector, id-predicate selected), sliced to the subspace
    * dims. Codebook index order follows ascending seed id, so a SQL
    * oracle can re-derive the exact code assignment.
    * `codebooks(s)(j)` = centroid `j` of subspace `s`. */
  def pqCodebooks(corpus: DataFrame, m: Int = 8, ksub: Int = 16): Array[Array[Array[Double]]] = {
    val seeds = seedCentroids(corpus, ksub).sortBy(_._1)
    require(seeds.nonEmpty, "pqCodebooks needs a non-empty corpus")
    val dim = seeds.head._2.length
    require(dim % m == 0, s"dim $dim is not divisible into $m subspaces")
    val dsub = dim / m
    Array.tabulate(m)(s => seeds.map(_._2.slice(s * dsub, (s + 1) * dsub)))
  }

  /** PQ codes for a vector column: per subspace, the index of the
    * L2-nearest centroid (ties → lowest index). argmin ‖sub − c_j‖² is
    * evaluated as argmin (‖c_j‖² − 2·sub·c_j) — the ‖sub‖² term is
    * constant within a subspace — and that affine form is computed by ONE
    * fused MatVecDots per subspace over the augmented vector [sub, 1]
    * against rows [−2·c_j, ‖c_j‖²]. `array_position(d, array_min(d))`
    * picks the FIRST minimum, i.e. the lowest code on ties — an exact
    * comparison, because on the quantized view every distance is an
    * integer below 2^53. Map-only; at 100 TB the emitted `m` small ints
    * per vector are the index you materialize (~64× smaller than the
    * float vector), and scans read codes, never vectors. */
  def pqCodes(v: Column, books: Array[Array[Array[Double]]]): Column =
    array(books.toIndexedSeq.zipWithIndex.map { case (book, s) =>
      val dsub = book.head.length
      val flat = book.flatMap(c => c.map(_ * -2.0) :+ c.map(x => x * x).sum)
      val sub1 = concat(slice(v, s * dsub + 1, dsub).cast(ArrayType(DoubleType)),
        array(lit(1.0)))
      val d2 = graft.functions.VectorExprs.mat_vec_dots(sub1, flat, book.length)
      (array_position(d2, array_min(d2)) - 1).cast(IntegerType)
    }: _*)

  /** Per-query ADC lookup tables: `luts(s)(j)` = query_sub(s) · c_j.
    * The approximate dot of the query against ANY coded vector is then
    * Σ_s luts(s)(code_s) — `ksub × m` dots per query replace one dot per
    * corpus vector. */
  def pqLuts(v: Column, books: Array[Array[Array[Double]]]): Column =
    array(books.toIndexedSeq.zipWithIndex.map { case (book, s) =>
      val dsub = book.head.length
      graft.functions.VectorExprs.mat_vec_dots(
        slice(v, s * dsub + 1, dsub).cast(ArrayType(DoubleType)),
        book.flatten, book.length)
    }: _*)

  /** PQ ANN top-k with asymmetric-distance scoring and exact re-rank.
    *
    * Scan shape at scale: the corpus pass reads the CODES table (m bytes
    * per vector), scores each row with a zip_with/aggregate over the
    * broadcast per-query LUTs, and the bounded TopKAggregator keeps
    * `rerank` candidates per query map-side — only (queries × rerank)
    * rows cross the shuffle. The fetch-and-rerank pass then joins the
    * tiny candidate set back to the full vectors (broadcast candidates,
    * map-only on the corpus side) and ranks by exact cosine. This is the
    * standard PQ trade: 64× less scan bandwidth, approximation only in
    * who makes the candidate list, exact scores on what is returned. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, rerank: Int = 50): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val books = pqCodebooks(corpus, m, ksub)
    val codes = corpus.select(col("vec_id"), col("label"),
      pqCodes(col("embedding"), books).as("codes"))
    val ql = queries.select(col("vec_id").as("query_id"),
      pqLuts(col("embedding"), books).as("luts"))
    val cand = codes.crossJoin(broadcast(ql))
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
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val rer = corpus.select(col("vec_id"), col("embedding"), col("label"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        cosine(col("embedding"), col("qv")).as("cos"))
    // the window runs over queries × rerank rows — post-reduction, tiny
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    rer.withColumn("rank", row_number().over(w).cast(IntegerType))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "label", "cos")
  }

  // ---- registered queries --------------------------------------------------
  //
  // Gates run over the QUANTIZED embedding view ([[quantize]]): every dot,
  // norm and LSH signature bit is exact integer arithmetic in double, so
  // each gate has a value-exact DuckDB oracle. The float-vector library
  // entry points above stay as the production API; quantization is itself
  // a standard large-corpus trick (int8/int16 embedding compression).

  /** Quantized embedding view shared by gates and oracles. */
  private def qEmb(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), quantize(col("embedding")).as("embedding"),
        col("label"))

  private def queriesOf(df: DataFrame): DataFrame = df.filter(col("vec_id") < 8)

  private def simBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(spark, dir)
    bruteTopK(emb, queriesOf(emb), 10).orderBy("query_id", "rank")
  }

  private def simAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(spark, dir)
    annTopK(emb, queriesOf(emb), 10, quantizedHashing = true)
      .orderBy("query_id", "rank")
  }

  /** Embedding near-dup pairs: LSH candidates + cosine ≥ 0.4 across the
    * whole corpus (self-join flavour of the ANN machinery). */
  private def ddEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(spark, dir)
    val withT = emb.select(col("vec_id").as("doc_id"),
      explode_outer(lshBucketsQ(col("embedding"))).as("bucket"))
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
    * aggregation (fold + codegen'd dot) at group level. The PER-ROW fold
    * and dot are exact integers (quantized components), and the CROSS-ROW
    * sums go through DECIMAL(38,0), so the totals stay exact at ANY label
    * cardinality — a plain double sum() would silently turn accumulation-
    * order-dependent once a label's total passed 2^53 (~9e15; a sq-norm
    * total is ~1e12 per unit vector, i.e. ~9k rows per label away). */
  private def simCentroids(spark: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(spark, dir)
    val d380 = DecimalType(38, 0)
    val summed = emb.groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x).cast(d380)).as("sum_all_dims"),
        sum(dot(col("embedding"), col("embedding")).cast(d380)).as("sum_sq_norm"))
    summed.select(col("label"), col("n"),
      (col("sum_all_dims").cast(DoubleType) / col("n") / lit(1e6))
        .as("mean_component_sum"),
      (col("sum_sq_norm").cast(DoubleType) / col("n") / lit(1e12))
        .as("mean_sq_norm"))
      .orderBy("label")
  }

  private def simIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(spark, dir)
    ivfTopK(emb, queriesOf(emb), 10).orderBy("query_id", "rank")
  }

  private def simPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(spark, dir)
    pqTopK(emb, queriesOf(emb), 10).orderBy("query_id", "rank")
  }

  // ---- DuckDB oracles ------------------------------------------------------

  /** Quantized-view CTE shared by every oracle (mirrors [[qEmb]]). */
  private val qvCte =
    """qv AS (SELECT vec_id, LIST_TRANSFORM(embedding,
      |          x -> ROUND(x * 1e6)) AS v, label FROM embeddings)""".stripMargin

  /** Cosine over the quantized view — SAME op sequence as
    * VectorExprs.cosine_sim: dot / (sqrt(dot_aa) * sqrt(dot_bb)). */
  private def cosSql(a: String, b: String): String =
    s"LIST_DOT_PRODUCT($a, $b) / (SQRT(LIST_DOT_PRODUCT($a, $a)) * " +
      s"SQRT(LIST_DOT_PRODUCT($b, $b)))"

  /** The 24 quantized hyperplanes as a VALUES list — the same integers
    * [[qplanes]] feeds to LshBuckets, so both engines compute identical
    * signature bits. `e0` suffix forces DOUBLE literals (a bare `.0`
    * would lex as DECIMAL in DuckDB). */
  private def planesValuesSql: String =
    qplanes.zipWithIndex.map { case (row, i) =>
      row.map(v => s"${v.toLong}e0").mkString(s"($i, [", ", ", "])")
    }.mkString(",\n")

  /** Per-(vec, table) signature + weakest-bit CTEs (base LSH; the probe
    * CTE is appended only by the ANN oracle). */
  private def lshCtes: String =
    s"""pl(pid, p) AS (VALUES
       |$planesValuesSql),
       |$qvCte,
       |dots AS (SELECT vec_id, pid, LIST_DOT_PRODUCT(v, p) AS d
       |         FROM qv CROSS JOIN pl),
       |sigs AS (SELECT vec_id, pid // 6 AS tb,
       |           CAST(SUM(CASE WHEN d >= 0
       |             THEN (CAST(1 AS BIGINT) << (pid % 6)) ELSE 0 END) AS BIGINT) AS sig
       |         FROM dots GROUP BY vec_id, pid // 6),
       |bk AS (SELECT vec_id, tb * 4294967296 + sig AS bucket FROM sigs)""".stripMargin

  private def simBruteSql: String =
    s"""WITH $qvCte,
       |sc AS (SELECT q.vec_id AS query_id, c.vec_id, c.label,
       |         ${cosSql("c.v", "q.v")} AS cos
       |       FROM qv c CROSS JOIN qv q
       |       WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
       |rk AS (SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY cos DESC, vec_id) AS INT) AS "rank",
       |         vec_id, label, cos FROM sc)
       |SELECT query_id, "rank", vec_id, label, cos FROM rk
       |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin

  /** ANN oracle: corpus buckets = base signatures; query probes add, per
    * table, the signature with the least-confident bit flipped (smallest
    * |dot|, ties → lower bit — exact integer comparisons). Candidates
    * dedupe across tables (TopKAggregator collapses identical (score,id)
    * rows on the Spark side), then exact cosine ranks. */
  /** The ANN oracle, shared with [[AnnIndex]]'s incremental gate — the
    * stored-index query is result-identical to the per-query pipeline
    * by contract, so both check against the same end-to-end SQL. */
  private[ops] def annOracleSql: String = simAnnSql

  private def simAnnSql: String =
    s"""WITH $lshCtes,
       |wk AS (SELECT vec_id, tb, wbit FROM (
       |         SELECT vec_id, pid // 6 AS tb, pid % 6 AS wbit,
       |                ROW_NUMBER() OVER (PARTITION BY vec_id, pid // 6
       |                  ORDER BY ABS(d), pid) AS rn
       |         FROM dots) WHERE rn = 1),
       |qsig AS (SELECT s.vec_id, s.tb, s.sig,
       |           xor(s.sig, (CAST(1 AS BIGINT) << w.wbit)) AS psig
       |         FROM sigs s JOIN wk w ON s.vec_id = w.vec_id AND s.tb = w.tb
       |         WHERE s.vec_id < 8),
       |qbk AS (SELECT vec_id AS query_id, tb * 4294967296 + sig AS bucket FROM qsig
       |        UNION ALL
       |        SELECT vec_id, tb * 4294967296 + psig FROM qsig),
       |cand AS (SELECT DISTINCT q.query_id, c.vec_id
       |         FROM qbk q JOIN bk c USING (bucket)
       |         WHERE c.vec_id <> q.query_id),
       |sc AS (SELECT cand.query_id, cand.vec_id, cv.label,
       |         ${cosSql("cv.v", "qq.v")} AS cos
       |       FROM cand JOIN qv cv ON cv.vec_id = cand.vec_id
       |                 JOIN qv qq ON qq.vec_id = cand.query_id),
       |rk AS (SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY cos DESC, vec_id) AS INT) AS "rank",
       |         vec_id, label, cos FROM sc)
       |SELECT query_id, "rank", vec_id, label, cos FROM rk
       |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin

  /** Near-dup oracle: bucket sizes capped like Dedup.bucketPairs
    * (2..MaxBucket=50), pairs a<b distinct, verified at cosine ≥ 0.4. */
  private def ddEmbeddingSql: String =
    s"""WITH $lshCtes,
       |ok AS (SELECT bucket FROM bk GROUP BY bucket
       |       HAVING COUNT(*) BETWEEN 2 AND 50),
       |pr AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |       FROM bk x JOIN bk y USING (bucket) JOIN ok USING (bucket)
       |       WHERE x.vec_id < y.vec_id)
       |SELECT a, b, ${cosSql("va.v", "vb.v")} AS cos
       |FROM pr JOIN qv va ON va.vec_id = pr.a
       |        JOIN qv vb ON vb.vec_id = pr.b
       |WHERE ${cosSql("va.v", "vb.v")} >= 0.4
       |ORDER BY a, b""".stripMargin

  private def simCentroidsSql: String =
    s"""WITH $qvCte
       |SELECT label, COUNT(*) AS n,
       |  CAST(SUM(CAST(LIST_SUM(v) AS DECIMAL(38,0))) AS DOUBLE)
       |    / COUNT(*) / 1e6 AS mean_component_sum,
       |  CAST(SUM(CAST(LIST_DOT_PRODUCT(v, v) AS DECIMAL(38,0))) AS DOUBLE)
       |    / COUNT(*) / 1e12 AS mean_sq_norm
       |FROM qv GROUP BY label ORDER BY label""".stripMargin

  /** IVF oracle: centroid rule (every (n/16)-th vector, ids < step*16),
    * assignment/probes by (dot DESC, cell DESC) — Spark's
    * reverse(array_sort(struct(score, cell))) ordering — then exact
    * cosine ranks within probed cells. */
  private def simIvfSql: String =
    s"""WITH $qvCte,
       |st AS (SELECT GREATEST(1, COUNT(*) // 16) AS step FROM qv),
       |cent AS (SELECT vec_id AS cell, v AS cv FROM qv, st
       |         WHERE vec_id % step = 0 AND vec_id < step * 16),
       |cd AS (SELECT q.vec_id, c.cell, LIST_DOT_PRODUCT(q.v, c.cv) AS d
       |       FROM qv q CROSS JOIN cent c),
       |asg AS (SELECT vec_id, cell FROM (
       |          SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
       |            ORDER BY d DESC, cell DESC) AS rn FROM cd) WHERE rn = 1),
       |prb AS (SELECT vec_id AS query_id, cell FROM (
       |          SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
       |            ORDER BY d DESC, cell DESC) AS rn FROM cd
       |          WHERE vec_id < 8) WHERE rn <= 3),
       |cand AS (SELECT p.query_id, a.vec_id
       |         FROM prb p JOIN asg a USING (cell)
       |         WHERE a.vec_id <> p.query_id),
       |sc AS (SELECT cand.query_id, cand.vec_id, cv.label,
       |         ${cosSql("cv.v", "qq.v")} AS cos
       |       FROM cand JOIN qv cv ON cv.vec_id = cand.vec_id
       |                 JOIN qv qq ON qq.vec_id = cand.query_id),
       |rk AS (SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY cos DESC, vec_id) AS INT) AS "rank",
       |         vec_id, label, cos FROM sc)
       |SELECT query_id, "rank", vec_id, label, cos FROM rk
       |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin

  /** Oracle for [[AnnIndex]]'s INCREMENTAL IVF gate: centroids seed from
    * the INITIAL corpus subset only (vec_id % 3 <> 0 — the first append;
    * step from ITS count, seeds constrained to its members), then every
    * vector — both appends — assigns to those FIXED centroids and
    * queries probe them: exactly what a stored-centroid index serves
    * after an incremental refresh. */
  private[ops] def ivfIncrementalOracleSql: String =
    s"""WITH $qvCte,
       |cent AS (SELECT vec_id AS cell, v AS cv FROM (
       |           SELECT vec_id, v, ROW_NUMBER() OVER (ORDER BY
       |             ${graft.ops.PortableHash.h60Sql("CAST(vec_id AS VARCHAR)")},
       |             vec_id) AS hrn
       |           FROM qv WHERE vec_id % 3 <> 0) WHERE hrn <= 16),
       |cd AS (SELECT q.vec_id, c.cell, LIST_DOT_PRODUCT(q.v, c.cv) AS d
       |       FROM qv q CROSS JOIN cent c),
       |asg AS (SELECT vec_id, cell FROM (
       |          SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
       |            ORDER BY d DESC, cell DESC) AS rn FROM cd) WHERE rn = 1),
       |prb AS (SELECT vec_id AS query_id, cell FROM (
       |          SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
       |            ORDER BY d DESC, cell DESC) AS rn FROM cd
       |          WHERE vec_id < 8) WHERE rn <= 3),
       |cand AS (SELECT p.query_id, a.vec_id
       |         FROM prb p JOIN asg a USING (cell)
       |         WHERE a.vec_id <> p.query_id),
       |sc AS (SELECT cand.query_id, cand.vec_id, cv.label,
       |         ${cosSql("cv.v", "qq.v")} AS cos
       |       FROM cand JOIN qv cv ON cv.vec_id = cand.vec_id
       |                 JOIN qv qq ON qq.vec_id = cand.query_id),
       |rk AS (SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY cos DESC, vec_id) AS INT) AS "rank",
       |         vec_id, label, cos FROM sc)
       |SELECT query_id, "rank", vec_id, label, cos FROM rk
       |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin

  /** PQ oracle: codebooks re-derived from the same deterministic sample
    * rule (every (n/16)-th vector ascending → code index), 8 subspaces ×
    * 8 dims; encoding argmin by exact ‖c‖²−2·sub·c ties→lower code; ADC
    * approx = Σ_s lut[code_s] (exact integers, so SUM order is
    * irrelevant); top-50 candidates by (approx DESC, vec_id) — the
    * TopKAggregator ordering — then exact cosine ranks. */
  private def simPqSql: String =
    s"""WITH $qvCte,
       |st AS (SELECT GREATEST(1, COUNT(*) // 16) AS step FROM qv),
       |sub AS (SELECT vec_id, g.s AS s, LIST_SLICE(v, g.s*8+1, (g.s+1)*8) AS sv
       |        FROM qv CROSS JOIN GENERATE_SERIES(0, 7) g(s)),
       |cb AS (SELECT sub.s, sub.vec_id // step AS j, sub.sv AS cv
       |       FROM sub, st WHERE vec_id % step = 0 AND vec_id < step * 16),
       |enc AS (SELECT vec_id, s, code FROM (
       |          SELECT sub.vec_id, sub.s, cb.j AS code,
       |            ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |              ORDER BY LIST_DOT_PRODUCT(cb.cv, cb.cv)
       |                - 2 * LIST_DOT_PRODUCT(sub.sv, cb.cv), cb.j) AS rn
       |          FROM sub JOIN cb ON sub.s = cb.s) WHERE rn = 1),
       |lut AS (SELECT sub.vec_id AS query_id, sub.s, cb.j,
       |          LIST_DOT_PRODUCT(sub.sv, cb.cv) AS d
       |        FROM sub JOIN cb ON sub.s = cb.s WHERE sub.vec_id < 8),
       |adc AS (SELECT l.query_id, e.vec_id, SUM(l.d) AS approx
       |        FROM enc e JOIN lut l ON e.s = l.s AND e.code = l.j
       |        WHERE e.vec_id <> l.query_id
       |        GROUP BY l.query_id, e.vec_id),
       |cand AS (SELECT query_id, vec_id FROM (
       |          SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |            ORDER BY approx DESC, vec_id) AS rn FROM adc) WHERE rn <= 50),
       |sc AS (SELECT cand.query_id, cand.vec_id, cv.label,
       |         ${cosSql("cv.v", "qq.v")} AS cos
       |       FROM cand JOIN qv cv ON cv.vec_id = cand.vec_id
       |                 JOIN qv qq ON qq.vec_id = cand.query_id),
       |rk AS (SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY cos DESC, vec_id) AS INT) AS "rank",
       |         vec_id, label, cos FROM sc)
       |SELECT query_id, "rank", vec_id, label, cos FROM rk
       |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin

  /** Oracle for [[AnnIndex]]'s INCREMENTAL PQ gate: codebooks derive
    * from the INITIAL corpus subset only (vec_id % 3 <> 0 — step from
    * ITS count, seeds constrained to its members) with DENSE codebook
    * indices (`ROW_NUMBER` over seed id — the subset has gaps at
    * multiples of 3, so the full-corpus oracle's `vec_id // step`
    * indexing would mislabel codes), then every vector encodes against
    * those FIXED books and the ADC → exact-re-rank pipeline replays
    * end-to-end. */
  private[ops] def pqIncrementalOracleSql: String =
    s"""WITH $qvCte,
       |sub AS (SELECT vec_id, g.s AS s, LIST_SLICE(v, g.s*8+1, (g.s+1)*8) AS sv
       |        FROM qv CROSS JOIN GENERATE_SERIES(0, 7) g(s)),
       |picked AS (SELECT vec_id FROM (
       |            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY
       |              ${graft.ops.PortableHash.h60Sql("CAST(vec_id AS VARCHAR)")},
       |              vec_id) AS hrn
       |            FROM qv WHERE vec_id % 3 <> 0) WHERE hrn <= 16),
       |seeds AS (SELECT vec_id,
       |            ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j
       |          FROM picked),
       |cb AS (SELECT sub.s, seeds.j, sub.sv AS cv
       |       FROM sub JOIN seeds USING (vec_id)),
       |enc AS (SELECT vec_id, s, code FROM (
       |          SELECT sub.vec_id, sub.s, cb.j AS code,
       |            ROW_NUMBER() OVER (PARTITION BY sub.vec_id, sub.s
       |              ORDER BY LIST_DOT_PRODUCT(cb.cv, cb.cv)
       |                - 2 * LIST_DOT_PRODUCT(sub.sv, cb.cv), cb.j) AS rn
       |          FROM sub JOIN cb ON sub.s = cb.s) WHERE rn = 1),
       |lut AS (SELECT sub.vec_id AS query_id, sub.s, cb.j,
       |          LIST_DOT_PRODUCT(sub.sv, cb.cv) AS d
       |        FROM sub JOIN cb ON sub.s = cb.s WHERE sub.vec_id < 8),
       |adc AS (SELECT l.query_id, e.vec_id, SUM(l.d) AS approx
       |        FROM enc e JOIN lut l ON e.s = l.s AND e.code = l.j
       |        WHERE e.vec_id <> l.query_id
       |        GROUP BY l.query_id, e.vec_id),
       |cand AS (SELECT query_id, vec_id FROM (
       |          SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |            ORDER BY approx DESC, vec_id) AS rn FROM adc) WHERE rn <= 50),
       |sc AS (SELECT cand.query_id, cand.vec_id, cv.label,
       |         ${cosSql("cv.v", "qq.v")} AS cos
       |       FROM cand JOIN qv cv ON cv.vec_id = cand.vec_id
       |                 JOIN qv qq ON qq.vec_id = cand.query_id),
       |rk AS (SELECT query_id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY cos DESC, vec_id) AS INT) AS "rank",
       |         vec_id, label, cos FROM sc)
       |SELECT query_id, "rank", vec_id, label, cos FROM rk
       |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin

  /** Symmetric int8 quantization per vector (the standard embedding-index
    * compression step): scale = 127/amax over the quantized-integer view,
    * qi = round(x·127/amax). Every reported stat is order-INDEPENDENT —
    * amax/max_abs_err are maxes, sum_q sums integers ≤127 (exact in
    * double at any count), n_nonzero counts — so the gate is value-exact
    * cross-engine even though the per-element math is floating-point
    * (each element's chain is correctly-rounded IEEE ops on integers).
    * Map-only: no shuffle, no UDF; at 100 TB this runs embedded in the
    * scan stage. */
  def int8QuantStats(emb: DataFrame): DataFrame =
    emb
      .withColumn("amax", array_max(transform(col("q"), x => abs(x))))
      .filter(col("amax") > 0)
      .withColumn("qi",
        transform(col("q"), x => round(x * lit(127.0) / col("amax"))))
      .select(col("vec_id"),
        col("amax").cast(LongType).as("amax"),
        aggregate(col("qi"), lit(0L), (acc, x) => acc + x.cast(LongType))
          .as("sum_q"),
        size(filter(col("qi"), x => x =!= 0.0)).cast(IntegerType)
          .as("n_nonzero"),
        array_max(zip_with(col("q"), col("qi"),
          (x, i) => abs(x - i * col("amax") / lit(127.0)))).as("max_abs_err"))

  private def simQuantize(spark: SparkSession, dir: String): DataFrame =
    int8QuantStats(t(spark, dir, "embeddings")
      .select(col("vec_id"), quantize(col("embedding")).as("q")))
      .orderBy("vec_id")

  private def simQuantizeSql: String =
    s"""WITH $qvCte,
       |a AS (SELECT vec_id, v,
       |       LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))) AS amax FROM qv),
       |qi AS (SELECT vec_id, v, amax,
       |        LIST_TRANSFORM(v, x -> ROUND(x * 127.0 / amax)) AS qiv
       |       FROM a WHERE amax > 0)
       |SELECT vec_id, CAST(amax AS BIGINT) AS amax,
       | CAST(LIST_SUM(qiv) AS BIGINT) AS sum_q,
       | CAST(LEN(LIST_FILTER(qiv, x -> x <> 0)) AS INT) AS n_nonzero,
       | LIST_MAX(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(v)),
       |   i -> ABS(v[i] - qiv[i] * amax / 127.0))) AS max_abs_err
       |FROM qi ORDER BY vec_id""".stripMargin

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC dedup —
    * cluster the embeddings, then inside each cluster drop items whose
    * cosine to a KEPT item clears `tau`. Deterministic, fully-parallel
    * adaptation: a vector is a dup iff a LOWER-id vector shares its cell
    * with cosine ≥ tau (the paper keeps the item farthest from the
    * centroid; keeping the lowest id makes the answer order-free and
    * oracle-checkable — the one-hop rule also never chains, so a kept
    * item is always a genuine cluster representative).
    *
    * 100 TB shape: cell assignment is one map-only pass (broadcast
    * centroids inside the codegen'd MatVecDots literal); pair expansion
    * self-joins WITHIN cells only — O(Σ cell²), the paper's own cost
    * model — so `nCells` must scale ∝ corpus (the paper uses 50k cells
    * on LAION); the dup-id set distincts down before the anti join. */
  def semDedup(corpus: DataFrame, nCells: Int = 16, tau: Double = 0.4)
      : DataFrame = {
    // sorted by cell id: seedCentroids collects in SCAN order, which is
    // not contractual across file splits, and the argmax tie-break below
    // is positional
    val cents = seedCentroids(corpus, nCells).sortBy(_._1)
    // assignment argmax is O(k) builtins (array_max + array_position,
    // both codegen'd), NOT bestCellsFor's k-element struct-array sort:
    // with corpus-scaled k (1250 cells at the 100× corpus) the sort
    // array blows the codegen budget and the whole stage runs
    // interpreted — the round-7 scale sweep measured 680 s there.
    // Tie-break: FIRST maximal score = lowest cell id (array_position
    // returns the first hit), mirrored in the oracle's `cell ASC`.
    val cellIds = cents.map(_._1)
    val asg = corpus
      .select(col("vec_id"), col("embedding"),
        cellDotsFor(cents)(col("embedding")).as("_s"))
      .select(col("vec_id"), col("embedding"),
        element_at(typedLit(cellIds),
          array_position(col("_s"), array_max(col("_s"))).cast("int"))
          .as("cell"))
    // within-cell pairing runs as a PER-CELL in-memory kernel
    // (flatMapGroups): a cell is ~400 vectors ≈ 200 KB, so the whole
    // comparison is a tight local loop with EARLY EXIT on the first
    // matching lower id — dup-heavy cells (the hot case) degrade to
    // O(members), not O(members²). The declarative alternative — a
    // self-join on cell — materializes O(pairs) rows each dragging TWO
    // embedding arrays through the shuffle (~40 GB at the 100× corpus;
    // measured minutes); this kernel moves each vector exactly once.
    val spark0 = corpus.sparkSession
    import spark0.implicits._
    asg.select(col("cell"), col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .as[(Long, Long, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val members = it.toArray.sortBy(_._2)
        val n = members.length
        val vecs = members.map(_._3)
        val norms = vecs.map(v => math.sqrt(blasDot(v, v)))
        val out = new Array[(Long, Long, Boolean)](n)
        var b = 0
        while (b < n) {
          var dup = false
          var a = 0
          while (!dup && a < b) {
            val d = blasDot(vecs(a), vecs(b))
            if (norms(a) > 0 && norms(b) > 0 &&
              d / (norms(a) * norms(b)) >= tau) dup = true
            a += 1
          }
          out(b) = (members(b)._2, cell, dup)
          b += 1
        }
        out.iterator
      }
      .toDF("vec_id", "cell", "is_dup")
  }

  /** Plain double dot for the per-cell kernel (quantized components:
    * every partial sum is an exact integer — order-independent). */
  private def blasDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cell count SCALES with the corpus (the paper's own requirement —
    * within-cell pair cost is O(n²/k), so fixed k is quadratic): ~400
    * vectors per cell, floored at 16. At every driver SF (≤ 5k
    * vectors) this IS 16, so oracle results are unchanged there; the
    * 100× scale corpus gets 1250 cells and stays linear — the round-7
    * scale checkpoint caught exactly this gate running quadratic at a
    * fixed 16. */
  private def semCells(n: Long): Int = math.max(16L, n / 400L).toInt

  private def ddSemDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(spark, dir)
    semDedup(emb, nCells = semCells(emb.count()), tau = 0.4)
      .orderBy("vec_id")
  }

  /** SemDeDup oracle: the IVF centroid/assignment rule with the SAME
    * corpus-scaled cell count, then within-cell lower-id pairs at
    * cosine ≥ 0.4 mark the higher id. */
  private def ddSemDedupSql: String =
    s"""WITH $qvCte,
       |st AS (SELECT GREATEST(1, COUNT(*) //
       |           GREATEST(16, COUNT(*) // 400)) AS step,
       |         GREATEST(16, COUNT(*) // 400) AS cells FROM qv),
       |cent AS (SELECT vec_id AS cell, v AS cv FROM qv, st
       |         WHERE vec_id % step = 0 AND vec_id < step * cells),
       |cd AS (SELECT q.vec_id, c.cell, LIST_DOT_PRODUCT(q.v, c.cv) AS d
       |       FROM qv q CROSS JOIN cent c),
       |asg AS (SELECT vec_id, cell FROM (
       |          SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id
       |            ORDER BY d DESC, cell ASC) AS rn FROM cd) WHERE rn = 1),
       |dup AS (SELECT DISTINCT y.vec_id
       |        FROM asg x JOIN asg y ON x.cell = y.cell
       |                   AND x.vec_id < y.vec_id
       |        JOIN qv xv ON xv.vec_id = x.vec_id
       |        JOIN qv yv ON yv.vec_id = y.vec_id
       |        WHERE ${cosSql("xv.v", "yv.v")} >= 0.4)
       |SELECT a.vec_id, a.cell, (d.vec_id IS NOT NULL) AS is_dup
       |FROM asg a LEFT JOIN dup d ON a.vec_id = d.vec_id
       |ORDER BY a.vec_id""".stripMargin

  /** ANN quality evaluation: recall@k of the LSH index against the
    * brute-force ground truth, per query — the metric that decides
    * whether an approximate index is usable before pointing it at the
    * full corpus. Both sides are the exact pipelines the sim_brute_topk /
    * sim_ann_lsh gates already prove; recall is an integer hit count over
    * the truth set plus one exact int division.
    *
    * 100 TB shape: recall evaluation always runs on a SAMPLED query set
    * (here the gates' fixed 8 probes) — the brute-force side is the
    * expensive leg and is bounded by queries × corpus with broadcast
    * probes, while the ANN leg is the production path being measured. */
  def annRecall(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val truth = bruteTopK(corpus, queries, k)
      .select(col("query_id"), col("vec_id"))
    val ann = annTopK(corpus, queries, k, quantizedHashing = true)
      .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
    truth.join(ann, Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).cast(LongType).as("n_hits"))
      .select(col("query_id"), col("n_true"), col("n_hits"),
        (col("n_hits").cast(DoubleType) / col("n_true")).as("recall"))
  }

  private def simRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(spark, dir)
    annRecall(emb, queriesOf(emb), 10).orderBy("query_id")
  }

  /** Recall oracle: the brute rk CTE joined against the ANN rk CTE —
    * both verbatim from their own gates' oracles, so any divergence here
    * isolates to the recall composition itself. */
  private def simRecallSql: String =
    s"""WITH $lshCtes,
       |wk AS (SELECT vec_id, tb, wbit FROM (
       |         SELECT vec_id, pid // 6 AS tb, pid % 6 AS wbit,
       |                ROW_NUMBER() OVER (PARTITION BY vec_id, pid // 6
       |                  ORDER BY ABS(d), pid) AS rn
       |         FROM dots) WHERE rn = 1),
       |qsig AS (SELECT s.vec_id, s.tb, s.sig,
       |           xor(s.sig, (CAST(1 AS BIGINT) << w.wbit)) AS psig
       |         FROM sigs s JOIN wk w ON s.vec_id = w.vec_id AND s.tb = w.tb
       |         WHERE s.vec_id < 8),
       |qbk AS (SELECT vec_id AS query_id, tb * 4294967296 + sig AS bucket FROM qsig
       |        UNION ALL
       |        SELECT vec_id, tb * 4294967296 + psig FROM qsig),
       |cand AS (SELECT DISTINCT q.query_id, c.vec_id
       |         FROM qbk q JOIN bk c USING (bucket)
       |         WHERE c.vec_id <> q.query_id),
       |sca AS (SELECT cand.query_id, cand.vec_id,
       |         ${cosSql("cv.v", "qq.v")} AS cos
       |       FROM cand JOIN qv cv ON cv.vec_id = cand.vec_id
       |                 JOIN qv qq ON qq.vec_id = cand.query_id),
       |rka AS (SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY cos DESC, vec_id) AS rk FROM sca),
       |scb AS (SELECT q.vec_id AS query_id, c.vec_id,
       |         ${cosSql("c.v", "q.v")} AS cos
       |       FROM qv c CROSS JOIN qv q
       |       WHERE q.vec_id < 8 AND c.vec_id <> q.vec_id),
       |rkb AS (SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY cos DESC, vec_id) AS rk FROM scb)
       |SELECT b.query_id, COUNT(*) AS n_true,
       | CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       | CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |   / COUNT(*) AS recall
       |FROM (SELECT query_id, vec_id FROM rkb WHERE rk <= 10) b
       |LEFT JOIN (SELECT query_id, vec_id FROM rka WHERE rk <= 10) a
       |  ON a.query_id = b.query_id AND a.vec_id = b.vec_id
       |GROUP BY b.query_id ORDER BY b.query_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("sim_brute_topk", simBrute, Some(simBruteSql)),
    Q("sim_recall", simRecall, Some(simRecallSql)),
    Q("sim_ann_lsh", simAnn, Some(simAnnSql)),
    Q("sim_ann_ivf", simIvf, Some(simIvfSql)),
    Q("sim_ann_pq", simPq, Some(simPqSql)),
    Q("dd_embedding_cosine", ddEmbedding, Some(ddEmbeddingSql)),
    Q("dd_semdedup", ddSemDedup, Some(ddSemDedupSql)),
    Q("sim_label_centroids", simCentroids, Some(simCentroidsSql)),
    Q("sim_quantize", simQuantize, Some(simQuantizeSql)))
}
