package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables.t
import Text.tokens

/** Deduplication operators over `documents`: exact (hash-groupBy),
  * MinHash+LSH banding, SimHash, and n-gram Jaccard verification.
  *
  * Scale design: signatures are computed in a single map-only pass with
  * higher-order functions (no explode, no UDFs, no shuffle); the only
  * shuffles are the band/chunk bucket self-joins, which is the textbook
  * LSH plan — candidate generation cost is proportional to bucket
  * collisions, never O(n²). Oversized buckets (degenerate hot keys) are
  * capped, the standard guard against skew at 100 TB.
  */
object Dedup {

  /** Word n-gram shingles (default 3) as a distinct array. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesFromToks(tokens(text), n)

  /** Same, over a materialized token-array column (see shingleHashesFromToks
    * for why the two-step matters). */
  def shinglesFromToks(toks: Column, n: Int = 3): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))

  /** k seeded min-hash AGGREGATES over exploded shingle rows — codegen'd
    * hash + min with map-side partial aggregation (one row per doc leaves
    * the map stage). */
  def minhashAggs(s: Column, k: Int): Seq[Column] =
    (0 until k).map(i => min(xxhash64(s, lit(i))).as(s"mh$i"))

  /** Hashed word-trigram shingles: one 64-bit hash per trigram via three
    * element_at lookups — no string concatenation, no slice allocation.
    * MinHash over the hash multiset equals MinHash over the distinct set
    * (duplicates never change a min), so no distinct is needed here. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    shingleHashesFromToks(tokens(text), n)

  /** Same, over an already-MATERIALIZED token-array column. Inside an HOF
    * lambda every outer subexpression is re-evaluated per element, so the
    * caller must bind `split()` to an attribute first (two-step select) —
    * otherwise tokenization runs once per shingle instead of once per doc. */
  def shingleHashesFromToks(toks: Column, n: Int = 3): Column =
    when(size(toks) < n, array(xxhash64(concat_ws(" ", toks))))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => xxhash64((0 until n).map(j => element_at(toks, i + j + 1)): _*)))

  /** Exact 3-gram Jaccard between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** 64 per-bit +1/−1 counters of the token stream, as one pure fold:
    * hash each token ONCE (`transform`), then test each bit of the bound
    * hash value. No explode, no shuffle, no per-bit re-hashing. */
  def simhashCounts(text: Column): Column =
    aggregate(
      transform(tokens(text), w => xxhash64(w)),
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(b =>
          when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1)
            .otherwise(-1)): _*),
        (x, y) => x + y))

  /** Assemble the SimHash from materialized counters (pass a bound column
    * so the fold above is not re-evaluated 64 times). */
  def simhashFromCounts(counts: Column): Column =
    (0 until 64).map(b =>
      when(element_at(counts, b + 1) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))

  /** 64-bit SimHash; sign of each counter becomes the bit. */
  def simhash(text: Column): Column = simhashFromCounts(simhashCounts(text))

  private val MaxBucket = 50 // cap degenerate LSH buckets (skew guard)

  /** Candidate pairs from bucketed ids: group each bucket once, cap its
    * size (skew guard), and expand id pairs from the collected array. ONE
    * pass over the signature pipeline — a bucket SELF-join would evaluate
    * the whole upstream twice (observed in the physical plan) and shuffle
    * it twice. Buckets are bounded by MaxBucket, so the expansion arrays
    * are tiny. Input: (bucket key columns ++ doc_id). */
  def bucketPairs(buckets: DataFrame, keyCols: Seq[String]): DataFrame = {
    val grouped = buckets
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, MaxBucket))
      .select(array_sort(array_distinct(col("ids"))).as("ids"))
    grouped
      .select(explode(
        flatten(transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(sequence(i + 1, size(col("ids")) - 1), j =>
            struct(element_at(col("ids"), i + 1).as("a"),
              element_at(col("ids"), j + 1).as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** MinHash → banded LSH candidate pairs → exact-Jaccard verification.
    * 16 bands × 4 rows (k=64) targets ~0.5 similarity.
    *
    * NOTE: persists the candidate pair set internally (the returned frame
    * depends on it lazily). Long-lived sessions calling this repeatedly
    * should `spark.catalog.clearCache()` after materializing results —
    * the bench/verify harnesses do. */
  def minhashNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val bands = 16; val rowsPerBand = 4
    // Signatures via explode + codegen'd min() aggregates: the 64 seeded
    // hashes run inside whole-stage codegen over trigram-hash ROWS (HOF
    // folds over arrays would be interpreted), and map-side partial
    // aggregation collapses to one row per doc before any shuffle.
    val shRows = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(shingleHashesFromToks(col("toks"))).as("s"))
    val mhAggs = minhashAggs(col("s"), bands * rowsPerBand)
    val sig = shRows.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*)
          .as("bh"))
    }
    val buckets = sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    // Pair generation via bucket-key self-join on ids: cheaper in COLD
    // runtime than collect_list+expansion (less generated code to compile,
    // and the exchange under both sides is reused). Skew guard caps bucket
    // size first. The (tiny) result is materialized once — it feeds three
    // consumers below, and without a persist each would re-run the whole
    // signature pipeline (observed 7× runtime in the bench).
    val sized = buckets.withColumn("bucket_n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("band", "bh")))
      .filter(col("bucket_n") <= MaxBucket)
    val l = sized.select(col("band"), col("bh"), col("doc_id").as("a"))
    val r = sized.select(col("band"), col("bh"), col("doc_id").as("b"))
    val pairs = l.join(r, Seq("band", "bh")).filter(col("a") < col("b"))
      .select("a", "b").distinct().persist()
    pairs.count() // force materialization before the fan-out
    // exact-Jaccard verify on the candidate SUBSET only: semi-join the
    // corpus down to candidate ids before computing shingle sets
    val candIds = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    val candSh = docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), array_distinct(shingleHashesFromToks(col("toks"))).as("sh"))
    pairs
      .join(candSh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(candSh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"), jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Resolve near-dup PAIRS into duplicate CLUSTERS and pick one canonical
    * doc (smallest id) per cluster — distributed min-label propagation:
    * each node repeatedly adopts the smallest canonical id among itself and
    * its neighbours until fixpoint. Converges in O(log(cluster diameter))
    * iterations of two hash joins; no driver-side graph, so it holds when
    * the pair set itself is large. Returns (doc_id, canonical).
    */
  def dupClusters(pairs: DataFrame, maxIter: Int = 10,
      smallGraphThreshold: Long = 100000L): DataFrame = {
    // Fast path: LSH candidate graphs are tiny relative to the corpus —
    // when the pair set fits comfortably on the driver, exact union-find
    // beats paying per-iteration distributed job overhead. The distributed
    // propagation below remains the path for genuinely large pair sets.
    val spark = pairs.sparkSession
    val pairRows = pairs.select(col("a").cast("long"), col("b").cast("long"))
    if (pairRows.limit((smallGraphThreshold + 1).toInt).count() <= smallGraphThreshold) {
      val es = pairRows.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra)
          parent(hi) = lo }
      }
      import spark.implicits._
      return parent.keys.toSeq.sorted.map(d => (d, find(d)))
        .toDF("doc_id", "canonical")
    }
    // the edge set is consulted every iteration — materialize it once
    // rather than re-running the upstream candidate pipeline per step
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist()
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("canonical", col("doc_id"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighbourMin = edges
        .join(labels.withColumnRenamed("doc_id", "b")
          .withColumnRenamed("canonical", "nb_canonical"), Seq("b"))
        .groupBy(col("a").as("doc_id"))
        .agg(min("nb_canonical").as("nb_min"))
      // localCheckpoint (eager) BREAKS LINEAGE: with persist() alone the
      // logical plan still nests per iteration and planning cost grows
      // without bound (observed: seconds per iteration, then stack
      // overflow rendering the plan tree on long chains)
      val stepped = labels.join(neighbourMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("canonical"), coalesce(col("nb_min"), col("canonical")))
            .as("canonical"))
      // pointer jumping: additionally adopt the canonical's canonical, so
      // label distance doubles per iteration — maxIter=10 covers chains of
      // diameter 2^10, not 10
      val updated = stepped.as("x")
        .join(stepped.select(col("doc_id").as("canonical"),
          col("canonical").as("cc")), Seq("canonical"), "left")
        .select(col("doc_id"),
          least(col("canonical"), coalesce(col("cc"), col("canonical")))
            .as("canonical"))
        .localCheckpoint(true)
      val changed = updated.join(labels.withColumnRenamed("canonical", "old"),
        Seq("doc_id"))
        .filter(col("canonical") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** End-to-end corpus cleaning — the composed training-data pipeline:
    * 1. near-dup detection (MinHash LSH + exact-Jaccard verify),
    * 2. cluster resolution (label propagation), keep each cluster's
    *    canonical (smallest doc_id) plus all unclustered docs,
    * 3. return the surviving corpus.
    * Every stage is the library operator used standalone elsewhere. */
  def cleanCorpus(docs: DataFrame, dedupThreshold: Double = 0.5): DataFrame = {
    val pairs = minhashNearDups(docs, dedupThreshold).persist()
    val labels = dupClusters(pairs) // (doc_id, canonical), clustered docs only
    pairs.unpersist()
    val losers = labels.filter(col("doc_id") =!= col("canonical"))
      .select("doc_id")
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  // ---- registered queries --------------------------------------------------

  /** Exact dedup by content hash; canonical = lowest doc_id per group. */
  private def ddExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("canonical"), count(lit(1)).as("n_copies"))
      .orderBy("canonical")

  private val ddExactSql =
    """SELECT MD5(text) AS content_hash, MIN(doc_id) AS canonical,
      | COUNT(*) AS n_copies
      |FROM documents GROUP BY MD5(text) ORDER BY canonical""".stripMargin

  /** MinHash+LSH near-dup pairs, verified with exact Jaccard ≥ 0.5. */
  private def ddMinhash(spark: SparkSession, dir: String): DataFrame =
    minhashNearDups(t(spark, dir, "documents"), 0.5).orderBy("a", "b")

  /** SimHash near-dup pairs: 4×16-bit chunk LSH, Hamming ≤ 3 verification.
    * Signatures via explode + 64 codegen'd conditional-sum aggregates
    * (the HOF fold form exists as `simhash(col)` for expression-level use,
    * but interpreted HOF evaluation is ~10× slower in the hot path). */
  private def ddSimhash(spark: SparkSession, dir: String): DataFrame = {
    val hashes = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(transform(tokens(col("text")), w => xxhash64(w))).as("h"))
    val bitAggs = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"c$b"))
    val counts = hashes.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val sigs = counts.select(col("doc_id"),
      (0 until 64).map(b =>
        when(col(s"c$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("sig"))
    val chunks = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("chunk"),
          shiftrightunsigned(col("sig"), j * 16).bitwiseAND(lit(0xFFFFL)).as("cv"))): _*))
        .as("ck"))
      .select(col("doc_id"), col("sig"), col("ck.chunk").as("chunk"), col("ck.cv").as("cv"))
    // the signature travels WITH the pair (collect struct, expand pairs) —
    // one pass over the signature pipeline, no verify rejoin
    val grouped = chunks.groupBy("chunk", "cv")
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ids"))
      .filter(size(col("ids")).between(2, MaxBucket))
      .select(array_sort(array_distinct(col("ids"))).as("ids"))
    grouped
      .select(explode(
        flatten(transform(sequence(lit(0), size(col("ids")) - 2), i =>
          transform(sequence(i + 1, size(col("ids")) - 1), j =>
            struct(element_at(col("ids"), i + 1).as("x"),
              element_at(col("ids"), j + 1).as("y")))))).as("p"))
      .select(col("p.x.doc_id").as("a"), col("p.y.doc_id").as("b"),
        expr("bit_count(p.x.sig ^ p.y.sig)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("a", "b")
  }

  /** Candidate pairs from cheap prefix blocking, verified by exact n-gram
    * Jaccard — the verify stage of a fuzzy-dedup pipeline in isolation. */
  private def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "documents")
    // blocking join carries ids only; shingle arrays are computed once per
    // side of the (small) verify join, never shuffled with the block key
    val blocks = raw.select(col("doc_id"), substring(col("text"), 1, 40).as("blk"))
    val withSh = raw.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shinglesFromToks(col("toks")).as("sh"))
    val l = blocks.select(col("blk"), col("doc_id").as("a"))
    val r = blocks.select(col("blk"), col("doc_id").as("b"))
    l.join(r, Seq("blk")).filter(col("a") < col("b"))
      .select("a", "b")
      .join(withSh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(withSh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"), jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy("a", "b")
  }

  /** Full fuzzy-dedup pipeline: MinHash pairs → cluster resolution → one
    * canonical survivor per cluster. */
  private def ddDupClusters(spark: SparkSession, dir: String): DataFrame = {
    // verified pairs feed dupClusters' edge union twice — materialize once;
    // dupClusters materializes its labels (localCheckpoint) before
    // returning, so the pair cache can be dropped immediately after
    val pairs = minhashNearDups(t(spark, dir, "documents"), 0.5).persist()
    val labels = dupClusters(pairs)
    pairs.unpersist()
    labels
      .groupBy("canonical")
      .agg(count(lit(1)).as("cluster_size"), max("doc_id").as("max_member"))
      .orderBy("canonical")
  }

  /** The composed pipeline through the gate: surviving-corpus summary per
    * (lang, source) after near-dup removal. */
  private def ddCleanCorpus(spark: SparkSession, dir: String): DataFrame =
    cleanCorpus(t(spark, dir, "documents"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("lang", "source")

  val all: Seq[Q] = Seq(
    Q("dd_exact", ddExact, Some(ddExactSql)),
    Q("dd_clean_corpus", ddCleanCorpus, None),
    Q("dd_minhash_lsh", ddMinhash, None),
    Q("dd_simhash", ddSimhash, None),
    Q("dd_ngram_jaccard", ddNgramJaccard, None),
    Q("dd_dup_clusters", ddDupClusters, None))
}
