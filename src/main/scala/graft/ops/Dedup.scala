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

  /** Same, over a materialized token-array column: inside an HOF lambda
    * every outer subexpression is re-evaluated per element, so callers bind
    * `split()` to an attribute first (two-step select) — otherwise
    * tokenization runs once per shingle instead of once per doc. */
  def shinglesFromToks(toks: Column, n: Int = 3): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))

  /** k min-hash AGGREGATES over a bound base-hash column — universal-hash
    * permutations of ONE md5-derived hash per shingle (see
    * [[PortableHash]]: cross-engine deterministic, and cheaper than k
    * seeded hash calls), codegen'd min with map-side partial aggregation
    * (one row per doc leaves the map stage). */
  def minhashAggs(h: Column, k: Int): Seq[Column] =
    (0 until k).map(i => min(PortableHash.perm(i, h)).as(s"mh$i"))

  /** Exact 3-gram Jaccard between two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** 64 per-bit +1/−1 counters of the token stream, as one pure fold:
    * hash each token ONCE (`transform`), then test each bit of the bound
    * hash value. No explode, no shuffle, no per-bit re-hashing. The
    * portable hash is 60-bit, so bits 60–63 always count negative — a
    * slightly weaker signature, traded for cross-engine verifiability. */
  def simhashCounts(text: Column): Column =
    aggregate(
      transform(tokens(text), w => PortableHash.h60(w)),
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

  private[ops] val MaxBucket = 50 // cap degenerate LSH buckets (skew guard)
  private val ContainmentDfCap = 5 // posting-list blocking cap (see containmentPairs)
  private val NgramBlockCap = 32 // prefix-blocking cap (see ddNgramJaccard)

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
    * 16 bands × 4 rows (k=64) targets ~0.5 similarity. Every hash is
    * md5-derived ([[PortableHash]]), so the WHOLE pipeline — signatures,
    * band buckets, candidate pairs, verified Jaccard — is reproduced by
    * the DuckDB oracle SQL ([[minhashCtes]]).
    *
    * Returns an eagerly materialized frame (localCheckpoint) and releases
    * every internal cache before returning — callers can fan out over the
    * result without re-running the signature pipeline and without owning
    * this operator's cache lifecycle. */
  /** One distinct-shingle array per non-null-text doc — the shared head
    * of every MinHash pipeline (strings: the md5 hash needs the joined
    * text anyway). ensureParallelism: a single-row-group corpus file must
    * not serialize the per-shingle hashing onto one core. Null-text docs
    * are dropped, matching the oracle CTEs' UNNEST semantics. */
  private[ops] def shingleDocs(docs: DataFrame): DataFrame =
    ScaleOps.ensureParallelism(docs)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shinglesFromToks(col("toks")).as("sh"))

  /** Banded LSH bucket keys per doc: signatures via explode + codegen'd
    * min() aggregates over the bound base hash (HOF folds over arrays
    * would be interpreted; map-side partial aggregation collapses to one
    * row per doc before any shuffle), then one LONG key per band —
    * band<<32 | combined minhash values. The ONE Scala implementation the
    * batch and incremental pipelines share, paired with the oracle's
    * `minhashCtes` — change banding/hashing here and there, nowhere else. */
  private[ops] def bandBuckets(shd: DataFrame,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val shRows = shd
      .select(col("doc_id"), explode_outer(col("sh")).as("s"))
      .select(col("doc_id"), PortableHash.h31(col("s")).as("h"))
    val mhAggs = minhashAggs(col("h"), bands * rowsPerBand)
    val sig = shRows.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)
    val bucketCols = (0 until bands).map { b =>
      lit(b.toLong) * lit(4294967296L) + PortableHash.combine(
        (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")))
    }
    sig.select(col("doc_id"), explode_outer(array(bucketCols: _*)).as("bucket"))
  }

  def minhashNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val shDocs = shingleDocs(docs)
    val buckets = bandBuckets(shDocs)
    // Pair generation via bucket-key self-join on ids: cheaper in COLD
    // runtime than collect_list+expansion (less generated code to compile,
    // and the exchange under both sides is reused). Skew guard caps bucket
    // size first. The (tiny) result is materialized once — it feeds the
    // verify stage twice, and without a persist each side would re-run the
    // whole signature pipeline (observed 7× runtime in the bench).
    val sized = buckets.withColumn("bucket_n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("bucket")))
      .filter(col("bucket_n") <= MaxBucket)
    val l = sized.select(col("bucket"), col("doc_id").as("a"))
    val r = sized.select(col("bucket"), col("doc_id").as("b"))
    val pairs = l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      .select("a", "b").distinct().persist()
    pairs.count() // force materialization before the fan-out
    // exact-Jaccard verify on the candidate SUBSET only: semi-join the
    // corpus down to candidate ids before computing shingle sets
    val candIds = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    val candSh = shDocs.join(candIds, Seq("doc_id"), "left_semi")
    val verified = pairs
      .join(candSh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(candSh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"), jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .localCheckpoint(true) // eager + lineage-free: owns its own lifecycle
    pairs.unpersist()
    verified
  }

  /** Incremental ingest dedup: which docs of a NEW batch near-duplicate
    * the EXISTING corpus (the decision an ingest pipeline makes per
    * arriving batch — reject or keep). Same MinHash banding as
    * [[minhashNearDups]], but candidates come from a new-side × corpus-side
    * bucket join instead of a self-join, so cost is proportional to the
    * BATCH, not the corpus: at 100 TB the corpus signatures/buckets are
    * computed once (or read precomputed from a signature table) and only
    * the new batch is shingled per ingest. Oversized corpus buckets are
    * capped (skew guard) exactly like the batch path. Returns verified
    * (new_id, corpus_id, jaccard ≥ threshold) pairs. */
  def incrementalNearDups(newDocs: DataFrame, corpus: DataFrame,
      threshold: Double): DataFrame = {
    val shNew = shingleDocs(newDocs)
    val shCorpus = shingleDocs(corpus)
    // corpus-side skew cap BEFORE the join, as in the batch pipeline
    val cb = bandBuckets(shCorpus).withColumn("bucket_n",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("bucket")))
      .filter(col("bucket_n") <= MaxBucket)
      .select(col("bucket"), col("doc_id").as("corpus_id"))
    val nb = bandBuckets(shNew).select(col("bucket"), col("doc_id").as("new_id"))
    val pairs = nb.join(cb, Seq("bucket"))
      .select("new_id", "corpus_id").distinct().persist()
    pairs.count() // materialize before fanning out to the two semi-joins
    val newSh = shNew.join(
      pairs.select(col("new_id").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
    val corpSh = shCorpus.join(
      pairs.select(col("corpus_id").as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
    val verified = pairs
      .join(newSh.select(col("doc_id").as("new_id"), col("sh").as("sha")), Seq("new_id"))
      .join(corpSh.select(col("doc_id").as("corpus_id"), col("sh").as("shb")), Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .localCheckpoint(true)
    pairs.unpersist()
    verified
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
    // ONE action decides the path AND fetches the small graph: collecting
    // threshold+1 narrow rows is cheap, and avoids evaluating the upstream
    // pair pipeline twice (once for a count probe, again for the collect)
    val probe = pairRows.limit((smallGraphThreshold + 1).toInt).collect()
    if (probe.length <= smallGraphThreshold) {
      val es = probe.map(r => (r.getLong(0), r.getLong(1)))
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
    // minhashNearDups returns a materialized (checkpointed) frame — safe
    // to fan out over without extra caching here
    val pairs = minhashNearDups(docs, dedupThreshold)
    val labels = dupClusters(pairs) // (doc_id, canonical), clustered docs only
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
    // explode tokens THEN hash — the md5 runs codegen'd per row instead of
    // interpreted inside an HOF lambda; repartition first so the per-token
    // hashing parallelizes even from a one-row-group input file. Null-text
    // docs are dropped explicitly: explode_outer would otherwise keep a
    // null-token row whose bit tests all fall to -1, producing sig=0 docs
    // that bucket with legitimate zero chunks (the oracle's UNNEST drops
    // null-text docs, so both engines must drop them identically).
    val hashes = ScaleOps.ensureParallelism(t(spark, dir, "documents"))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("w"))
      .select(col("doc_id"), PortableHash.h60(col("w")).as("h"))
    val bitAggs = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"c$b"))
    val counts = hashes.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
    val sigs = counts.select(col("doc_id"),
      (0 until 64).map(b =>
        when(col(s"c$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_.bitwiseOR(_)).as("sig"))
    hammingPairs(sigs, maxHamming = 3).orderBy("a", "b")
  }

  /** Hamming-LSH candidate pairs over 64-bit signatures `(doc_id, sig)`:
    * one LONG bucket key per 16-bit chunk (a pair within Hamming ≤ 3
    * shares some chunk by pigeonhole; larger thresholds trade recall),
    * capped buckets (skew guard), and the signature travels WITH the
    * pair (collect struct, expand pairs) — one pass over the signature
    * pipeline, no verify rejoin. Shared by SimHash text near-dup and
    * dHash perceptual image near-dup ([[Multimodal.phashDedup]]). */
  def hammingPairs(sigs: DataFrame, maxHamming: Int): DataFrame = {
    val chunks = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(j =>
        lit(j.toLong) * lit(4294967296L) +
          shiftrightunsigned(col("sig"), j * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as("bucket"))
    val grouped = chunks.groupBy("bucket")
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
      .filter(col("hamming") <= maxHamming)
  }

  /** Candidate pairs from cheap prefix blocking, verified by exact n-gram
    * Jaccard — the verify stage of a fuzzy-dedup pipeline in isolation.
    *
    * Blocks are FREQUENCY-CAPPED ([[NgramBlockCap]]): a prefix shared by
    * more than the cap's documents (boilerplate headers, or a dup cluster
    * larger than the cap) generates no candidates — without the cap the
    * within-block pair expansion is quadratic in the hottest block, and a
    * 100× replica corpus turned this gate from 9 s into 14 min (measured;
    * every replica shares its original's 40-char prefix). Same
    * frequency-capped blocking as [[containmentPairs]]; clusters larger
    * than the cap belong to the cluster-reduce ops (dd_dup_clusters),
    * whose label propagation never expands pairs within a bucket. */
  private def ddNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "documents")
    // blocking join carries ids only; shingle arrays are computed once per
    // side of the (small) verify join, never shuffled with the block key
    val blocks = raw
      .select(col("doc_id"), substring(col("text"), 1, 40).as("blk"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("blk")))
      .filter(col("df").between(2, NgramBlockCap))
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

  /** Containment dedup (subset-duplicate detection): Jaccard misses a
    * small doc pasted inside a bigger one (the union dilutes the overlap
    * below any LSH threshold), so curation pipelines also check
    * CONTAINMENT |A∩B| / min(|A|,|B|) — how much of the smaller shingle
    * set the pair shares. MinHash bands would bias candidates toward
    * high-JACCARD pairs (exactly the ones containment is not for);
    * instead candidates come from capped shingle POSTING LISTS: any pair
    * sharing a shingle whose corpus document-frequency is ≤ MaxBucket.
    * A contained doc shares ALL its shingles with its container, so the
    * pair is found unless every one of its shingles is corpus-common —
    * and the df cap is what bounds the self-join (cost ∝ Σ df² over
    * capped shingles, the standard frequency-capped blocking; postings
    * carry (hash, id) only, never shingle strings).
    *
    * The cap is DELIBERATELY tight ([[ContainmentDfCap]] = 5, not
    * MaxBucket): one shared rare shingle suffices to surface a pair, and
    * a contained doc shares its WHOLE shingle set — so recall only needs
    * its single rarest shingle under the cap, while blocking cost falls
    * with the cap's square (measured on the dense synthetic corpus:
    * df ≤ 5 generates 70× fewer raw pairs than df ≤ 50 and finds the
    * identical verified pair set). The right cap is corpus-dependent —
    * it must exceed the expected copy-count of a dup cluster — so it is
    * a parameter; the gate pins the default for its oracle. */
  def containmentPairs(docs: DataFrame, threshold: Double,
      dfCap: Int = ContainmentDfCap): DataFrame = {
    val shDocs = shingleDocs(docs)
    val posts = shDocs
      .select(col("doc_id"), explode_outer(col("sh")).as("s"))
      .select(col("doc_id"), PortableHash.h31(col("s")).as("h"))
    val capped = posts.withColumn("df",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy("h")))
      .filter(col("df").between(2, dfCap))
    val l = capped.select(col("h"), col("doc_id").as("a"))
    val r = capped.select(col("h"), col("doc_id").as("b"))
    // materialize the (small) pair set once: it feeds the verify stage
    // through three branches, and without a persist each branch would
    // re-run the whole posting pipeline (same lesson as minhashNearDups)
    val pairs = l.join(r, Seq("h")).filter(col("a") < col("b"))
      .select("a", "b").distinct().persist()
    pairs.count()
    // verify on the candidate SUBSET only: semi-join the corpus down to
    // candidate ids before shuffling shingle arrays anywhere
    val candIds = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    val candSh = shDocs.join(candIds, Seq("doc_id"), "left_semi")
    val inter = size(array_intersect(col("sha"), col("shb")))
      .cast(DoubleType)
    val verified = pairs
      .join(candSh.select(col("doc_id").as("a"), col("sh").as("sha")), Seq("a"))
      .join(candSh.select(col("doc_id").as("b"), col("sh").as("shb")), Seq("b"))
      .select(col("a"), col("b"),
        (inter / least(size(col("sha")), size(col("shb")))
          .cast(DoubleType)).as("containment"))
      .filter(col("containment") >= threshold)
      .localCheckpoint(true)
    pairs.unpersist()
    verified
  }

  private def ddContainment(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(t(spark, dir, "documents"), 0.8).orderBy("a", "b")

  private def ddContainmentSql: String =
    s"""WITH $shingleCtes,
       |hx AS (SELECT doc_id, ${PortableHash.h31Sql("s")} AS h
       |       FROM (SELECT doc_id, UNNEST(sh) AS s FROM shd)),
       |caps AS (SELECT h FROM hx GROUP BY h
       |         HAVING COUNT(*) BETWEEN 2 AND $ContainmentDfCap),
       |hc AS (SELECT hx.doc_id, hx.h FROM hx JOIN caps USING (h)),
       |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |         FROM hc l JOIN hc r USING (h) WHERE l.doc_id < r.doc_id)
       |SELECT a, b, containment FROM (
       | SELECT cand.a, cand.b,
       |  CAST(LEN(LIST_INTERSECT(x.sh, y.sh)) AS DOUBLE)
       |    / LEAST(LEN(x.sh), LEN(y.sh)) AS containment
       | FROM cand JOIN shd x ON x.doc_id = cand.a
       |           JOIN shd y ON y.doc_id = cand.b)
       |WHERE containment >= 0.8 ORDER BY a, b""".stripMargin

  /** Incremental ingest gate: every 10th doc arrives as the "new batch",
    * the rest are the standing corpus; which arrivals are near-dups. */
  private def ddIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    incrementalNearDups(
      docs.filter(col("doc_id") % 10 === 0),
      docs.filter(col("doc_id") % 10 =!= 0), 0.5)
      .orderBy("new_id", "corpus_id")
  }

  /** Full fuzzy-dedup pipeline: MinHash pairs → cluster resolution → one
    * canonical survivor per cluster. */
  private def ddDupClusters(spark: SparkSession, dir: String): DataFrame = {
    // minhashNearDups returns a materialized frame, so dupClusters' edge
    // union and probe all read cached partitions
    val pairs = minhashNearDups(t(spark, dir, "documents"), 0.5)
    val labels = dupClusters(pairs)
    labels
      .groupBy("canonical")
      .agg(count(lit(1)).as("cluster_size"), max("doc_id").as("max_member"))
      .orderBy("canonical")
  }

  /** Cluster resolution with a QUALITY-aware survivor (the production
    * near-dup policy: keep the best copy, not the arbitrary lowest id):
    * per duplicate cluster, the surviving doc is the longest one
    * (n_chars, ties → lowest doc_id). The cluster labels come from the
    * same label-propagation fixpoint; picking the survivor is a
    * row_number over the (tiny) cluster-member frame, never the corpus. */
  def bestPerCluster(labels: DataFrame, docs: DataFrame): DataFrame = {
    val members = labels.join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("canonical")
      .orderBy(col("n_chars").desc, col("doc_id"))
    members.withColumn("rk", row_number().over(w))
      .groupBy("canonical")
      .agg(count(lit(1)).as("cluster_size"),
        min(when(col("rk") === 1, col("doc_id"))).as("best_doc"),
        min(when(col("rk") === 1, col("n_chars"))).as("best_n_chars"))
  }

  private def ddKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = minhashNearDups(docs, 0.5)
    bestPerCluster(dupClusters(pairs), docs).orderBy("canonical")
  }

  private def ddKeepBestSql: String =
    s"""WITH RECURSIVE $clusterCtes
       |SELECT canonical, COUNT(*) AS cluster_size,
       | MIN(CASE WHEN rk = 1 THEN doc_id END) AS best_doc,
       | MIN(CASE WHEN rk = 1 THEN n_chars END) AS best_n_chars
       |FROM (
       | SELECT l.canonical, l.doc_id, d.n_chars,
       |  ROW_NUMBER() OVER (PARTITION BY canonical
       |    ORDER BY n_chars DESC, doc_id) AS rk
       | FROM labels l JOIN documents d USING (doc_id))
       |GROUP BY canonical ORDER BY canonical""".stripMargin

  /** The composed pipeline through the gate: surviving-corpus summary per
    * (lang, source) after near-dup removal. */
  private def ddCleanCorpus(spark: SparkSession, dir: String): DataFrame =
    cleanCorpus(t(spark, dir, "documents"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("lang", "source")

  // ---- DuckDB oracles for the portable-hash pipelines ----------------------

  /** Trigram-shingle CTEs shared by every dedup oracle (mirrors
    * `shinglesFromToks`: <3 tokens → one joined shingle, else distinct
    * trigram strings). */
  private val shingleCtes =
    """tk AS (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS toks FROM documents),
      |shd AS (SELECT doc_id,
      |         CASE WHEN LEN(toks) < 3 THEN [ARRAY_TO_STRING(toks, ' ')]
      |              ELSE LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 2),
      |                     i -> ARRAY_TO_STRING(toks[i:i+2], ' '))) END AS sh
      |        FROM tk)""".stripMargin

  private def jaccardSql(a: String, b: String): String =
    s"CAST(LEN(LIST_INTERSECT($a, $b)) AS DOUBLE) / LEN(LIST_DISTINCT(LIST_CONCAT($a, $b)))"

  /** The full MinHash+LSH pipeline as CTEs, ending in `jp(a, b, jaccard)`
    * — verified candidate pairs. Reproduces minhashNearDups step by step:
    * 31-bit base hash per shingle, 64 universal-hash min aggregates,
    * 16 band buckets of 4 combined values, bucket cap ≤ MaxBucket,
    * a<b distinct pairs, exact Jaccard over distinct shingle sets. */
  private def minhashCtes: String = {
    val mins = (0 until 64).map(i =>
      s"MIN(${PortableHash.permSql(i, "h")}) AS mh$i").mkString(", ")
    val bucketList = (0 until 16).map { b =>
      val comb = PortableHash.combineSql((0 until 4).map(r => s"mh${b * 4 + r}"))
      s"(${b}::BIGINT * 4294967296 + $comb)"
    }.mkString(", ")
    s"""$shingleCtes,
       |hx AS (SELECT doc_id, ${PortableHash.h31Sql("s")} AS h
       |       FROM (SELECT doc_id, UNNEST(sh) AS s FROM shd)),
       |sig AS (SELECT doc_id, $mins FROM hx GROUP BY doc_id),
       |bk AS (SELECT doc_id, UNNEST([$bucketList]) AS bucket FROM sig),
       |caps AS (SELECT bucket FROM bk GROUP BY bucket HAVING COUNT(*) <= $MaxBucket),
       |bkc AS (SELECT bk.doc_id, bk.bucket FROM bk JOIN caps USING (bucket)),
       |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
       |         FROM bkc l JOIN bkc r USING (bucket) WHERE l.doc_id < r.doc_id),
       |jp AS (SELECT a, b, ${jaccardSql("x.sh", "y.sh")} AS jaccard
       |       FROM cand JOIN shd x ON x.doc_id = cand.a
       |                 JOIN shd y ON y.doc_id = cand.b)""".stripMargin
  }

  private def ddMinhashSql: String =
    s"""WITH $minhashCtes
       |SELECT a, b, jaccard FROM jp WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin

  /** Connected components over verified pairs via recursive CTE (min
    * reachable label = Spark's min-label propagation fixpoint). */
  private[ops] def clusterCtes: String =
    s"""$minhashCtes,
       |vp AS (SELECT a, b FROM jp WHERE jaccard >= 0.5),
       |edges AS (SELECT a, b FROM vp UNION ALL SELECT b AS a, a AS b FROM vp),
       |cc AS (SELECT DISTINCT a AS doc_id, a AS lbl FROM edges
       |       UNION
       |       SELECT e.a AS doc_id, cc.lbl FROM edges e JOIN cc ON e.b = cc.doc_id),
       |labels AS (SELECT doc_id, MIN(lbl) AS canonical FROM cc GROUP BY doc_id)""".stripMargin

  private def ddDupClustersSql: String =
    s"""WITH RECURSIVE $clusterCtes
       |SELECT canonical, COUNT(*) AS cluster_size, MAX(doc_id) AS max_member
       |FROM labels GROUP BY canonical ORDER BY canonical""".stripMargin

  private def ddCleanCorpusSql: String =
    s"""WITH RECURSIVE $clusterCtes
       |SELECT lang, source, COUNT(*) AS n_docs,
       | CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM documents d
       |WHERE NOT EXISTS (SELECT 1 FROM labels l
       |                  WHERE l.doc_id = d.doc_id AND l.doc_id <> l.canonical)
       |GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** SimHash oracle: 64 per-bit counters, sig assembled from signed bit
    * constants (1<<63 spelled as its negative literal — DuckDB's << errors
    * at 63), chunk buckets, cap, pairs, Hamming via bit_count(xor). */
  private def ddSimhashSql: String = {
    val counters = (0 until 64).map(b =>
      s"SUM(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS c$b").mkString(", ")
    val sigBits = (0 until 64).map(b =>
      s"(CASE WHEN c$b > 0 THEN ${1L << b} ELSE 0 END)::BIGINT").mkString(" | ")
    val chunkList = (0 until 4).map(j =>
      s"($j::BIGINT * 4294967296 + ((sig >> ${j * 16}) & 65535))").mkString(", ")
    s"""WITH hx AS (SELECT doc_id, ${PortableHash.h60Sql("w")} AS h
       |            FROM (SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS w
       |                  FROM documents)),
       |cnt AS (SELECT doc_id, $counters FROM hx GROUP BY doc_id),
       |sg AS (SELECT doc_id, ($sigBits) AS sig FROM cnt),
       |ck AS (SELECT doc_id, sig, UNNEST([$chunkList]) AS bucket FROM sg),
       |caps AS (SELECT bucket FROM ck GROUP BY bucket
       |         HAVING COUNT(*) BETWEEN 2 AND $MaxBucket),
       |ckc AS (SELECT ck.doc_id, ck.sig, ck.bucket FROM ck JOIN caps USING (bucket))
       |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       | CAST(bit_count(xor(l.sig, r.sig)) AS INT) AS hamming
       |FROM ckc l JOIN ckc r USING (bucket)
       |WHERE l.doc_id < r.doc_id AND bit_count(xor(l.sig, r.sig)) <= 3
       |ORDER BY a, b""".stripMargin
  }

  /** Same signature/bucket CTEs, but candidates come from a new-side ×
    * corpus-side bucket join with the cap applied to the CORPUS side. */
  private def ddIncrementalSql: String =
    s"""WITH $minhashCtes,
       |cb AS (SELECT doc_id AS corpus_id, bucket FROM bk WHERE doc_id % 10 <> 0),
       |ccaps AS (SELECT bucket FROM cb GROUP BY bucket HAVING COUNT(*) <= $MaxBucket),
       |cbc AS (SELECT cb.corpus_id, cb.bucket FROM cb JOIN ccaps USING (bucket)),
       |nb AS (SELECT doc_id AS new_id, bucket FROM bk WHERE doc_id % 10 = 0),
       |icand AS (SELECT DISTINCT n.new_id, c.corpus_id
       |          FROM nb n JOIN cbc c USING (bucket))
       |SELECT new_id, corpus_id, jaccard FROM (
       | SELECT new_id, corpus_id, ${jaccardSql("x.sh", "y.sh")} AS jaccard
       | FROM icand JOIN shd x ON x.doc_id = icand.new_id
       |            JOIN shd y ON y.doc_id = icand.corpus_id)
       |WHERE jaccard >= 0.5 ORDER BY new_id, corpus_id""".stripMargin

  private def ddNgramJaccardSql: String =
    s"""WITH $shingleCtes,
       |blocks0 AS (SELECT doc_id, SUBSTR(text, 1, 40) AS blk FROM documents),
       |blocks AS (SELECT doc_id, blk FROM (
       |  SELECT doc_id, blk, COUNT(*) OVER (PARTITION BY blk) AS df
       |  FROM blocks0) WHERE df BETWEEN 2 AND $NgramBlockCap),
       |cand AS (SELECT l.doc_id AS a, r.doc_id AS b
       |         FROM blocks l JOIN blocks r USING (blk) WHERE l.doc_id < r.doc_id)
       |SELECT a, b, jaccard FROM (
       | SELECT a, b, ${jaccardSql("x.sh", "y.sh")} AS jaccard
       | FROM cand JOIN shd x ON x.doc_id = cand.a
       |           JOIN shd y ON y.doc_id = cand.b)
       |WHERE jaccard >= 0.2 ORDER BY a, b""".stripMargin

  // ---- exact substring dedup -------------------------------------------------

  /** EXACT SUBSTRING (span-level) DEDUP — the standard suffix-array dedup
    * of LLM corpus prep (Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better"), re-expressed as distributed
    * window-hash matching: hash every k-token window; a window seen in
    * MORE THAN ONE document is a duplicated-span seed whose canonical
    * occurrence is the LOWEST doc_id containing it, and every token
    * covered by a duplicated window in any OTHER document is excised. A
    * shared span of length L ≥ k yields L−k+1 colliding windows whose
    * union covers the whole span, so the excision is exactly the maximal
    * cross-document duplicated region at window resolution — unlike the
    * doc-level near-dup family, this removes a 200-token boilerplate
    * shared by millions of otherwise-distinct documents while keeping
    * one canonical copy. (Within-document repetition is deliberately out
    * of scope — that is txt_repetition's signal, not corpus duplication.)
    *
    * Scale: tokens explode once to (doc, pos) — linear in corpus tokens;
    * windows shuffle as FIXED-WIDTH md5 keys (the gram text never leaves
    * the map side); duplicated-window detection is a groupBy with
    * map-side combine; the covered-position set is proportional to the
    * duplicated volume, not the corpus. A mega-duplicated boilerplate
    * gram is a single hot join key — exactly the AQE skew-join case; no
    * silent frequency cap here because excision must stay exact.
    *
    * Returns one row per input document: `doc_id`, `n_tokens`,
    * `n_removed`, and `clean_md5` (md5 of the space-joined surviving
    * tokens; md5("") when everything was excised). */
  def substringDedup(docs: DataFrame, k: Int = 8): DataFrame = {
    val toks = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val tokPos = toks.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val grams = toks.filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("toks")) - k),
          i => md5(concat_ws(" ", slice(col("toks"), i + 1, lit(k))))))
        .as(Seq("pos", "g")))
    // "seen in MORE THAN ONE document" ⟺ min(doc_id) ≠ max(doc_id):
    // min/max are plain partial-aggregable state, where count_distinct
    // plans an Expand + two-phase distinct aggregate over every
    // (g, doc_id) pair — same answer, one less pass over the windows
    val dup = grams.groupBy("g")
      .agg(min("doc_id").as("keeper"), max("doc_id").as("mx"))
      .filter(col("mx") > col("keeper"))
      .select("g", "keeper")
    val covered = grams.join(dup, "g")
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("pos"))
      .distinct()
    val kept = tokPos.join(covered, Seq("doc_id", "pos"), "left_anti")
    val cleaned = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      md5(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        s => s.getField("tok")), " ")).as("clean_md5"))
    // a fully-excised doc (an exact whole-doc duplicate) must still be
    // reported — with zero kept tokens and the empty-string hash
    tokPos.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
  }

  /** Shared 11-token boilerplate the gate plants (11 ≥ k=8 so it seeds
    * pure-boilerplate windows of its own). Interpolated into BOTH
    * engines' inputs — change it here and nowhere else. */
  private val Boiler =
    "the quick brown fox jumps over the lazy dog again and again"

  /** Gate: the corpus plus a planted prefix-augmented copy of every 7th
    * doc (doc_id + 1,000,000). Each augmented doc shares (a) its whole
    * original text with the lower-id original — every window duplicated,
    * keeper = the original, so the copy is excised down to its unique
    * boundary windows — and (b) the pure-boilerplate windows with every
    * OTHER augmented doc, keeper = the lowest augmented id. Originals
    * come through untouched unless they naturally share 8-token spans. */
  private def ddSubstring(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "documents")
      .filter(col("text").isNotNull).select("doc_id", "text")
    val planted = base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit(Boiler + " "), col("text")).as("text"))
    substringDedup(base.unionByName(planted), k = 8).orderBy("doc_id")
  }

  private def ddSubstringSql: String =
    s"""WITH src AS (
       | SELECT doc_id, text FROM documents WHERE text IS NOT NULL
       | UNION ALL
       | SELECT doc_id + 1000000, '$Boiler ' || text
       | FROM documents WHERE text IS NOT NULL AND doc_id % 7 = 0),
       |toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l
       |         FROM src),
       |tp AS (SELECT doc_id, unnest(l) AS tok, unnest(range(0, len(l))) AS pos
       |       FROM toks),
       |gr AS (SELECT doc_id, i AS pos,
       |        md5(array_to_string(l[i+1:i+8], ' ')) AS g
       |       FROM toks, UNNEST(range(0, len(l) - 7)) AS u(i)
       |       WHERE len(l) >= 8),
       |dup AS (SELECT g, MIN(doc_id) AS keeper FROM gr GROUP BY g
       |        HAVING COUNT(DISTINCT doc_id) > 1),
       |cov AS (SELECT DISTINCT gr.doc_id, gr.pos + o AS pos
       |        FROM gr JOIN dup USING (g), UNNEST(range(0, 8)) AS t(o)
       |        WHERE gr.doc_id <> dup.keeper),
       |kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tp
       |         LEFT JOIN cov USING (doc_id, pos) WHERE cov.pos IS NULL),
       |tot AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tp GROUP BY doc_id),
       |cln AS (SELECT doc_id, COUNT(*) AS n_kept,
       |         md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_md5
       |        FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, t.n_tokens,
       | t.n_tokens - COALESCE(c.n_kept, 0) AS n_removed,
       | COALESCE(c.clean_md5, md5('')) AS clean_md5
       |FROM tot t LEFT JOIN cln c USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // dd_minhash_lsh runs BEFORE the composed pipelines that reuse its
  // signature stage, so the (identical) generated code is jit/codegen-warm
  // when dd_dup_clusters / dd_clean_corpus pay for their full chains
  val all: Seq[Q] = Seq(
    Q("dd_exact", ddExact, Some(ddExactSql)),
    Q("dd_minhash_lsh", ddMinhash, Some(ddMinhashSql)),
    Q("dd_simhash", ddSimhash, Some(ddSimhashSql)),
    Q("dd_ngram_jaccard", ddNgramJaccard, Some(ddNgramJaccardSql)),
    Q("dd_containment", ddContainment, Some(ddContainmentSql)),
    Q("dd_incremental", ddIncremental, Some(ddIncrementalSql)),
    Q("dd_dup_clusters", ddDupClusters, Some(ddDupClustersSql)),
    Q("dd_keep_best", ddKeepBest, Some(ddKeepBestSql)),
    Q("dd_clean_corpus", ddCleanCorpus, Some(ddCleanCorpusSql)),
    Q("dd_substring", ddSubstring, Some(ddSubstringSql)))
}
