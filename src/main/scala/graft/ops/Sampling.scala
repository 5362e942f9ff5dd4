package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables.t
import Text.tokens
import Dedup.shinglesFromToks

/** Dataset-construction operators a large-scale training-data pipeline
  * needs around dedup/quality: deterministic sampling, stratified
  * downsampling, and benchmark decontamination.
  *
  * Scale design:
  *   - hash sampling is a MAP-ONLY filter (no RNG state, no shuffle, no
  *     driver coordination; reproducible across retries/stragglers — the
  *     reason production pipelines sample by content/id hash, not rand());
  *   - stratified fixed-k shuffles once on the stratum key; the per-
  *     stratum sort is bounded by stratum size (strata = languages /
  *     sources — few and fat, so a window is the right tool, unlike
  *     per-key top-k over millions of keys where the bounded aggregator
  *     wins);
  *   - decontamination hashes benchmark n-grams once, BROADCASTS the
  *     (small) benchmark hash set, and filters the 100 TB training side
  *     map-side — the join never shuffles the corpus.
  *
  * Everything hashes via [[PortableHash]] (md5-derived), so each gate has
  * a value-exact DuckDB oracle.
  */
object Sampling {

  /** 60-bit portable hash of a row id — the sampling key. */
  private def idHash(id: Column): Column =
    PortableHash.h60(id.cast(StringType))

  /** Deterministic uniform sample: keep rows whose id-hash lands below
    * `pct` of the modulus. Same id → same decision, forever. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(idHash(col(idCol)) % 100 < pct)

  /** Deterministic stratified downsample: at most `k` rows per stratum,
    * chosen by hash order (a reproducible "random" k without RNG state).
    * Ties cannot happen in the hash-order sort (id breaks them). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(idHash(col(idCol)), col(idCol))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= k)
      .drop("__graft_rn")
  }

  /** Benchmark decontamination (the GPT-3/PaLM n-gram overlap check):
    * which training docs share word n-gram shingles with the benchmark
    * set, and how much. Returns (doc_id, n_hits, n_shingles, ratio) for
    * contaminated docs. `bench` needs columns (doc_id, text); shingle
    * hashes are distinct-per-doc trigrams via [[Dedup.shinglesFromToks]]. */
  def contamination(train: DataFrame, bench: DataFrame): DataFrame = {
    def shingleHashes(docs: DataFrame): DataFrame = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode_outer(shinglesFromToks(col("toks"))).as("s"))
      .select(col("doc_id"), PortableHash.h60(col("s")).as("h"))
    // the benchmark hash set is tiny relative to the corpus — broadcast it
    // so the training side is filtered map-side, never shuffled
    val benchH = shingleHashes(bench).select("h").distinct()
      .withColumn("hit", lit(1))
    shingleHashes(train)
      .join(broadcast(benchH), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).cast(LongType).as("n_hits"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("n_hits"), col("n_shingles"),
        (col("n_hits").cast(DoubleType) / col("n_shingles")).as("ratio"))
  }

  /** Sequence packing: assign docs (in deterministic id order) to fixed
    * token-budget training sequences — the standard pre-training step that
    * concatenates documents into model-context-length rows. A doc's
    * sequence is the one its starting token offset falls in (greedy
    * concatenation; long docs spill into following sequences, whose ids
    * later docs then start from — offset arithmetic, not bin capacity, is
    * the ground truth). Runs as ONE window pass partitioned by `groupCol`
    * (shard/source): each stratum packs independently and in parallel,
    * which is also what keeps the sort bounded at 100 TB — never a global
    * single-partition order. Returns the input plus (n_tokens, seq_id). */
  def packSequences(docs: DataFrame, groupCol: String, budget: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("doc_id"))
    docs
      .filter(col("text").isNotNull)
      .withColumn("n_tokens", size(tokens(col("text"))).cast(LongType))
      .withColumn("__start", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // budget ≤ 2^20 and offsets < 2^53: the double division is exact
      // enough that floor() equals integer floor-division here
      .withColumn("seq_id", floor(col("__start") / lit(budget)).cast(LongType))
      .drop("__start")
  }

  /** Data-mixture reweighting: per-stratum sampling weights that would
    * rebalance the corpus toward a UNIFORM token share across strata
    * (weight = total_tokens / (n_strata × stratum_tokens); >1 means
    * upsample, <1 downsample). The input to mixture-aware samplers; one
    * tiny aggregate over token counts, computed in one pass. Token sums
    * are exact integers, so the shares/weights are correctly-rounded
    * double divisions — cross-engine deterministic. */
  def mixtureWeights(docs: DataFrame, stratumCol: String): DataFrame = {
    val perStratum = docs
      .filter(col("text").isNotNull)
      .select(col(stratumCol), size(tokens(col("text"))).cast(LongType).as("nt"))
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_docs"), sum("nt").cast(LongType).as("n_tokens"))
    // totals as a broadcast one-row frame over the (few-row) stratum agg —
    // no second scan of the corpus, no single-partition window
    val totals = perStratum.agg(
      sum("n_tokens").cast(LongType).as("__total"),
      count(lit(1)).as("__k"))
    perStratum.crossJoin(broadcast(totals))
      .select(col(stratumCol), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast(DoubleType) / col("__total")).as("share"),
        (col("__total").cast(DoubleType) / (col("__k") * col("n_tokens")))
          .as("weight"))
  }

  /** Chunking: split each doc into fixed-size token windows with overlap
    * (the RAG/embedding-indexing shape). A pure generate — sequence +
    * explode, no shuffle, no driver loop; chunk boundaries are integer
    * arithmetic on the bound token count. */
  def chunk(docs: DataFrame, size: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < size, "need 0 <= overlap < size")
    val step = size - overlap
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), org.apache.spark.sql.functions.size(tokens(col("text"))).as("nt"))
      .select(col("doc_id"), col("nt"),
        posexplode(sequence(lit(0), greatest(col("nt") - 1, lit(0)), lit(step))))
      .select(col("doc_id"), col("nt"),
        col("pos").cast(LongType).as("chunk_id"),
        col("col").as("start_tok"),
        least(col("col") + size, col("nt")).as("end_tok"))
  }

  /** Percentile-based quality filtering (the relative cousin of the
    * absolute-threshold txt_quality gate): per stratum, keep docs whose
    * quality score is AT OR ABOVE the stratum's p25 positional element
    * (rank max(1, n div 4) under a (score, doc_id) total order) — a
    * per-stratum cutoff rather than one global threshold that over-prunes
    * low-resource strata. The cutoff element itself survives, and score
    * ties with it survive too, so slightly LESS than a quarter is dropped
    * — and for tiny strata (n < 8) the cutoff is at or near the minimum
    * and the filter deliberately degrades toward keeping everything
    * (pruning a 5-doc language by "a quarter" is noise, not curation).
    * The cutoff is an EXACT positional element (integer rank arithmetic
    * — reproducible, unlike interpolating percentiles), found with one
    * window pass per stratum; the few-row cutoff frame broadcasts back
    * onto the scored corpus, so the big side is filtered map-side. */
  def qualityPercentileFilter(scored: DataFrame, stratumCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("quality_score"), col("doc_id"))
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol))
    val cutoffs = scored
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(cw))
      .filter(col("rn") === greatest(lit(1L), expr("n div 4")))
      .select(col(stratumCol), col("quality_score").as("cutoff"))
    scored.join(broadcast(cutoffs), Seq(stratumCol))
      .filter(col("quality_score") >= col("cutoff"))
  }

  /** Deterministic train/val/test assignment by content-id hash — the
    * split every training pipeline needs to be STABLE across reruns and
    * incremental ingests (a doc never migrates between splits when the
    * corpus grows, unlike fraction-based randomSplit). Map-only: the
    * split label is a pure function of the id, so there is no shuffle, no
    * RNG state, and retried tasks make identical decisions. Buckets:
    * hash%100 < trainPct → train, < trainPct+valPct → val, else test. */
  def trainValTestSplit(df: DataFrame, idCol: String,
      trainPct: Int, valPct: Int): DataFrame =
    df.withColumn("split",
      when(idHash(col(idCol)) % 100 < trainPct, "train")
        .when(idHash(col(idCol)) % 100 < trainPct + valPct, "val")
        .otherwise("test"))

  // ---- registered queries --------------------------------------------------

  private def idHashSql(x: String): String =
    PortableHash.h60Sql(s"CAST($x AS VARCHAR)")

  /** 10% uniform hash sample, summarized per lang. */
  private def dsSampleHash(spark: SparkSession, dir: String): DataFrame =
    hashSample(t(spark, dir, "documents"), "doc_id", 10)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        sum("n_chars").cast(LongType).as("total_chars"))
      .orderBy("lang")

  private val dsSampleHashSql =
    s"""SELECT lang, COUNT(*) AS n_sampled,
       | CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM documents
       |WHERE ${idHashSql("doc_id")} % 100 < 10
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Fixed-size per-stratum sample: exact membership is the check. */
  private def dsSampleStratified(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(t(spark, dir, "documents"), "lang", "doc_id", 40)
      .select("lang", "doc_id", "n_chars")
      .orderBy("lang", "doc_id")

  private val dsSampleStratifiedSql =
    s"""SELECT lang, doc_id, n_chars FROM (
       | SELECT lang, doc_id, n_chars,
       |  ROW_NUMBER() OVER (PARTITION BY lang
       |    ORDER BY ${idHashSql("doc_id")}, doc_id) AS rn
       | FROM documents)
       |WHERE rn <= 40 ORDER BY lang, doc_id""".stripMargin

  /** Decontamination gate: benchmark = every 97th doc (a stand-in eval
    * set), training = the rest; contaminated docs with overlap ratios. */
  private def txtContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    contamination(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0))
      .orderBy("doc_id")
  }

  private val txtContaminationSql = {
    val hs = PortableHash.h60Sql("s")
    s"""WITH tk AS (SELECT doc_id,
       |        REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS toks
       |      FROM documents WHERE text IS NOT NULL),
       |sh AS (SELECT doc_id, UNNEST(
       |        CASE WHEN LEN(toks) < 3 THEN [ARRAY_TO_STRING(toks, ' ')]
       |             ELSE LIST_DISTINCT(LIST_TRANSFORM(
       |               GENERATE_SERIES(1, LEN(toks) - 2),
       |               i -> ARRAY_TO_STRING(toks[i:i+2], ' '))) END) AS s
       |      FROM tk),
       |bh AS (SELECT DISTINCT $hs AS h FROM sh WHERE doc_id % 97 = 0),
       |tr AS (SELECT doc_id, $hs AS h FROM sh WHERE doc_id % 97 <> 0),
       |ct AS (SELECT t.doc_id, COUNT(*) AS n_shingles,
       |        CAST(SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       |       FROM tr t LEFT JOIN bh b ON t.h = b.h
       |       GROUP BY t.doc_id)
       |SELECT doc_id, n_hits, n_shingles,
       | CAST(n_hits AS DOUBLE) / n_shingles AS ratio
       |FROM ct WHERE n_hits > 0 ORDER BY doc_id""".stripMargin
  }

  /** Packing summary per (source, seq_id): how full each 256-token
    * sequence is — the packing-efficiency view a pipeline monitors. */
  private def dsPackSequences(spark: SparkSession, dir: String): DataFrame =
    packSequences(t(spark, dir, "documents"), "source", 256)
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").cast(LongType).as("n_tokens"))
      .orderBy("source", "seq_id")

  private val dsPackSequencesSql =
    s"""SELECT source, seq_id, COUNT(*) AS n_docs,
       | CAST(SUM(nt) AS BIGINT) AS n_tokens
       |FROM (
       | SELECT source, doc_id, nt,
       |  CAST((SUM(nt) OVER (PARTITION BY source ORDER BY doc_id) - nt) // 256
       |    AS BIGINT) AS seq_id
       | FROM (SELECT source, doc_id,
       |        LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS nt
       |       FROM documents WHERE text IS NOT NULL))
       |GROUP BY source, seq_id ORDER BY source, seq_id""".stripMargin

  /** Uniform-target mixture weights by language. */
  private def dsMixtureWeights(spark: SparkSession, dir: String): DataFrame =
    mixtureWeights(t(spark, dir, "documents"), "lang").orderBy("lang")

  private val dsMixtureWeightsSql =
    s"""WITH s AS (SELECT lang, COUNT(*) AS n_docs,
       |   CAST(SUM(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'))) AS BIGINT)
       |     AS n_tokens
       | FROM documents WHERE text IS NOT NULL GROUP BY lang),
       |tt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total, COUNT(*) AS k FROM s)
       |SELECT lang, n_docs, n_tokens,
       | CAST(n_tokens AS DOUBLE) / total AS share,
       | CAST(total AS DOUBLE) / (k * n_tokens) AS weight
       |FROM s, tt ORDER BY lang""".stripMargin

  /** Chunking summary per doc: 64-token chunks, 16-token overlap. */
  private def txtChunks(spark: SparkSession, dir: String): DataFrame =
    chunk(t(spark, dir, "documents"), 64, 16)
      .groupBy("doc_id")
      .agg(max(col("nt")).cast(LongType).as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(col("end_tok") - col("start_tok")).cast(LongType).as("sum_chunk_toks"))
      .orderBy("doc_id")

  private val txtChunksSql =
    s"""SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens, COUNT(*) AS n_chunks,
       | CAST(SUM(LEAST(s + 64, nt) - s) AS BIGINT) AS sum_chunk_toks
       |FROM (
       | SELECT doc_id, nt, UNNEST(RANGE(0, GREATEST(nt - 1, 0) + 1, 48)) AS s
       | FROM (SELECT doc_id,
       |        LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS nt
       |       FROM documents WHERE text IS NOT NULL))
       |GROUP BY doc_id, nt ORDER BY doc_id""".stripMargin

  /** Per-lang p25 quality filter, summarized per lang: how many docs and
    * tokens survive, and where the cutoff landed. */
  private def dsFilterQuality(spark: SparkSession, dir: String): DataFrame =
    qualityPercentileFilter(
      Text.qualityScores(t(spark, dir, "documents")), "lang")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
        min("cutoff").as("cutoff"),
        sum(col("n_tokens").cast(LongType)).as("kept_tokens"))
      .orderBy("lang")

  private val dsFilterQualitySql =
    s"""WITH ${Text.qualityCtes},
       |r AS (SELECT *,
       |       ROW_NUMBER() OVER (PARTITION BY lang
       |         ORDER BY quality_score, doc_id) AS rn,
       |       COUNT(*) OVER (PARTITION BY lang) AS n FROM q2),
       |cut AS (SELECT lang, quality_score AS cutoff FROM r
       |        WHERE rn = GREATEST(1, n // 4))
       |SELECT q2.lang, COUNT(*) AS n_kept, MIN(cutoff) AS cutoff,
       | CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens
       |FROM q2 JOIN cut USING (lang)
       |WHERE quality_score >= cutoff
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** 90/5/5 split summarized per (split, lang): stability of the split is
    * what the oracle checks — both engines derive the same label from the
    * same md5 hash. */
  private def dsTrainSplit(spark: SparkSession, dir: String): DataFrame =
    trainValTestSplit(t(spark, dir, "documents"), "doc_id", 90, 5)
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").cast(LongType).as("total_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("split", "lang")

  private val dsTrainSplitSql =
    s"""SELECT CASE WHEN h % 100 < 90 THEN 'train'
       |  WHEN h % 100 < 95 THEN 'val' ELSE 'test' END AS split,
       | lang, COUNT(*) AS n_docs,
       | CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       | MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM (SELECT *, ${idHashSql("doc_id")} AS h FROM documents)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Packed-sequence PAYLOAD construction — the step after seq-id
    * assignment: concatenate each sequence's docs (in doc_id order) into
    * one training row. collect_list order is execution-dependent, so the
    * docs collect as (doc_id, text) structs and sort INSIDE the group
    * before joining — deterministic at any parallelism. The gate outputs
    * the md5 + length of each packed payload, not the text itself (keeps
    * result rows small while still pinning every byte). */
  private def dsPackText(spark: SparkSession, dir: String): DataFrame =
    packSequences(t(spark, dir, "documents"), "source", 256)
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        array_sort(collect_list(struct(col("doc_id"), col("text"))))
          .as("docs"))
      .select(col("source"), col("seq_id"), col("n_docs"),
        md5(array_join(transform(col("docs"), d => d.getField("text")),
          "\n")).as("payload_md5"),
        length(array_join(transform(col("docs"), d => d.getField("text")),
          "\n")).cast(LongType).as("payload_len"))
      .orderBy("source", "seq_id")

  private val dsPackTextSql =
    s"""SELECT source, seq_id, COUNT(*) AS n_docs,
       | MD5(STRING_AGG(text, chr(10) ORDER BY doc_id)) AS payload_md5,
       | CAST(LENGTH(STRING_AGG(text, chr(10) ORDER BY doc_id)) AS BIGINT)
       |   AS payload_len
       |FROM (
       | SELECT source, doc_id, text,
       |  CAST((SUM(nt) OVER (PARTITION BY source ORDER BY doc_id) - nt) // 256
       |    AS BIGINT) AS seq_id
       | FROM (SELECT source, doc_id, text,
       |        LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS nt
       |       FROM documents WHERE text IS NOT NULL))
       |GROUP BY source, seq_id ORDER BY source, seq_id""".stripMargin

  /** LEAKAGE-FREE train/val/test split: the split key is the near-dup
    * CLUSTER, not the document — two near-duplicate documents always land
    * in the same split, so evaluation can't score memorized training
    * text (the train/test contamination failure every serious pipeline
    * guards against). Documents in no cluster split by their own id —
    * identical assignment to a per-doc split for them, so adopting the
    * leak-free split only moves documents that needed moving.
    *
    * 100 TB shape: the cluster labels come from the same bounded
    * LSH-candidate machinery as dd_dup_clusters (collision-proportional,
    * capped buckets); the split itself is a map-only hash on the label
    * after one labels join keyed by doc_id. */
  def leakFreeSplit(docs: DataFrame, pairs: DataFrame,
      trainPct: Int, valPct: Int): DataFrame = {
    val labels = Dedup.dupClusters(pairs)
    val keyed = docs.join(labels, Seq("doc_id"), "left")
      .withColumn("canonical", coalesce(col("canonical"), col("doc_id")))
    trainValTestSplit(keyed, "canonical", trainPct, valPct)
  }

  private def dsSplitLeakfree(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val split = leakFreeSplit(docs, Dedup.minhashNearDups(docs, 0.5), 90, 5)
    // the property the operator exists for, require()d in-gate: no
    // cluster spans two splits (cheap: one agg over the small label set)
    val leaky = split.filter(col("canonical") =!= col("doc_id"))
      .select("canonical", "split").distinct()
      .groupBy("canonical").count().filter(col("count") > 1).count()
    require(leaky == 0L, s"$leaky clusters span multiple splits")
    split.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("canonical").as("n_clusters"),
        sum("n_chars").cast(LongType).as("total_chars"))
      .orderBy("split")
  }

  private val dsSplitLeakfreeSql =
    s"""WITH RECURSIVE ${Dedup.clusterCtes},
       |keyed AS (SELECT d.doc_id, d.n_chars,
       |           COALESCE(l.canonical, d.doc_id) AS canonical
       |          FROM documents d LEFT JOIN labels l USING (doc_id)),
       |sp AS (SELECT *, CASE WHEN h % 100 < 90 THEN 'train'
       |         WHEN h % 100 < 95 THEN 'val' ELSE 'test' END AS split
       |       FROM (SELECT *, ${idHashSql("canonical")} AS h FROM keyed))
       |SELECT split, COUNT(*) AS n_docs,
       | COUNT(DISTINCT canonical) AS n_clusters,
       | CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM sp GROUP BY split ORDER BY split""".stripMargin

  /** TEMPERATURE-BASED mixture sampling to a TOKEN BUDGET — the "data
    * recipe" materialization step: per-source sampling rates are chosen
    * so expected selected tokens hit `budget` split across sources by
    * p_s ∝ sqrt(share_s) (temperature τ=2 — the standard flattening
    * that keeps small sources from vanishing), then document selection
    * is a deterministic hash-threshold test — map-only, RNG-free,
    * retry-stable, and NO per-source sort (an exact cumulative-sum cut
    * would serialize each source through one partition; the rate-based
    * form is what scales, trading exact budgets for expected ones).
    * sqrt (unlike pow) is correctly-rounded IEEE, so both engines
    * compute identical thresholds. The cross-source sqrt-sum is reduced
    * ON THE DRIVER in source order (rows ∝ #sources, a handful): a
    * distributed double sum has nondeterministic addition order, and a
    * one-ulp difference exactly at an integer boundary would flip
    * floor() and change the selected set; the left-to-right fold here
    * matches the ordered aggregate the oracle uses. */
  def temperatureSample(docs: DataFrame, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val d = docs.filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast(LongType).as("tok"))
    val perSource = d.groupBy("source")
      .agg(sum("tok").cast(DoubleType).as("ts"))
      .orderBy("source").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    val sq = perSource.foldLeft(0.0) { case (acc, (_, ts)) =>
      acc + math.sqrt(ts)
    }
    val rates = perSource.toSeq.map { case (s, ts) =>
      val rate = math.min(1.0, (budget.toDouble * math.sqrt(ts) / sq) / ts)
      (s, math.floor(rate * 1000000).toLong)
    }
    d.join(broadcast(rates.toDF("source", "thresh")), Seq("source"))
      .filter(idHash(col("doc_id")) % 1000000 < col("thresh"))
      .select("source", "doc_id", "tok")
  }

  private def dsTokenBudget(spark: SparkSession, dir: String): DataFrame =
    temperatureSample(t(spark, dir, "documents"), budget = 8000L)
      .groupBy("source")
      .agg(count(lit(1)).as("n_selected"),
        sum("tok").cast(LongType).as("sel_tokens"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("source")

  private val dsTokenBudgetSql =
    s"""WITH d AS (
       | SELECT source, doc_id,
       |  CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) AS BIGINT) AS tok
       | FROM documents WHERE text IS NOT NULL),
       |t AS (SELECT source, CAST(SUM(tok) AS DOUBLE) AS ts
       |      FROM d GROUP BY source),
       |g AS (SELECT SUM(SQRT(ts) ORDER BY source) AS sq FROM t),
       |r AS (SELECT source,
       |       CAST(FLOOR(LEAST(1.0,
       |         (8000.0 * SQRT(ts) / g.sq) / ts) * 1000000) AS BIGINT)
       |         AS thresh
       |      FROM t CROSS JOIN g),
       |sel AS (SELECT d.source, d.doc_id, d.tok
       |        FROM d JOIN r USING (source)
       |        WHERE ${idHashSql("doc_id")} % 1000000 < r.thresh)
       |SELECT source, COUNT(*) AS n_selected,
       | CAST(SUM(tok) AS BIGINT) AS sel_tokens,
       | MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM sel GROUP BY source ORDER BY source""".stripMargin

  val all: Seq[Q] = Seq(
    Q("ds_sample_hash", dsSampleHash, Some(dsSampleHashSql)),
    Q("ds_sample_stratified", dsSampleStratified, Some(dsSampleStratifiedSql)),
    Q("ds_pack_sequences", dsPackSequences, Some(dsPackSequencesSql)),
    Q("ds_mixture_weights", dsMixtureWeights, Some(dsMixtureWeightsSql)),
    Q("txt_chunks", txtChunks, Some(txtChunksSql)),
    Q("txt_contamination", txtContamination, Some(txtContaminationSql)),
    Q("ds_filter_quality", dsFilterQuality, Some(dsFilterQualitySql)),
    Q("ds_train_split", dsTrainSplit, Some(dsTrainSplitSql)),
    Q("ds_pack_text", dsPackText, Some(dsPackTextSql)),
    Q("ds_split_leakfree", dsSplitLeakfree, Some(dsSplitLeakfreeSql)),
    Q("ds_token_budget", dsTokenBudget, Some(dsTokenBudgetSql)))
}
