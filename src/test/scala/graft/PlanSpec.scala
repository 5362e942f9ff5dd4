package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression guards: the scale properties the engine is
  * designed around — broadcast joins for small sides, filter/column
  * pushdown into the parquet scan, map-side partial aggregation — pinned
  * as assertions on the optimized plans, so a refactor that silently
  * turns a broadcast into a sort-merge shuffle (or un-pushes a filter)
  * fails CI instead of only showing up as a 100 TB regression.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("broadcast joins stay broadcast") {
    // dimension-side broadcasts, declared explicitly in the plans
    assert(planOf("q04_broadcast_brand").contains("BroadcastHashJoin"))
    // decontamination: the benchmark hash set must build the broadcast side
    assert(planOf("txt_contamination").contains("BroadcastHashJoin"))
    // brute-force ANN: the query set is broadcast, the corpus is not shuffled
    assert(planOf("sim_brute_topk").contains("BroadcastExchange"))
  }

  test("filters and projections reach the parquet scan") {
    val p = planOf("q02_filter_topk")
    assert(p.contains("PushedFilters: ["))
    // at least one real pushed predicate, not an empty list
    assert(!p.contains("PushedFilters: []"))
  }

  test("signature aggregations keep map-side partial aggregation") {
    // explode -> partial HashAggregate -> exchange -> final HashAggregate:
    // one row per doc leaves the map stage; seeing only a single aggregate
    // node would mean the partial phase (and the shuffle reduction) is
    // gone. (dd_minhash_lsh can't be probed this way — it returns an
    // eagerly checkpointed frame whose plan is an ExistingRDD scan.)
    // count TREE nodes only ("+- HashAggregate"): formatted explain prints
    // every node a second time in the details section, so an unanchored
    // substring count would stay >= 2 even with partial aggregation gone
    val p = planOf("txt_token_stats")
    assert("""\+- HashAggregate""".r.findAllIn(p).size >= 2)
  }

  test("saltedJoin shuffles on (key, salt) once the build side outgrows broadcast") {
    // with broadcast disabled (standing in for a build side too big to
    // broadcast), the join must key-partition BOTH sides on (k, __salt) —
    // the property that splits a hot key across reducers. hashpartitioning
    // must mention the salt column, and the join must not be broadcast.
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val fact = (1 to 100).map(i => (i.toLong, i.toLong)).toDF("k", "id")
      val dim = (1 to 100).map(i => (i.toLong, s"d$i")).toDF("k", "name")
      val p = graft.ops.ScaleOps.saltedJoin(fact, dim, "k", col("id"), 8)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("BroadcastHashJoin"))
      assert("""hashpartitioning\(k#\d+L?, __salt""".r.findFirstIn(p).nonEmpty,
        s"expected (k, __salt) hash partitioning in:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("hash sampling is map-only: no exchange between scan and sample filter") {
    // the sampler itself must not shuffle; the only exchanges in the gate
    // plan belong to the downstream groupBy/orderBy summary. Formatted
    // explain prints root-first, so "deeper in the tree" = later in the
    // text: the sample Filter must appear after the LAST Exchange.
    val p = planOf("ds_sample_hash")
    val lastExchange = p.lastIndexOf("+- Exchange")
    val filterIdx = p.lastIndexOf("+- Filter")
    assert(filterIdx >= 0)
    assert(filterIdx > lastExchange)
  }

  test("interval join plans as a hash join on buckets, never a nested loop") {
    // the whole point of bucketing: a bare range predicate would plan as
    // BroadcastNestedLoopJoin (O(points x intervals)); the bucketed form
    // must keep an equi hash join with the range as a residual filter
    val p = planOf("q42_interval_join")
    assert(!p.contains("NestedLoop"), s"interval join degenerated:\n$p")
    assert(p.contains("HashJoin"), s"expected a hash join on __bucket:\n$p")
  }

  test("bloom probe filters the fact side below the join") {
    // the bloom_might_contain Filter must sit on the fact branch UNDER
    // the join (map-side pruning before the shuffle); a rewrite that
    // hoists it above the join would shuffle the unpruned fact table
    val p = planOf("q40_bloom_join")
    assert(p.contains("bloom_might_contain"), s"bloom probe missing:\n$p")
    val joinIdx = p.indexOf("Join")
    val probeIdx = p.indexOf("bloom_might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "probe must appear deeper in the tree (after the join node) in " +
        s"root-first formatted output:\n$p")
  }

  test("train/val/test assignment adds no exchange") {
    // the split label is a pure projection of the id hash; a rewrite that
    // introduces a shuffle (e.g. via a window or join) breaks the map-only
    // contract that makes the split free at 100 TB
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
    val p = graft.ops.Sampling.trainValTestSplit(df, "doc_id", 90, 5)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"split must stay map-only:\n$p")
  }

  test("multiset ops run as count-and-replay, never a join cascade") {
    // intersectAll/exceptAll must plan as Union -> count aggregate ->
    // Generate(ReplicateRows): one shuffle per side on the key. A
    // join-based rewrite would put a Join node (and a per-row probe) in
    // the plan.
    val p = planOf("q37_multiset_ops")
    assert(p.contains("Generate"))
    assert(!p.contains("Join"), s"bag set ops must not plan as joins:\n$p")
  }

  test("unpivot is an Expand over one scan, not a union of rescans") {
    // melt as UNION ALL of per-column selects would scan the fact table
    // once per value column; Dataset.unpivot must keep a single scan with
    // an Expand above the aggregate
    val p = planOf("q38_unpivot")
    assert(p.contains("Expand"))
    // count TREE nodes only ("+- Scan parquet"): the details section
    // repeats every node once more (same trick as the partial-agg guard)
    assert("""\+- Scan parquet""".r.findAllIn(p).size === 1,
      s"unpivot must read the input exactly once:\n$p")
  }

  test("perplexity scoring: LM joins broadcast; the token stream itself " +
    "never shuffles") {
    val p = planOf("txt_perplexity")
    // the capped LM and the 1-row totals are the ONLY join inputs — both
    // broadcast; a SortMergeJoin here would shuffle the exploded stream
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"LM join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the token stream must never sort-merge:\n$p")
  }

  test("gopher rules are map-only up to the per-source aggregate") {
    val p = planOf("txt_gopher")
    // exactly two exchanges, both on the tiny per-source frame: the
    // groupBy(source) and the ORDER BY's range partitioning — nothing
    // document-sized ever shuffles
    assert("""\+- Exchange""".r.findAllIn(p).size === 2,
      s"gopher flags must add no shuffle beyond the final aggregate:\n$p")
  }

  test("leak-free split: cluster labels broadcast onto the corpus") {
    val p = planOf("ds_split_leakfree")
    // the labels frame is collected-size bounded (union-find output);
    // joining it to documents must broadcast, never shuffle the corpus
    assert(p.contains("BroadcastHashJoin"),
      s"labels join must broadcast:\n$p")
  }
}
