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
}
