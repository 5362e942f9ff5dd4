package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** Semantics of the native AS-OF join (custom LogicalPlan + Strategy +
  * SparkPlan): planted edge cases, a differential check against an
  * independent crossJoin formulation on multi-partition data, and the
  * physical-plan contract (co-partition + sort injected by
  * EnsureRequirements). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def quotes(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "qt", "quote")

  test("latest at-or-before right row wins; unmatched stays null; ties inclusive") {
    val clicks = Seq((1L, 10L, 100L), (2L, 1L, 5L), (3L, 2L, 20L))
      .toDF("click_id", "user_id", "ct")
    val q = quotes(
      (10L, 90L, "early"), (10L, 100L, "exact"), (10L, 101L, "late"),
      (2L, 30L, "other_user"))
    val out = AsOf.asofJoin(clicks, q, Seq("user_id"), "ct", "qt")
      .select("click_id", "quote").orderBy("click_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq(
      (1L, "exact"), // qt == ct is inclusive, beats "early"
      (2L, null), // user 1 has no quotes
      (3L, null))) // user 2's quote is in the future (30 > 20)
  }

  test("tolerance bounds the lookback") {
    val l = Seq((1L, 1L, 100L)).toDF("id", "user_id", "ct")
    val r = quotes((1L, 40L, "stale"))
    val unbounded = AsOf.asofJoin(l, r, Seq("user_id"), "ct", "qt")
      .select("quote").collect().head.getString(0)
    assert(unbounded === "stale")
    val bounded = AsOf.asofJoin(l, r, Seq("user_id"), "ct", "qt",
      toleranceMicros = 50L).select("quote").collect().head
    assert(bounded.isNullAt(0)) // 100 - 40 = 60 > 50
  }

  test("multi-column keys and null keys/times never match") {
    val l = Seq(
      (1L, "a", 1L, 10L), (2L, "b", 1L, 10L), (3L, null, 1L, 10L))
      .toDF("id", "k1", "k2", "ct")
    val r = Seq(
      ("a", 1L, 5L, "m1"), ("b", 2L, 5L, "wrong_k2"),
      (null.asInstanceOf[String], 1L, 5L, "null_key"))
      .toDF("k1", "k2", "qt", "v")
    val out = AsOf.asofJoin(l, r, Seq("k1", "k2"), "ct", "qt")
      .select("id", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "m1"), (2L, null), (3L, null)))
  }

  test("differential vs independent formulation on multi-partition random data") {
    val rnd = new scala.util.Random(5)
    val left = (1 to 800).map(i =>
      (i.toLong, (rnd.nextInt(40) + 1).toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "k", "t")
    val right = (1 to 600).map(i =>
      ((rnd.nextInt(40) + 1).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "rt", "payload")
    val native = AsOf.asofJoin(left, right, Seq("k"), "t", "rt")
      // several right rows can share (k, max rt): compare the matched
      // TIME, which is unique-deterministic, not the payload
      .select("id", "k", "t", "rt").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
    val reference = left.join(right, Seq("k"), "left")
      .filter(col("rt").isNull || col("rt") <= col("t"))
      .groupBy("id").agg(max(when(col("rt") <= col("t"), col("rt"))).as("rt"))
      .select("id", "rt").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // the join+filter reference drops left ids whose ONLY right rows are
    // future-dated (inner rows all filtered) — restrict to common ids
    val refMap = reference.toMap
    native.foreach { case (id, rt) =>
      refMap.get(id).foreach(expected => assert(rt === expected, s"id $id"))
    }
    assert(native.length === 800) // left outer: every left row present
  }

  test("randomized differential: native matches a driver-side reference across seeds") {
    // duplicate keys, duplicate times, keys on one side only, and (on
    // even seeds) a tolerance bound — compared against an exhaustive
    // per-row reference computed on the driver
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(8)
      val tol = if (seed % 2 == 0) rnd.nextInt(20).toLong else -1L
      val lRows = (1 to 150).map(i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong))
      val rRows = (1 to 120).map(i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(50).toLong, i.toLong))
      val l = lRows.toDF("id", "k", "t")
      val r = rRows.toDF("k", "rt", "p")
      // right times repeat per key: the matched TIME is deterministic,
      // the payload is not — compare times
      val native = AsOf.asofJoin(l, r, Seq("k"), "t", "rt", tol)
        .select("id", "rt").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
      val byKey = rRows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      lRows.foreach { case (id, k, t) =>
        val expect = byKey.get(k)
          .flatMap(_.takeWhile(_ <= t).lastOption)
          .filter(rt => tol < 0 || t - rt <= tol)
          .getOrElse(-1L)
        assert(native(id) === expect, s"seed=$seed id=$id k=$k t=$t tol=$tol")
      }
    }
  }

  test("mixed time-unit families are rejected, same family accepted") {
    // micros (timestamp/long) vs days (int/date): silently comparing them
    // would produce wrong matches, so the entry point must refuse
    val l = Seq((1L, 1L, 86400000000L)).toDF("id", "k", "t") // long = micros
    val rDays = Seq((1L, 1)).toDF("k", "rt") // int = days
    val ex = intercept[IllegalArgumentException] {
      AsOf.asofJoin(l, rDays, Seq("k"), "t", "rt")
    }
    assert(ex.getMessage.contains("unit family"))
    // int vs date both count days — allowed
    val lDays = Seq((1L, 1L, 5)).toDF("id", "k", "t")
    val rDate = Seq((1L, java.sql.Date.valueOf("1970-01-03")))
      .toDF("k", "rt")
    val out = AsOf.asofJoin(lDays, rDate, Seq("k"), "t", "rt").collect()
    assert(out.length === 1 && !out(0).isNullAt(out(0).fieldIndex("rt")))
  }

  test("empty right side and keys with no right rows stay left-outer") {
    val l = (1 to 100).map(i => (i.toLong, (i % 10).toLong, i.toLong))
      .toDF("id", "k", "t")
    val emptyR = Seq.empty[(Long, Long, String)].toDF("k", "rt", "v")
    val out = AsOf.asofJoin(l, emptyR, Seq("k"), "t", "rt")
    assert(out.count() === 100)
    assert(out.filter(col("v").isNotNull).count() === 0)
    // right rows only for ONE key: other keys' partitions see an
    // exhausted right stream mid-merge
    val oneKey = Seq((3L, 1L, "only")).toDF("k", "rt", "v")
    val out2 = AsOf.asofJoin(l, oneKey, Seq("k"), "t", "rt")
      .filter(col("v").isNotNull)
    assert(out2.select("k").distinct().collect().map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("downstream aggregation on the join keys reuses the exchange") {
    val l = Seq((1L, 1L, 2L)).toDF("id", "k", "t")
    val r = Seq((1L, 1L, "x")).toDF("k", "rt", "v")
    val p = AsOf.asofJoin(l, r, Seq("k"), "t", "rt")
      .groupBy("k").agg(count(lit(1)))
      .queryExecution.executedPlan.toString
    // outputPartitioning passthrough: only the join's two child
    // exchanges may appear — a third would mean the groupBy reshuffled
    assert("""Exchange hashpartitioning""".r.findAllIn(p).size === 2,
      s"groupBy on the as-of key must not add an exchange:\n$p")
  }

  test("physical plan: co-partitioned exchanges + sorts around AsOfJoinExec") {
    val l = Seq((1L, 1L, 1L)).toDF("id", "k", "t")
    val r = Seq((1L, 1L, "x")).toDF("k", "rt", "v")
    val p = AsOf.asofJoin(l, r, Seq("k"), "t", "rt")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec missing:\n$p")
    assert("""Exchange hashpartitioning\(k""".r.findAllIn(p).size === 2,
      s"both sides must hash-cluster on the key:\n$p")
    assert("""[:+]- Sort \[""".r.findAllIn(p).size >= 2,
      s"both sides must sort on (key, time):\n$p")
  }
}
