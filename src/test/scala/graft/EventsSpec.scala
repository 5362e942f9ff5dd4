package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dets, Events}

/** Planted-fixture semantics for the event-analytics operators whose gate
  * queries run on synthetic data (funnel ordering/windowing edge cases,
  * retention cohort arithmetic, MAD outlier robustness).
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def evts(rows: (Long, String, String)*) =
    rows.toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("s")).as("tss"))

  test("funnel: ordering and the per-step time window are enforced") {
    val e = evts(
      // completes all three steps inside the windows
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),
      // click BEFORE the first view — step 2 must not count
      (2L, "click", "2024-01-01 00:00:00"),
      (2L, "view", "2024-01-01 01:00:00"),
      // click outside the 24 h window after the view
      (3L, "view", "2024-01-01 00:00:00"),
      (3L, "click", "2024-01-02 01:00:00"),
      // purchase too late after the click
      (4L, "view", "2024-01-01 00:00:00"),
      (4L, "click", "2024-01-01 01:00:00"),
      (4L, "purchase", "2024-01-02 03:00:00"),
      // never enters the funnel
      (5L, "purchase", "2024-01-01 00:00:00"))
    val out = Events.funnel(e, Seq("view", "click", "purchase"), "24 HOURS")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1, "view", 4L, 1.0), (2, "click", 2L, 0.5), (3, "purchase", 1L, 0.25)))
  }

  test("funnel: a repeated earlier step never resets the clock") {
    // second view at +23h must NOT extend the click window: the funnel
    // anchors on the FIRST view
    val e = evts(
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 23:00:00"),
      (1L, "click", "2024-01-02 10:00:00"))
    val out = Events.funnel(e, Seq("view", "click"), "24 HOURS")
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq === Seq((1, 1L), (2, 0L)))
  }

  test("retention: cohorts anchor on first activity day") {
    val e = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-04"),
      (2L, "2024-01-01"), (2L, "2024-01-02"),
      (3L, "2024-01-03"))
      .toDF("user_id", "s")
      .select(col("user_id"), to_date(col("s")).as("day"))
    val out = Events.retention(e, 7)
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 2L, 1.0),
      ("2024-01-01", 1, 2L, 1.0),
      ("2024-01-01", 3, 1L, 0.5),
      ("2024-01-03", 0, 1L, 1.0)))
  }

  test("madOutliers: median/MAD are exact positional elements; only far points flag") {
    val e = ((1L to 9L).map(i => ("a", i, i.toDouble)) :+ (("a", 10L, 100.0)))
      .toDF("event_type", "event_id", "raw")
      .select(col("event_type"), col("event_id"), Dets.dec(col("raw")).as("v"))
    val out = Events.madOutliers(e).collect().head
    assert(out.getString(0) === "a")
    assert(out.getLong(1) === 10L) // n_events
    assert(out.getDouble(2) === 5.0) // median: rank (10+1) div 2 = 5 → value 5
    assert(out.getDouble(3) === 2.0) // MAD: deviations 0,1,1,2,2,3,3,4,4,95 → rank 5 → 2
    assert(out.getLong(4) === 1L) // only the 100.0 exceeds 3·MAD
    assert(out.getDouble(5) === 0.1)
  }

  test("gapFillDaily zero-fills silent days inside each user's span only") {
    val daily = Seq(
      (1L, "2024-01-01", 2L, 5.0),
      (1L, "2024-01-04", 1L, 2.5), // days 2,3 silent → zero-filled
      (2L, "2024-02-10", 3L, 1.0)) // single-day span → one row, no fill
      .toDF("user_id", "d", "n_events", "sum_value")
      .select(col("user_id"), to_date(col("d")).as("day"),
        col("n_events"), col("sum_value"))
    val out = Events.gapFillDaily(daily).orderBy("user_id", "day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01", 2L, 5.0),
      (1L, "2024-01-02", 0L, 0.0),
      (1L, "2024-01-03", 0L, 0.0),
      (1L, "2024-01-04", 1L, 2.5),
      (2L, "2024-02-10", 3L, 1.0)))
  }

  test("transition matrix: per-user successors, ties by event_id, " +
    "probabilities sum to one per source state") {
    import spark.implicits._
    import graft.ops.Events
    // user 1: a->b->a ; user 2: a->b (same ts ties broken by event_id)
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 10L, "a"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 10L, "b"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 10L, "a"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 20L, "a"),
      (5L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 20L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.transitionMatrix(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("a", "b")) === ((2L, 1.0)))   // a always transitions to b
    assert(out(("b", "a")) === ((1L, 1.0)))   // user 1 only
    assert(out.size === 2)                     // no cross-user pair (3->4)
    // per-from probabilities sum to 1
    out.groupBy(_._1._1).foreach { case (_, m) =>
      assert(math.abs(m.values.map(_._2).sum - 1.0) < 1e-12)
    }
  }
}
