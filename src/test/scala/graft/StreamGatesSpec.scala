package graft

import org.apache.spark.sql.functions._
import graft.ops.StreamGates

/** Pins the CLAIMS the streaming gates make about their own execution:
  * genuinely micro-batched (one batch per staged file, recorded in the
  * checkpoint offsets), and a staging cache that invalidates when the
  * source changes. Result CORRECTNESS is the driver's oracle's job
  * (st_* rows in CORRECTNESS); these tests keep the harness honest. */
class StreamGatesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def gate(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("st_tumbling executes as one micro-batch per staged file") {
    val out = gate("st_tumbling").collect()
    assert(out.nonEmpty)
    val offsets = new java.io.File(
      graft.ops.Scratch.dir("stream-gates", graft.ops.Scratch.tag(dir), "tumbling", "ckpt", "offsets"))
    val batches = offsets.listFiles().map(_.getName).filterNot(_.startsWith("."))
    assert(batches.length === 4) // 4 staged files -> 4 micro-batches
    val staged = new java.io.File(
      graft.ops.Scratch.dir("stream-gates", graft.ops.Scratch.tag(dir), "tumbling", "in"))
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(staged === 4)
  }

  test("staged micro-batch files carry strictly ascending mtimes (delivery order)") {
    gate("st_session").collect()
    val parts = new java.io.File(
      graft.ops.Scratch.dir("stream-gates", graft.ops.Scratch.tag(dir), "session", "in"))
      .listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val times = parts.map(_.lastModified())
    assert(times.sorted.toSeq === times.toSeq)
    assert(times.distinct.length === times.length)
  }

  test("staging cache: reused while source unchanged, restaged when fingerprint moves") {
    gate("st_tumbling").collect()
    val marker = new java.io.File(
      graft.ops.Scratch.dir("stream-gates", graft.ops.Scratch.tag(dir), "tumbling", "in", "_STAGED_OK"))
    assert(marker.exists())
    val stampBefore = marker.lastModified()
    Thread.sleep(1100)
    gate("st_tumbling").collect() // unchanged source -> no restage
    assert(marker.lastModified() === stampBefore)
    // a moved fingerprint forces a restage (marker rewritten); writing
    // around Hadoop leaves a stale .crc sidecar — ALSO the crash shape a
    // corrupt marker takes, which must restage rather than throw
    val w = new java.io.FileWriter(marker); w.write("stale:0"); w.close()
    gate("st_tumbling").collect()
    val content = scala.io.Source.fromFile(marker).mkString
    assert(content !== "stale:0")
  }

  test("st_dedup drops planted replays: survivor count equals the distinct input") {
    // the staged input contains the %37 replays; the materialized survivor
    // set must equal the original event count exactly
    gate("st_dedup").collect()
    val survivors = spark.read.parquet(
      graft.ops.Scratch.dir("stream-gates", graft.ops.Scratch.tag(dir), "dedup", "out"))
    val staged = spark.read.parquet(
      graft.ops.Scratch.dir("stream-gates", graft.ops.Scratch.tag(dir), "dedup", "in"))
    val originals = staged.select("event_id").distinct().count()
    assert(staged.count() > originals) // replays really were staged
    assert(survivors.count() === originals) // and really were dropped
  }

  test("st_stateful crossings depend on GroupState carried across micro-batches") {
    val out = gate("st_stateful").collect()
    assert(out.nonEmpty)
    // at most one crossing per user — the done flag really latches
    val users = out.map(_.getLong(0))
    assert(users.distinct.length === users.length)
    val staged = spark.read.parquet(
      graft.ops.Scratch.dir("stream-gates", graft.ops.Scratch.tag(dir), "stateful", "in"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        input_file_name().as("f"))
      .collect()
      .groupBy(_.getLong(0))
    // some user's crossing event must sit in a LATER staged file than
    // their first click — that crossing only happens if the spend
    // accumulated in earlier micro-batches survived in state
    val spans = out.exists { r =>
      val evs = staged(r.getLong(0)).sortBy(x => (x.getLong(2), x.getLong(1)))
      val cross = evs.find(_.getLong(2) == r.getLong(3)).get
      evs.head.getString(3) != cross.getString(3)
    }
    assert(spans, "every crossing fell in the user's first batch; state carry unexercised")
  }

  test("st_enrich runs micro-batched and emits each enriched view exactly once") {
    val out = gate("st_enrich").collect()
    assert(out.nonEmpty)
    val offsets = new java.io.File(
      graft.ops.Scratch.dir("stream-gates", graft.ops.Scratch.tag(dir), "enrich", "ckpt", "offsets"))
    assert(offsets.listFiles().map(_.getName).count(!_.startsWith(".")) === 4)
    // batch-join equivalence: same rows, nothing re-emitted across batches
    val events = graft.ops.Events.ev(spark, dir)
    val want = events.filter(col("event_type") === "view")
      .join(spark.read.parquet(s"$dir/customer.parquet"),
        col("user_id") === col("c_custkey"))
      .count()
    assert(out.length.toLong === want)
    assert(out.map(_.getLong(0)).distinct.length === out.length)
  }

  test("st_outer emits unmatched views with null clicks on watermark expiry") {
    val got = gate("st_outer").collect()
    val events = graft.ops.Events.ev(spark, dir)
    val v = events.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id"), col("ts").as("v_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val want = v.join(c, col("user_id") === col("c_user") &&
        col("v_ts") >= col("c_ts") &&
        col("v_ts") <= col("c_ts") + expr("interval 12 hours"), "left_outer")
      .select(col("v_id"), col("c_id"), col("user_id"),
        (unix_micros(col("v_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
      .orderBy("v_id", "c_id").collect()
    def fmt(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.get(1)), r.getLong(2), Option(r.get(3)))
    assert(got.map(fmt).toSeq === want.map(fmt).toSeq)
    // the expiry path must actually run: some view has no click in-window
    assert(got.exists(_.isNullAt(1)),
      "no unmatched view emitted — watermark-expiry emission never ran")
    // every inner-join pair is also present (outer ⊇ inner)
    assert(got.count(!_.isNullAt(1)) ===
      want.count(!_.isNullAt(1)))
  }

  test("st_join equals the batch join and carries state across micro-batches") {
    val got = gate("st_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent batch reference over the same prepared events
    val events = graft.ops.Events.ev(spark, dir)
    val v = events.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id"), col("ts").as("v_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val want = v.join(c, col("user_id") === col("c_user") &&
        col("v_ts") >= col("c_ts") &&
        col("v_ts") <= col("c_ts") + expr("interval 12 hours"))
      .select(col("v_id"), col("c_id"), col("user_id"),
        (unix_micros(col("v_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
      .orderBy("v_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq)
    // at least one pair must span two different staged files — otherwise
    // the run never exercised cross-batch join state
    def fileOf(sub: String, idCol: String) = spark.read.parquet(
      graft.ops.Scratch.dir("stream-gates", graft.ops.Scratch.tag(dir), "join", sub))
      .select(col(idCol), input_file_name().as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val vFile = fileOf("in_v", "event_id")
    val cFile = fileOf("in_c", "event_id")
    assert(got.exists { case (vid, cid, _, _) => vFile(vid) != cFile(cid) },
      "no joined pair spanned two staged files; batches degenerate")
  }
}
