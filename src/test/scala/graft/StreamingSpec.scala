package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.streaming.StreamOps
import graft.cdc._
import graft.tables.TableStore

/** Structured Streaming semantics: the same StreamOps plans that the batch
  * gate checks, executed as real streaming queries over MemoryStream —
  * watermark + windowed aggs, dedup-within-watermark, custom state
  * (mapGroupsWithState), and foreachBatch CDC-apply into TableStore (the
  * streaming analogue of the reference's record stream, SURVEY.md S1).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def mkEvents(rows: Ev*): MemoryStream[Ev] = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(rows: _*)
    ms
  }

  test("tumbling window agg with watermark emits per-hour totals") {
    val ms = mkEvents(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0, "{}"),
      Ev(2, ts("2024-01-01 10:55:00"), 1, "click", 2.0, "{}"),
      Ev(3, ts("2024-01-01 11:05:00"), 2, "view", 5.0, "{}"),
      // late-but-within-watermark event
      Ev(4, ts("2024-01-01 10:59:00"), 2, "click", 4.0, "{}"))
    val q = StreamOps.tumblingStats(ms.toDF(), "1 hour")
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("tumbling").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val h10 = ts("2024-01-01 10:00:00").getTime / 1000
      val h11 = ts("2024-01-01 11:00:00").getTime / 1000
      assert(got.toSeq === Seq(
        (h10, "click", 3L, 7.0), (h11, "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("session windows merge events within the gap across batches") {
    val ms = mkEvents(
      Ev(1, ts("2024-01-01 09:00:00"), 7, "click", 1.0, "{}"),
      Ev(2, ts("2024-01-01 09:10:00"), 7, "click", 1.0, "{}"))
    val q = StreamOps.sessionStats(ms.toDF(), "30 minutes")
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      // second batch: one event continuing the session, one starting a new one
      ms.addData(
        Ev(3, ts("2024-01-01 09:30:00"), 7, "click", 1.0, "{}"),
        Ev(4, ts("2024-01-01 12:00:00"), 7, "click", 9.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("sessions").orderBy("session_start")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq === Seq((7L, 3L, 3.0), (7L, 1L, 9.0)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes replayed event_ids") {
    val ms = mkEvents(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"),
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"), // replay
      Ev(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0, "{}"))
    val q = StreamOps.dedupEvents(ms.toDF(), streaming = true)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup").count() === 2)
    } finally q.stop()
  }

  test("dedupDocsByContent drops replayed and duplicated document text across batches") {
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val ms = MemoryStream[(Long, Timestamp, String)]
    ms.addData(
      (1L, ts("2024-01-01 10:00:00"), "alpha beta gamma"),
      (2L, ts("2024-01-01 10:01:00"), "alpha beta gamma"), // same content, new id
      (3L, ts("2024-01-01 10:02:00"), "delta epsilon"))
    val q = StreamOps.dedupDocsByContent(
      ms.toDF().toDF("doc_id", "ts", "text"), "ts", "10 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("docdedup").start()
    try {
      q.processAllAvailable()
      // next batch replays content seen in the previous batch (state works
      // ACROSS batches) plus one genuinely new doc
      ms.addData(
        (4L, ts("2024-01-01 10:03:00"), "delta epsilon"),
        (5L, ts("2024-01-01 10:04:00"), "zeta eta"))
      q.processAllAvailable()
      val got = spark.table("docdedup").orderBy("doc_id")
        .collect().map(_.getLong(0))
      assert(got.toSeq === Seq(1L, 3L, 5L))
    } finally q.stop()
  }

  test("mapGroupsWithState: running per-user counters survive batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    ms.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0, "{}"))
    val counts = ms.toDS().groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + evs.size
          state.update(n)
          (user, n)
      }
    val q = counts.toDF("user_id", "n")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("counters").start()
    try {
      q.processAllAvailable()
      ms.addData(Ev(2, ts("2024-01-01 10:05:00"), 1, "view", 1.0, "{}"),
        Ev(3, ts("2024-01-01 10:06:00"), 2, "view", 1.0, "{}"))
      q.processAllAvailable()
      val last = spark.table("counters").groupBy("user_id")
        .agg(max("n").as("n")).orderBy("user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(last.toSeq === Seq((1L, 2L), (2L, 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join: views enriched with prior clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    clicks.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0, "{}"))
    views.addData(
      Ev(10, ts("2024-01-01 10:05:00"), 7, "view", 2.0, "{}"),  // within 10 min
      Ev(11, ts("2024-01-01 11:30:00"), 7, "view", 3.0, "{}"))  // too late
    val c = clicks.toDF().select(col("user_id").as("c_user"),
      col("ts").as("c_ts")).withWatermark("c_ts", "1 hour")
    val v = views.toDF().select(col("event_id").as("v_id"),
      col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val joined = v.join(c,
      expr("""v_user = c_user AND v_ts >= c_ts
             | AND v_ts <= c_ts + interval 10 minutes""".stripMargin))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ssjoin").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssjoin").select("v_id").collect().map(_.getLong(0))
      assert(got.toSeq === Seq(10L))
    } finally q.stop()
  }

  test("foreachBatch enriches a stream with the native as-of join") {
    // the operational shape for streaming enrichment against a slowly
    // changing reference table: each micro-batch runs the custom
    // AsOfJoin plan (strategy self-registers on the batch's session)
    val purchases = Seq((7L, 100L, "early"), (7L, 300L, "late"))
      .toDF("user_id", "pt", "tag")
    val clicks = mkEvents(
      Ev(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0, "{}"),
      Ev(2, ts("2024-01-01 11:00:00"), 7, "click", 1.0, "{}"),
      Ev(3, ts("2024-01-01 12:00:00"), 8, "click", 1.0, "{}"))
    val out = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val q = clicks.toDF()
      .select(col("event_id"),
        col("user_id"), (col("event_id") * 100L + 50L).as("ct"))
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val enriched = graft.ops.AsOf
          .asofJoin(batch, purchases, Seq("user_id"), "ct", "pt")
          .select("event_id", "tag").collect()
        out.synchronized {
          out ++= enriched.map(r =>
            (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
        }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(out.sortBy(_._1).toSeq === Seq(
        (1L, "early"), // ct=150: only the 100 purchase is at-or-before
        (2L, "early"), // ct=250: still before the 300 purchase
        (3L, null))) // user 8 has no purchases
    } finally q.stop()
  }

  test("CdcStreamSink applies envelope micro-batches without collecting") {
    val store = new TableStore(spark, tmpDir("sink-cdc-"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    store.create("t", schema)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, String, String)]
    ms.addData(
      ("create", """{"id": 1}""", """{"id": 1, "v": "a"}"""),
      ("create", """{"id": 2}""", """{"id": 2, "v": "b"}"""))
    val q = graft.api.CdcStreamSink.attach(spark,
      ms.toDF().toDF("op", "key", "payload"), store,
      CdcApply.CdcConfig("t", Seq("id"))).start()
    try {
      q.processAllAvailable()
      ms.addData(("delete", """{"id": 1}""", null),
        ("update", """{"id": 2}""", """{"id": 2, "v": "b2"}"""))
      q.processAllAvailable()
      val got = store.read("t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq === Seq((2L, "b2")))
    } finally q.stop()
  }

  test("CdcStreamSink honors an explicit source sequence column for LWW") {
    val store = new TableStore(spark, tmpDir("sink-seq-"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    store.create("t", schema)
    implicit val sqlCtx = spark.sqlContext
    // arrival order says "old" last, but the source offset says "new" wins
    val ms = MemoryStream[(Long, String, String, String)]
    ms.addData(
      (2L, "create", """{"id": 1}""", """{"id": 1, "v": "new"}"""),
      (1L, "create", """{"id": 1}""", """{"id": 1, "v": "old"}"""))
    val q = graft.api.CdcStreamSink.attach(spark,
      ms.toDF().toDF("offset", "op", "key", "payload"), store,
      CdcApply.CdcConfig("t", Seq("id")), seqCol = Some("offset")).start()
    try {
      q.processAllAvailable()
      val got = store.read("t").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq === Seq((1L, "new")))
    } finally q.stop()
  }

  test("CdcStreamSink guardStale: a stale replay in a LATER micro-batch cannot regress state") {
    val store = new TableStore(spark, tmpDir("sink-guard-"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("src_ts", LongType)))
    store.create("t", schema)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String, String, String)]
    val cfg = CdcApply.CdcConfig("t", Seq("id"), orderCol = Some("src_ts"))
    val q = graft.api.CdcStreamSink.attach(spark,
      ms.toDF().toDF("src_ts", "op", "key", "payload"), store,
      cfg, guardStale = true).start()
    try {
      ms.addData((2000L, "create", """{"id": 1}""",
        """{"id": 1, "v": "fresh", "src_ts": 2000}"""))
      q.processAllAvailable()
      // batch 2: a replayed, STALE record for the same key — alone in its
      // batch, so intra-batch ordering can't save it; the stored-order
      // guard must
      ms.addData((1000L, "update", """{"id": 1}""",
        """{"id": 1, "v": "stale", "src_ts": 1000}"""))
      q.processAllAvailable()
      val got = store.read("t").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(got.toSeq === Seq((1L, "fresh", 2000L)))
      // a genuinely newer record still applies
      ms.addData((3000L, "update", """{"id": 1}""",
        """{"id": 1, "v": "newest", "src_ts": 3000}"""))
      q.processAllAvailable()
      assert(store.read("t").collect()(0).getString(1) === "newest")
    } finally q.stop()
  }

  test("foreachBatch applies a CDC stream into TableStore") {
    val store = new TableStore(spark, tmpDir("stream-cdc-"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    store.create("t", schema)
    val cfg = CdcApply.CdcConfig("t", Seq("id"))

    implicit val sqlCtx = spark.sqlContext
    // stream of (op, id, v) triples standing in for decoded CDC envelopes
    val ms = MemoryStream[(String, Long, String)]
    ms.addData(("create", 1L, "a"), ("create", 2L, "b"))
    val q = ms.toDS().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long, String)], _: Long) =>
        val records = batch.collect().toSeq.map { case (op, id, v) =>
          CdcRecord(Array(id.toByte), CdcOp.fromString(op),
            key = Some(RawData(s"""{"id": $id}""")),
            after = if (op == "delete") None
              else Some(RawData(s"""{"id": $id, "v": "$v"}""")))
        }
        if (records.nonEmpty) { CdcApply(spark, store, cfg, records); () }
      }
      .start()
    try {
      q.processAllAvailable()
      ms.addData(("update", 1L, "a2"), ("delete", 2L, ""), ("create", 3L, "c"))
      q.processAllAvailable()
      val got = store.read("t").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.toSeq === Seq((1L, "a2"), (3L, "c")))
    } finally q.stop()
  }

  test("streaming ingest dedups each micro-batch against the standing corpus") {
    // the full ingestion shape: stream of docs -> per-batch incremental
    // near-dup check against the TableStore corpus -> append survivors;
    // later batches then dedup against earlier batches' survivors too
    val store = new TableStore(spark, tmpDir("stream-dedup-"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    store.create("corpus", schema)
    val seed = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val seedDoc = (seed + " ") * 3 + seed
    store.append("corpus", Seq((1L, seedDoc)).toDF("doc_id", "text"))

    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val corpus = store.read("corpus")
        val dupIds = graft.ops.Dedup
          .incrementalNearDups(batch, corpus, 0.5)
          .select(col("new_id").as("doc_id")).distinct()
        val survivors = batch.join(dupIds, Seq("doc_id"), "left_anti")
        store.append("corpus", survivors)
        ()
      }
      .start()
    try {
      // batch 1: a near-dup of the seed (rejected) + a novel doc (kept)
      ms.addData((10L, seedDoc.replace("echo", "zulu")),
        (11L, (0 until 80).map(i => s"n$i").mkString(" ")))
      q.processAllAvailable()
      // batch 2: a near-dup of batch 1's SURVIVOR is rejected too
      ms.addData((20L, (0 until 80).map(i => if (i == 7) "x" else s"n$i").mkString(" ")))
      q.processAllAvailable()
      val ids = store.read("corpus").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 11L))
    } finally q.stop()
  }

  test("hash sampling is a streaming-compatible map-only filter") {
    // the dataset-construction sampler has no RNG state and no shuffle, so
    // the SAME operator runs unchanged on a stream — and picks the same
    // ids a batch run picks (retry/replay stability is the whole point)
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Long]
    ms.addData(0L until 500L: _*)
    val sampled = graft.ops.Sampling.hashSample(
      ms.toDF().withColumnRenamed("value", "doc_id"), "doc_id", 10)
    val q = sampled.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("hash_sample").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hash_sample")
        .collect().map(_.getLong(0)).toSet
      val batch = graft.ops.Sampling.hashSample(
        (0L until 500L).toDF("doc_id"), "doc_id", 10)
        .collect().map(_.getLong(0)).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
