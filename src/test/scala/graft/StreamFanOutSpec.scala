package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.api.{CdcStreamSink, FanOutSink}
import graft.tables.TableStore

/** Exactly-once multi-table streaming fan-out ([[FanOutSink]]): every
  * micro-batch lands on ALL routes in one transaction, a re-delivered
  * batch (crash between the transaction publish and the checkpoint
  * commit) is skipped on the evidence of any one table, and the derived
  * table can never be observed out of sync with the landing table. */
class StreamFanOutSpec extends SparkSpec {
  import spark.implicits._

  private val inputSchema = StructType(Seq(
    StructField("id", LongType), StructField("kind", StringType),
    StructField("amount", DoubleType)))

  private def stageBatch(in: String, i: Int, rows: Seq[(Long, String, Double)]): Unit = {
    rows.toDF("id", "kind", "amount").coalesce(1).write.parquet(s"$in/f$i")
    val dir = new java.io.File(s"$in/f$i")
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      val tgt = new java.io.File(in, f"part-$i%03d.parquet")
      assert(f.renameTo(tgt)); tgt.setLastModified(1000000000000L + i * 1000L)
      ()
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  private def routes: Seq[(String, DataFrame => DataFrame)] = Seq(
    "raw" -> (b => b),
    "rollup" -> (b => b.groupBy("kind")
      .agg(count(lit(1)).as("cnt"), sum("amount").as("total"))))

  test("each micro-batch lands on every route atomically; replays and restarts skip") {
    val base = tmpDir("fanout-")
    val store = new TableStore(spark, s"$base/store")
    store.create("raw", inputSchema)
    store.create("rollup", StructType(Seq(StructField("kind", StringType),
      StructField("cnt", LongType), StructField("total", DoubleType))))
    val in = s"$base/in"
    stageBatch(in, 0, Seq((1L, "a", 10.0), (2L, "b", 20.0)))
    stageBatch(in, 1, Seq((3L, "a", 30.0)))
    stageBatch(in, 2, Seq((4L, "b", 40.0), (5L, "a", 50.0)))
    val ckpt = s"$base/ckpt"
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(inputSchema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = FanOutSink.attach(stream, store, routes, sinkId = "fo")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    def rawByKind = store.read("raw").groupBy("kind")
      .agg(count(lit(1)).as("n"), sum("amount").as("amt"))
      .orderBy("kind").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    def rollupByKind = store.read("rollup").groupBy("kind")
      .agg(sum("cnt").as("n"), sum("total").as("amt"))
      .orderBy("kind").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rawByKind === Seq(("a", 3L, 90.0), ("b", 2L, 60.0)))
    // the derived table agrees with the landing table exactly
    assert(rollupByKind === rawByKind)
    val tag = CdcStreamSink.batchIdTag("fo")
    assert(store.lastMetaValue("raw", tag) === Some("2"))
    assert(store.lastMetaValue("rollup", tag) === Some("2"))
    val vRaw = store.currentVersion("raw")
    val vRoll = store.currentVersion("rollup")

    // a full re-run over the same checkpoint delivers nothing new
    runOnce()
    assert(store.currentVersion("raw") === vRaw)
    assert(store.currentVersion("rollup") === vRoll)

    // crash window: batch 2 committed to the TABLES but the checkpoint
    // commit marker was lost — restart re-delivers it with the same id
    val marker = new java.io.File(s"$ckpt/commits", "2")
    assert(marker.exists()); assert(marker.delete())
    val crc = new java.io.File(s"$ckpt/commits", ".2.crc")
    if (crc.exists()) { assert(crc.delete()); () }
    runOnce()
    assert(store.currentVersion("raw") === vRaw,
      "a re-delivered batch must not commit a duplicate snapshot")
    assert(store.currentVersion("rollup") === vRoll)
    assert(rollupByKind === rawByKind)

    // a genuinely new batch still applies — to both tables, atomically
    stageBatch(in, 3, Seq((6L, "b", 60.0)))
    runOnce()
    assert(rawByKind === Seq(("a", 3L, 90.0), ("b", 3L, 120.0)))
    assert(rollupByKind === rawByKind)
    assert(store.lastMetaValue("raw", tag) === Some("3"))
  }

  test("a fresh checkpoint against already-attached tables fails loud") {
    val base = tmpDir("fanout-")
    val store = new TableStore(spark, s"$base/store")
    store.create("raw", inputSchema)
    store.create("rollup", StructType(Seq(StructField("kind", StringType),
      StructField("cnt", LongType), StructField("total", DoubleType))))
    val in = s"$base/in"
    stageBatch(in, 0, Seq((1L, "a", 10.0)))
    stageBatch(in, 1, Seq((2L, "b", 20.0)))
    def run(ckpt: String): Unit = {
      val stream = spark.readStream.schema(inputSchema)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = FanOutSink.attach(stream, store, routes, sinkId = "fo")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run(s"$base/ckpt1")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      run(s"$base/ckpt2") // fresh checkpoint, same sinkId: batch ids restart
    }
    assert(e.getMessage.contains("sinkId") ||
      Option(e.getCause).exists(_.getMessage.contains("sinkId")))
  }
}
