package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.api.CdcStreamSink
import graft.cdc.CdcApply
import graft.tables.TableStore

/** Restart idempotence of the streaming CDC sink: foreachBatch is
  * at-least-once — a crash BETWEEN the sink's table commit and the
  * checkpoint's commit marker re-delivers the batch with the same id on
  * restart. The sink records each applied batch id in the snapshot's
  * commit metadata and must SKIP a re-delivered batch: the table ends
  * bit-identical to the single-run outcome, with no extra snapshot. */
class StreamRestartSpec extends SparkSpec {
  import spark.implicits._

  private def envelopes(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
    ids.map(i => ("create", s"""{"id": $i}""", s"""{"id": $i, "v": "v$i"}"""))
      .toDF("op", "key", "payload")

  test("a re-delivered micro-batch (crash between table and checkpoint commit) is skipped") {
    val base = tmpDir("restart-")
    val store = new TableStore(spark, s"$base/store")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    store.create("t", schema)
    // stage 3 envelope files = 3 micro-batches, mtimes pinned ascending
    val in = s"$base/in"
    Seq(1L to 10L, 11L to 20L, 21L to 30L).zipWithIndex.foreach {
      case (ids, i) =>
        envelopes(ids).coalesce(1).write.parquet(s"$in/f$i")
        val dir = new java.io.File(s"$in/f$i")
        dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          val tgt = new java.io.File(in, f"part-$i%03d.parquet")
          assert(f.renameTo(tgt)); tgt.setLastModified(1000000000000L + i * 1000L)
          ()
        }
        org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    val ckpt = s"$base/ckpt"
    val cfg = CdcApply.CdcConfig("t", Seq("id"))
    def runOnce(): Unit = {
      val sch = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(in)
      val q = CdcStreamSink.attach(spark, stream, store, cfg, sinkId = "rs")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val rowsAfterRun = store.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rowsAfterRun === (1L to 30L).map(i => (i, s"v$i")))
    val versionAfterRun = store.currentVersion("t")
    val lastBatch = CdcStreamSink.batchIdTag("rs")
    assert(store.lastMetaValue("t", lastBatch) === Some("2"))
    // simulate the crash window: the table committed batch 2, but the
    // checkpoint's commit marker for it was never written
    val commits = new java.io.File(ckpt, "commits")
    val marker = new java.io.File(commits, "2")
    assert(marker.exists(), "expected checkpoint commit marker for batch 2")
    assert(marker.delete())
    // drop the checksum sidecar too, or the restarted query's re-commit
    // rename trips over it (ChecksumFileSystem artifact, test-only)
    val crc = new java.io.File(commits, ".2.crc")
    if (crc.exists()) { assert(crc.delete()); () }
    runOnce() // restart: Spark re-delivers batch 2 with the SAME id
    // the sink must skip it — no new snapshot, identical rows
    assert(store.currentVersion("t") === versionAfterRun,
      "a re-delivered batch must not commit a duplicate snapshot")
    assert(store.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === rowsAfterRun)
    assert(store.lastMetaValue("t", lastBatch) === Some("2"))
    // a genuinely NEW batch after the replay still applies
    envelopes(Seq(31L)).coalesce(1).write.parquet(s"$in/f3")
    val extra = new java.io.File(s"$in/f3")
    extra.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      val tgt = new java.io.File(in, "part-003.parquet")
      assert(f.renameTo(tgt)); tgt.setLastModified(1000000000000L + 3000L)
      ()
    }
    org.apache.commons.io.FileUtils.deleteDirectory(extra)
    runOnce()
    assert(store.read("t").count() === 31)
    assert(store.lastMetaValue("t", lastBatch) === Some("3"))
  }

  test("maintainViews sink: per-batch MV folds, atomic with the append, replay-safe") {
    import graft.tables.MaterializedView
    val base = tmpDir("mv-stream-")
    val root = s"$base/store"
    val store = new TableStore(spark, root)
    val rows0 = Seq(("a", 0L)).toDF("g", "x")
    store.create("st", rows0.schema)
    MaterializedView.create(store, "st_mv", "st", Seq("g"), Seq("sum:x"))
    // stage 3 single-file micro-batches, mtimes ascending
    val in = s"$base/in"
    def stage(i: Int, rows: Seq[(String, Long)]): Unit = {
      rows.toDF("g", "x").coalesce(1).write.parquet(s"$in/f$i")
      val dir = new java.io.File(s"$in/f$i")
      dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val tgt = new java.io.File(in, f"part-$i%03d.parquet")
        assert(f.renameTo(tgt)); tgt.setLastModified(1000000000000L + i * 1000L)
        ()
      }
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
    stage(0, Seq(("a", 1L), ("b", 2L)))
    stage(1, Seq(("a", 3L)))
    stage(2, Seq(("c", 5L), ("b", 7L)))
    val ckpt = s"$base/ckpt"
    def runOnce(): Unit = {
      val sch = spark.read.parquet(in).schema
      val q = spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .writeStream.format("graft-table")
        .option("root", root).option("table", "st")
        .option("sinkId", "mvst").option("maintainViews", "true")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def mvContents: Seq[(String, Long, Long)] = store.read("st_mv")
      .select("g", "cnt", "sum_x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    def recomputed: Seq[(String, Long, Long)] = store.read("st")
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum(col("x")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    runOnce()
    // the view tracked every batch: FRESH (applied == source version)
    // and value-identical to a recompute
    assert(mvContents === recomputed)
    assert(store.lastMetaValue("st_mv", MaterializedView.AppliedVersionMeta)
      .map(_.toInt) === Some(store.currentVersion("st")),
      "per-batch maintenance leaves the view FRESH")
    val tVer = store.currentVersion("st")
    val mvVer = store.currentVersion("st_mv")
    // crash window: the transaction published, the checkpoint marker
    // didn't — the replayed batch must fold NOTHING twice on either table
    val commits = new java.io.File(ckpt, "commits")
    val last = commits.listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).map(_.toInt).max
    assert(new java.io.File(commits, last.toString).delete())
    val crc = new java.io.File(commits, s".$last.crc")
    if (crc.exists()) { assert(crc.delete()); () }
    runOnce()
    assert(store.currentVersion("st") === tVer,
      "replayed batch must not re-append")
    assert(store.currentVersion("st_mv") === mvVer,
      "replayed batch must not re-fold the view")
    assert(mvContents === recomputed)
    // a genuinely new batch folds, atomically with its append
    stage(3, Seq(("a", 10L), ("d", 1L)))
    runOnce()
    assert(mvContents === recomputed)
    assert(store.read("st_mv").filter(col("g") === "d").count() === 1L)
    assert(store.lastMetaValue("st_mv", MaterializedView.AppliedVersionMeta)
      .map(_.toInt) === Some(store.currentVersion("st")))
  }
}
