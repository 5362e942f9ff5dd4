package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.tables.TableStore

/** The managed table as a Structured Streaming SOURCE: initial snapshot
  * then append tailing, checkpointed offsets, compaction safety. */
class GraftTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  /** Drain the table stream with AvailableNow against `checkpoint`,
    * collecting (batchId, rows) per delivered micro-batch. */
  private def drain(root: String, table: String, checkpoint: String,
      extra: Map[String, String] = Map.empty): Seq[(Long, Seq[(Long, String)])] = {
    val got = mutable.ArrayBuffer[(Long, Seq[(Long, String)])]()
    val stream = extra.foldLeft(
      spark.readStream.format("graft-table")
        .option("root", root).option("table", table)) {
      case (r, (k, v)) => r.option(k, v) }.load()
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, id: Long) =>
        val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        got.synchronized { got += ((id, rows)); () }
      }.start()
    q.awaitTermination()
    got.toSeq
  }

  test("initial snapshot, then only the appended tail on re-run") {
    val root = tmpDir("tsrc-")
    val ckpt = tmpDir("tsrc-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema, zoneCols = Seq("id"))
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val first = drain(root, "t", ckpt)
    assert(first.flatMap(_._2).map(_._1).sorted === Seq(1L, 2L))
    // two more commits land; same checkpoint tails exactly those rows
    st.append("t", Seq((3L, "c")).toDF("id", "v"))
    st.append("t", Seq((4L, "d")).toDF("id", "v"))
    val second = drain(root, "t", ckpt)
    assert(second.flatMap(_._2).map(_._1).sorted === Seq(3L, 4L))
    // nothing new: a drained stream delivers no batch rows
    assert(drain(root, "t", ckpt).flatMap(_._2).isEmpty)
  }

  test("compaction between runs re-delivers nothing; later appends still flow") {
    val root = tmpDir("tsrc-")
    val ckpt = tmpDir("tsrc-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(drain(root, "t", ckpt).flatMap(_._2).size === 2)
    st.compact("t", numFiles = 1) // rewrites every file, appends no rows
    st.append("t", Seq((3L, "c")).toDF("id", "v"))
    val tail = drain(root, "t", ckpt).flatMap(_._2)
    assert(tail.map(_._1) === Seq(3L))
  }

  test("snapshot batch applies pending MoR deletes; masked rows never stream") {
    val root = tmpDir("tsrc-")
    val ckpt = tmpDir("tsrc-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    st.deleteMoR("t", Seq(2L).toDF("id"), Seq("id"))
    val got = drain(root, "t", ckpt).flatMap(_._2)
    assert(got.map(_._1).sorted === Seq(1L, 3L))
  }

  test("snapshot masks pending DV position deletes; columns stay bound") {
    // two same-typed adjacent long columns: a positional misbind in the
    // masked snapshot (streamingFrame maps attributes by POSITION to the
    // source schema) would swap values silently — pin exact tuples
    val root = tmpDir("tsrc-")
    val ckpt = tmpDir("tsrc-ckpt-")
    val st = new TableStore(spark, root)
    val sch = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType), StructField("v", StringType)))
    st.create("t", sch, zoneCols = Seq("a"))
    st.append("t", (0L until 20L).map(i => (i, i * 100L, s"s$i"))
      .toDF("a", "b", "v").repartition(2))
    st.deletePos("t", col("a") % 4 === 0)
    st.deleteMoR("t", Seq(1L, 5L).toDF("a"), Seq("a"))
    assert(st.pendingDeletes("t") === 2)
    val got = mutable.ArrayBuffer[(Long, Long, String)]()
    val q = spark.readStream.format("graft-table")
      .option("root", root).option("table", "t")
      .option("maxRowsPerTrigger", "6").load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        got.synchronized { got ++= rows; () }
      }.start()
    q.awaitTermination()
    val expect = (0L until 20L)
      .filterNot(i => i % 4 == 0 || i == 1L || i == 5L)
      .map(i => (i, i * 100L, s"s$i"))
    assert(got.sortBy(_._1).toSeq === expect)
    // appends AFTER the pending tombstones stream raw: a re-inserted
    // key flows (its file's sequence is above the deletes') and no
    // retraction is emitted
    st.append("t", Seq((1L, -1L, "back")).toDF("a", "b", "v"))
    got.clear()
    val q2 = spark.readStream.format("graft-table")
      .option("root", root).option("table", "t").load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        got.synchronized { got ++= rows; () }
      }.start()
    q2.awaitTermination()
    assert(got.toSeq === Seq((1L, -1L, "back")))
  }

  test("startVersion tails from a known snapshot without the initial state") {
    val root = tmpDir("tsrc-")
    val ckpt = tmpDir("tsrc-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "old")).toDF("id", "v"))
    val v = st.currentVersion("t")
    st.append("t", Seq((2L, "new")).toDF("id", "v"))
    val got = drain(root, "t", ckpt,
      Map("startVersion" -> v.toString)).flatMap(_._2)
    assert(got === Seq((2L, "new")))
  }

  test("transforms compose: streaming aggregation over the table source") {
    val root = tmpDir("tsrc-")
    val ckpt = tmpDir("tsrc-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "v"))
    val counts = mutable.Map[String, Long]()
    val q = spark.readStream.format("graft-table")
      .option("root", root).option("table", "t").load()
      .groupBy("v").agg(count(lit(1)).as("n"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => counts.synchronized {
          counts(r.getString(0)) = r.getLong(1) })
        ()
      }.start()
    q.awaitTermination()
    assert(counts.toMap === Map("x" -> 2L, "y" -> 1L))
  }

  test("sink: file stream into a managed table, one snapshot per batch") {
    val root = tmpDir("tsink-")
    val in = tmpDir("tsink-in-")
    val ckpt = tmpDir("tsink-ckpt-")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$in/f0")
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$in/f1")
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "2")
    val q = ss.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
      .writeStream.format("graft-table")
      .option("root", root).option("table", "sunk")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val st = new TableStore(spark, root)
    assert(st.read("sunk").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // one atomic commit per micro-batch on top of the created table
    assert(st.currentVersion("sunk") === 3)
    // restarting from the SAME checkpoint re-delivers nothing
    val q2 = ss.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$in/*")
      .writeStream.format("graft-table")
      .option("root", root).option("table", "sunk")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(st.read("sunk").count() === 3L)
  }

  test("sink: a replayed batch id is skipped, not double-applied") {
    val root = tmpDir("tsink2-")
    val st = new TableStore(spark, root)
    val sink = new GraftTableSink(st, "t2", "spec")
    val batch = Seq((1L, "a")).toDF("id", "v")
    sink.addBatch(0L, batch)
    sink.addBatch(0L, batch) // crash-window replay: same id again
    sink.addBatch(1L, Seq((2L, "b")).toDF("id", "v"))
    assert(st.read("t2").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b")))
    // complete mode is refused up front
    val e = intercept[Exception] {
      spark.readStream.format("graft-table")
        .option("root", root).option("table", "t2").load()
        .groupBy("v").count()
        .writeStream.format("graft-table")
        .option("root", root).option("table", "t3")
        .option("checkpointLocation", tmpDir("tsink2-ckpt-"))
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("maxRowsPerTrigger splits the initial snapshot into bounded batches") {
    val root = tmpDir("tsrc-cap-")
    val ckpt = tmpDir("tsrc-cap-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    // 8 files of 25 rows each
    (0 until 8).foreach { b =>
      val lo = b * 25L
      st.append("t", (lo until lo + 25L).map(i => (i, s"v$i"))
        .toDF("id", "v").coalesce(1))
    }
    val got = drain(root, "t", ckpt, Map("maxRowsPerTrigger" -> "60"))
    val sizes = got.map(_._2.size).filter(_ > 0)
    assert(sizes.sum === 200, "every row delivered exactly once")
    assert(got.flatMap(_._2).map(_._1).sorted === (0L until 200L))
    assert(sizes.size >= 4, s"snapshot split across batches, got $sizes")
    assert(sizes.forall(_ <= 60), s"every batch within the row cap: $sizes")
    // tail after the snapshot: caps still apply to catch-up ranges
    (0 until 3).foreach { b =>
      val lo = 1000L + b * 25L
      st.append("t", (lo until lo + 25L).map(i => (i, s"v$i"))
        .toDF("id", "v").coalesce(1))
    }
    val tail = drain(root, "t", ckpt, Map("maxRowsPerTrigger" -> "30"))
    val tailSizes = tail.map(_._2.size).filter(_ > 0)
    assert(tailSizes.sum === 75)
    assert(tailSizes.forall(_ <= 30), s"capped catch-up: $tailSizes")
  }

  test("maxFilesPerTrigger caps by file count") {
    val root = tmpDir("tsrc-capf-")
    val ckpt = tmpDir("tsrc-capf-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    (0 until 6).foreach { b =>
      st.append("t", Seq((b.toLong, s"v$b")).toDF("id", "v").coalesce(1))
    }
    val got = drain(root, "t", ckpt, Map("maxFilesPerTrigger" -> "2"))
    val sizes = got.map(_._2.size).filter(_ > 0)
    assert(sizes.sum === 6)
    assert(sizes.forall(_ <= 2) && sizes.size >= 3, s"got $sizes")
  }

  test("maxBytesPerTrigger caps by recorded file bytes") {
    val root = tmpDir("tsrc-capb-")
    val ckpt = tmpDir("tsrc-capb-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    (0 until 6).foreach { b =>
      st.append("t", Seq((b.toLong, s"v$b")).toDF("id", "v").coalesce(1))
    }
    // every file is a few hundred bytes: a 1-byte cap still admits one
    // file per trigger (progress guarantee), so 6 batches of 1 file
    val tiny = drain(root, "t", ckpt, Map("maxBytesPerTrigger" -> "1"))
    val sizes = tiny.map(_._2.size).filter(_ > 0)
    assert(sizes.sum === 6)
    assert(sizes.forall(_ === 1), s"1-byte cap must admit one file each: $sizes")
    // a generous cap drains in fewer, larger batches
    val ckpt2 = tmpDir("tsrc-capb2-ckpt-")
    val fat = drain(root, "t", ckpt2, Map("maxBytesPerTrigger" -> "1000000"))
    val fatSizes = fat.map(_._2.size).filter(_ > 0)
    assert(fatSizes.sum === 6)
    assert(fatSizes.size < 6, s"large cap must batch multiple files: $fatSizes")
  }

  test("restart mid-snapshot: failed batch replays byte-identical, total exact") {
    val root = tmpDir("tsrc-crash-")
    val ckpt = tmpDir("tsrc-crash-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    (0 until 5).foreach { b =>
      val lo = b * 10L
      st.append("t", (lo until lo + 10L).map(i => (i, s"v$i"))
        .toDF("id", "v").coalesce(1))
    }
    // first run dies after delivering one capped batch
    val seen = mutable.Map[Long, Seq[(Long, String)]]()
    def run(dieAfter: Int): Unit = {
      var delivered = 0
      val q = spark.readStream.format("graft-table")
        .option("root", root).option("table", "t")
        .option("maxRowsPerTrigger", "10").load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: DataFrame, id: Long) =>
          val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
          seen.synchronized {
            // a replayed batch id must deliver IDENTICAL content
            seen.get(id).foreach(prev => assert(prev.sorted === rows.sorted,
              s"batch $id replay diverged"))
            seen(id) = rows
          }
          delivered += 1
          if (delivered >= dieAfter) throw new RuntimeException("boom")
          ()
        }.start()
      try q.awaitTermination()
      catch { case _: Exception => () }
    }
    run(dieAfter = 2)   // batch 0 committed, batch 1 delivered then crash
    run(dieAfter = Int.MaxValue) // resume: replay batch 1, finish the rest
    assert(seen.values.flatten.map(_._1).toSeq.sorted === (0L until 50L),
      "exactly-once across the crash: no loss, no duplication")
  }

  test("offset json is backward compatible with plain version offsets") {
    assert(GraftSourceOffset.parse("7") ===
      GraftSourceOffset(7, snap = false, GraftSourceOffset.AllFiles))
    val o = GraftSourceOffset(12, snap = true, 3)
    assert(GraftSourceOffset.parse(o.json) === o)
  }
}
