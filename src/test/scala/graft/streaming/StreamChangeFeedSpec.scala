package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.tables.TableStore

/** The managed table's CHANGE FEED as a streaming source
  * (`changeFeed=true`): commits replay as labeled net changes — appends
  * as per-file inserts (still admission-controllable), mutations as one
  * net-change unit each — with the same exactly-once offsets as the
  * plain table source. */
class StreamChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def drain(root: String, table: String, checkpoint: String,
      extra: Map[String, String] = Map.empty)
      : Seq[(Long, String, String, Int)] = {
    val got = mutable.ArrayBuffer[(Long, String, String, Int)]()
    val stream = extra.foldLeft(
      spark.readStream.format("graft-table")
        .option("root", root).option("table", table)
        .option("changeFeed", "true")) {
      case (r, (k, v)) => r.option(k, v) }.load()
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3))).toSeq
        got.synchronized { got ++= rows; () }
      }.start()
    q.awaitTermination()
    got.toSeq.sorted
  }

  test("changeFeed requires startVersion") {
    val root = tmpDir("scf-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    val e = intercept[Exception] {
      spark.readStream.format("graft-table")
        .option("root", root).option("table", "t")
        .option("changeFeed", "true").load()
        .writeStream.option("checkpointLocation", tmpDir("scf-ckpt-"))
        .trigger(Trigger.AvailableNow())
        .format("noop").start().awaitTermination()
    }
    assert(e.getMessage != null)
  }

  test("appends, tombstones and CoW deletes replay as labeled changes") {
    val root = tmpDir("scf-")
    val ckpt = tmpDir("scf-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v0 = st.currentVersion("t")

    st.append("t", Seq((3L, "c")).toDF("id", "v"))
    val v1 = st.currentVersion("t")
    st.deleteMoR("t", Seq(1L).toDF("id"), Seq("id"))
    val v2 = st.currentVersion("t")
    val first = drain(root, "t", ckpt, Map("startVersion" -> v0.toString))
    assert(first === Seq(
      (1L, "a", "delete", v2),
      (3L, "c", "insert", v1)).sorted)

    // later commits tail through the same checkpoint
    st.delete("t", col("id") === 3L) // folds tombstone + CoW delete
    val second = drain(root, "t", ckpt)
    assert(second.map(t => (t._1, t._2, t._3)) === Seq((3L, "c", "delete")))
    // nothing new
    assert(drain(root, "t", ckpt).isEmpty)
  }

  test("feed stays sequence-correct under PENDING sidecars of both kinds") {
    // tombstones stay pending (never materialized) while the feed
    // replays: (1) a deleteMoR commit labels exactly the masked rows
    // 'delete'; (2) a LATER append re-inserting a tombstoned key labels
    // 'insert' and is NOT retro-masked (its file sequence is above the
    // delete's); (3) an updateMoR (deletion-vector sidecar) commit
    // labels old rows 'delete' and new rows 'insert' in one version.
    val root = tmpDir("scf-")
    val ckpt = tmpDir("scf-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    val v0 = st.currentVersion("t")
    st.deleteMoR("t", Seq(2L).toDF("id"), Seq("id"))
    val v1 = st.currentVersion("t")
    st.append("t", Seq((2L, "back")).toDF("id", "v")) // re-insert rule
    val v2 = st.currentVersion("t")
    st.updateMoR("t", col("id") === 3L, Map("v" -> lit("C")))
    val v3 = st.currentVersion("t")
    assert(st.pendingDeletes("t") === 2, "sidecars must stay PENDING")
    val got = drain(root, "t", ckpt, Map("startVersion" -> v0.toString))
    assert(got === Seq(
      (2L, "b", "delete", v1),
      (2L, "back", "insert", v2),
      (3L, "c", "delete", v3),
      (3L, "C", "insert", v3)).sorted)
    // the pending tombstones never retro-mask already-delivered rows:
    // nothing further to deliver
    assert(drain(root, "t", ckpt).isEmpty)
  }

  test("admission control splits append versions, not mutation units") {
    val root = tmpDir("scf-")
    val ckpt = tmpDir("scf-ckpt-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    val v0 = st.currentVersion("t")
    // one append of 4 files, then one CoW-style mutation
    st.append("t", (1L to 8L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(4))
    st.delete("t", col("id") === 5L)
    val batches = mutable.ArrayBuffer[Seq[(Long, String)]]()
    val q = spark.readStream.format("graft-table")
      .option("root", root).option("table", "t")
      .option("changeFeed", "true")
      .option("startVersion", v0.toString)
      .option("maxFilesPerTrigger", "2").load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect().map(r => (r.getLong(0), r.getString(2))).toSeq
        batches.synchronized { batches += rows; () }
      }.start()
    q.awaitTermination()
    val flat = batches.flatten
    assert(flat.count(_._2 == "insert") === 8)
    assert(flat.filter(_._2 == "delete").map(_._1) === Seq(5L))
    // 4 append files at 2/trigger = 2 batches, plus the mutation unit
    assert(batches.count(_.nonEmpty) >= 3)
  }
}
