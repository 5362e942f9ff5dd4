package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** What must SURVIVE routine maintenance (expire_snapshots) and
  * multi-query sink sharing: the inspection tables, the streaming
  * sink's replay memory, and the batch-id idempotence scope. Each test
  * here pins a failure mode found by review: a dangling parent pointer
  * after expiry crashing `t.snapshots`; the parent-chain walk losing
  * its tag memory after expiry (a crash-window replay would then
  * double-apply a batch); and two independent queries silently sharing
  * one sink idempotence scope. */
class MaintenanceSurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): TableStore =
    new TableStore(spark, tmpDir("maint-"))

  test("snapshots inspection table survives expire_snapshots") {
    val st = freshStore()
    st.create("t", Seq((1L, "a")).toDF("k", "v").schema)
    (1 to 4).foreach(i => st.append("t", Seq((i.toLong, s"v$i")).toDF("k", "v")))
    st.compact("t", numFiles = 1)
    st.expireSnapshots("t", keepLast = 2)
    // the head of the retained window records an expired parent — the
    // frame must classify it best-effort, never throw
    val snaps = st.snapshotsFrame("t").collect()
    assert(snaps.nonEmpty)
    assert(snaps.map(_.getInt(0)).contains(st.currentVersion("t")))
    // rows of the retained commits still resolve
    assert(st.read("t").count() === 4L)
  }

  test("lastMetaValue keeps tag memory across expire_snapshots") {
    val st = freshStore()
    st.create("t", Seq((1L, "a")).toDF("k", "v").schema)
    st.append("t", Seq((1L, "a")).toDF("k", "v"),
      meta = Map("graft.stream.appendBatchId.s" -> "7"))
    // later commits carry no tag — the walk must pass through them
    st.append("t", Seq((2L, "b")).toDF("k", "v"))
    st.compact("t", numFiles = 1)
    st.append("t", Seq((3L, "c")).toDF("k", "v"))
    assert(st.lastMetaValue("t", "graft.stream.appendBatchId.s") === Some("7"))
    // expire the tagged commit out of history: the tag must be carried
    // forward onto the oldest retained commit, not silently lost
    st.expireSnapshots("t", keepLast = 2)
    assert(st.lastMetaValue("t", "graft.stream.appendBatchId.s") === Some("7"),
      "expiry must not erase the streaming sink's replay memory")
    // a newer tag still wins after maintenance
    st.append("t", Seq((4L, "d")).toDF("k", "v"),
      meta = Map("graft.stream.appendBatchId.s" -> "9"))
    assert(st.lastMetaValue("t", "graft.stream.appendBatchId.s") === Some("9"))
  }

  test("nearest expired ancestor wins when several carry the same tag") {
    val st = freshStore()
    st.create("t", Seq(1L).toDF("k").schema)
    st.append("t", Seq(1L).toDF("k"), meta = Map("tag" -> "old"))
    st.append("t", Seq(2L).toDF("k"), meta = Map("tag" -> "new"))
    st.append("t", Seq(3L).toDF("k"))
    st.append("t", Seq(4L).toDF("k"))
    st.expireSnapshots("t", keepLast = 2)
    assert(st.lastMetaValue("t", "tag") === Some("new"))
  }

  test("sink fails fast when a fresh query shares a committed scope") {
    val st = freshStore()
    val sinkA = new graft.streaming.GraftTableSink(st, "t", "shared")
    sinkA.addBatch(0, Seq((1L, "a")).toDF("k", "v"))
    sinkA.addBatch(1, Seq((2L, "b")).toDF("k", "v"))
    assert(st.read("t").count() === 2L)
    // same-scope crash replay of the LAST batch: legitimate skip
    sinkA.addBatch(1, Seq((2L, "b")).toDF("k", "v"))
    assert(st.read("t").count() === 2L)
    // a DIFFERENT query (fresh checkpoint, batch ids restart at 0)
    // sharing the scope must be an error, not silent data loss
    val sinkB = new graft.streaming.GraftTableSink(st, "t", "shared")
    val e = intercept[IllegalStateException] {
      sinkB.addBatch(0, Seq((9L, "z")).toDF("k", "v"))
    }
    assert(e.getMessage.contains("sharing"))
    // distinct scopes coexist on one table
    val sinkC = new graft.streaming.GraftTableSink(st, "t", "other")
    sinkC.addBatch(0, Seq((9L, "z")).toDF("k", "v"))
    assert(st.read("t").count() === 3L)
  }

  test("provider derives distinct sink scopes from checkpointLocation") {
    val st = freshStore()
    val provider = new graft.streaming.GraftTableSourceProvider
    def mk(ckpt: String) = provider.createSink(spark.sqlContext,
      Map("root" -> st.root, "table" -> "t", "checkpointLocation" -> ckpt),
      Nil, org.apache.spark.sql.streaming.OutputMode.Append())
    val s1 = mk("/ckpt/query-one")
    val s2 = mk("/ckpt/query-two")
    s1.addBatch(0, Seq((1L, "a")).toDF("k", "v"))
    s1.addBatch(1, Seq((2L, "b")).toDF("k", "v"))
    // query two starts at batch 0 — with a shared scope this would skip
    // (or now throw); with checkpoint-derived scopes it must append
    s2.addBatch(0, Seq((3L, "c")).toDF("k", "v"))
    assert(st.read("t").count() === 3L)
  }

  test("promoteStaged still drops zero-row CoW rewrite files") {
    val st = freshStore()
    val df = spark.range(0, 100).select(col("id").as("k"),
      (col("id") % 10).as("m"))
    st.create("t", df.schema)
    st.append("t", df.repartition(4))
    // delete everything in one partition's key space: some rewrite
    // partitions lose every row and would write footer-only parquet
    st.delete("t", col("k") < 50L)
    assert(st.read("t").count() === 50L)
    st.currentRelPaths("t").foreach { rel =>
      // no committed file may be empty (metadata-only count would die)
      assert(st.filesFrame("t").filter(col("rows") === 0L).count() === 0L)
    }
    assert(st.rowCount("t") === Some(50L))
  }
}
