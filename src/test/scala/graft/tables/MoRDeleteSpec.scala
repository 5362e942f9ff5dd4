package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Merge-on-read equality deletes: metadata-only delete commits, masked
  * reads with sequence-number semantics, bounded materialization. */
class MoRDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def newStore() = new TableStore(spark, tmpDir("mor-"))

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("deleteMoR commits metadata only and masks reads") {
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    st.append("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    val filesBefore = st.currentRelPaths("t")
    st.deleteMoR("t", Seq(2L).toDF("id"), Seq("id"))
    // no data file touched — the delete is a sidecar + key file
    assert(st.currentRelPaths("t") === filesBefore)
    assert(st.pendingDeletes("t") === 1)
    assert(st.read("t").orderBy("id").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 3L))
    // metadata aggregates refuse while a delete is pending
    assert(st.rowCount("t").isEmpty)
    assert(st.columnRange("t", "id").isEmpty)
  }

  test("sequence rule: a later append revives the key; earlier rows stay masked") {
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    st.deleteMoR("t", Seq(2L).toDF("id"), Seq("id"))
    // re-insert AFTER the delete: the new row must survive the mask
    st.append("t", Seq((2L, "b2"), (4L, "d")).toDF("id", "v"))
    val rows = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "a"), (2L, "b2"), (4L, "d")))
    // a second delete masks both generations of its key
    st.deleteMoR("t", Seq(2L).toDF("id"), Seq("id"))
    assert(st.read("t").orderBy("id").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 4L))
    // and a third append revives again
    st.append("t", Seq((2L, "b3")).toDF("id", "v"))
    val again = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(again.toSeq === Seq((1L, "a"), (2L, "b3"), (4L, "d")))
  }

  test("materializeDeletes folds masks in, clears sidecars, restores metadata aggs") {
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    // two range-disjoint files: the delete key lives in only one
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1))
    st.append("t", Seq((100L, "x"), (200L, "y")).toDF("id", "v").coalesce(1))
    assert(st.currentRelPaths("t").size === 2)
    st.deleteMoR("t", Seq(100L).toDF("id"), Seq("id"))
    val before = st.currentRelPaths("t").toSet
    st.materializeDeletes("t")
    assert(st.pendingDeletes("t") === 0)
    val after = st.currentRelPaths("t").toSet
    // zone pruning: the low-range file is untouched, the high one rewritten
    assert(before.intersect(after).size === 1)
    assert(st.read("t").orderBy("id").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 2L, 200L))
    assert(st.rowCount("t") === Some(3L))
    assert(st.columnRange("t", "id") === Some((1L, 200L)))
    // idempotent on a clean table
    val v = st.currentVersion("t")
    st.materializeDeletes("t")
    assert(st.currentVersion("t") === v)
  }

  test("CoW mutations materialize first and never resurrect masked rows") {
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    st.append("t", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    st.deleteMoR("t", Seq(3L, 4L).toDF("id"), Seq("id"))
    st.delete("t", col("id") === 5L) // CoW over the same file
    assert(st.pendingDeletes("t") === 0)
    assert(st.read("t").orderBy("id").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 2L, 6L, 7L, 8L, 9L, 10L))
    // upsert path after a fresh MoR delete
    st.deleteMoR("t", Seq(6L).toDF("id"), Seq("id"))
    st.upsert("t", Seq((7L, "V7"), (11L, "v11")).toDF("id", "v"), Seq("id"))
    val rows = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "v1"), (2L, "v2"), (7L, "V7"), (8L, "v8"),
      (9L, "v9"), (10L, "v10"), (11L, "v11")))
  }

  test("compact folds pending deletes into the rewrite") {
    val st = newStore()
    st.create("t", schema, zoneCols = Seq("id"))
    st.append("t", (1L to 6L).map(i => (i, s"v$i")).toDF("id", "v"))
    st.deleteMoR("t", Seq(2L, 5L).toDF("id"), Seq("id"))
    st.compact("t", numFiles = 1)
    assert(st.pendingDeletes("t") === 0)
    assert(st.read("t").orderBy("id").collect().map(_.getLong(0)).toSeq ===
      Seq(1L, 3L, 4L, 6L))
  }

  test("time travel sees the masks of its own snapshot") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val vPre = st.currentVersion("t")
    st.deleteMoR("t", Seq(1L).toDF("id"), Seq("id"))
    val vPost = st.currentVersion("t")
    st.append("t", Seq((3L, "c")).toDF("id", "v"))
    assert(st.readVersion("t", vPre).orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(st.readVersion("t", vPost).orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
    assert(st.read("t").orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(2L, 3L))
  }

  test("multi-column keys and readRange masking") {
    val st = newStore()
    val sch = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType), StructField("v", DoubleType)))
    st.create("t", sch, zoneCols = Seq("a"))
    st.append("t", Seq((1L, "x", 1.0), (1L, "y", 2.0), (2L, "x", 3.0))
      .toDF("a", "b", "v"))
    st.deleteMoR("t", Seq((1L, "y")).toDF("a", "b"), Seq("a", "b"))
    val rows = st.read("t").orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "x"), (2L, "x")))
    assert(st.readRange("t", "a", 1L, 1L).collect()
      .map(_.getString(1)).toSeq === Seq("x"))
  }

  test("rename survives: delete files key physically") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    st.deleteMoR("t", Seq(1L).toDF("id"), Seq("id"))
    st.renameColumn("t", "id", "key")
    assert(st.read("t").select("key").collect().map(_.getLong(0)).toSeq ===
      Seq(2L))
    // dropping the delete's key column is refused while pending
    intercept[IllegalArgumentException] {
      st.dropColumn("t", "key")
    }
    st.materializeDeletes("t")
    st.dropColumn("t", "key") // fine once folded in
  }

  test("truncate and overwrite drop pending deletes; expiry removes key files") {
    val st = newStore()
    st.create("t", schema)
    st.append("t", Seq((1L, "a")).toDF("id", "v"))
    st.deleteMoR("t", Seq(1L).toDF("id"), Seq("id"))
    st.overwrite("t", Seq((1L, "A")).toDF("id", "v"))
    assert(st.pendingDeletes("t") === 0)
    // the overwritten row is NOT masked by the dropped delete
    assert(st.read("t").collect().map(_.getString(1)).toSeq === Seq("A"))
    st.deleteMoR("t", Seq(1L).toDF("id"), Seq("id"))
    st.truncate("t")
    assert(st.pendingDeletes("t") === 0)
    assert(st.read("t").count() === 0)
    st.expireSnapshots("t", keepLast = 1)
    // no surviving snapshot references any delete file
    val delDir = new java.io.File(s"${st.root}/t/deletes")
    assert(!delDir.exists() || delDir.listFiles().isEmpty)
  }
}
