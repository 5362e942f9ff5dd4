package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Row-level change feed ([[TableStore.changeFeed]]): every commit kind
  * must label exactly its net row changes — appends as inserts from the
  * appended files alone, CoW mutations as the multiset difference of the
  * rewritten scope, MoR tombstones as the masked-read difference, and a
  * compaction as NOTHING (row-preserving rewrites cancel). Versions are
  * captured live (create itself commits one). */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): TableStore = new TableStore(spark, tmpDir("cf-"))

  private def changes(st: TableStore, from: Int, to: Int)
      : Seq[(Long, String, String, Int)] =
    st.changeFeed("t", from, to)
      .select("k", "v", TableStore.ChangeTypeCol, TableStore.CommitVersionCol)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSeq.sorted

  test("append commits label their appended files as inserts") {
    val st = newStore()
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    st.create("t", a.schema)
    val v0 = st.currentVersion("t")
    st.append("t", a)
    val v1 = st.currentVersion("t")
    st.append("t", Seq((3L, "c")).toDF("k", "v"))
    val v2 = st.currentVersion("t")
    assert(changes(st, v0, v2) === Seq(
      (1L, "a", "insert", v1), (2L, "b", "insert", v1),
      (3L, "c", "insert", v2)))
    // a sub-range delivers only its versions
    assert(changes(st, v1, v2) === Seq((3L, "c", "insert", v2)))
    // an empty range is an empty frame with the labeled schema
    val empty = st.changeFeed("t", v2, v2)
    assert(empty.columns.takeRight(2).toSeq ===
      Seq(TableStore.ChangeTypeCol, TableStore.CommitVersionCol))
    assert(empty.count() === 0)
  }

  test("CoW delete labels removed rows; update labels delete+insert") {
    val st = newStore()
    val a = (1L to 6L).map(i => (i, s"v$i")).toDF("k", "v")
    st.create("t", a.schema)
    st.append("t", a)
    val v1 = st.currentVersion("t")
    st.delete("t", col("k") === 2L)
    val v2 = st.currentVersion("t")
    st.merge("t", Seq((3L, "V3"), (9L, "v9")).toDF("k", "v"), Seq("k"),
      updateCols = Seq("v"), insertUnmatched = true, deleteWhen = None)
    val v3 = st.currentVersion("t")
    assert(changes(st, v1, v2) === Seq((2L, "v2", "delete", v2)))
    assert(changes(st, v2, v3) === Seq(
      (3L, "V3", "insert", v3), (3L, "v3", "delete", v3),
      (9L, "v9", "insert", v3)))
  }

  test("MoR tombstones label masked-out rows; duplicates net exactly") {
    val st = newStore()
    // duplicate rows for k=4: exceptAll must keep multiset counts honest
    val a = ((1L to 5L).map(i => (i, s"v$i")) :+ (4L, "v4")).toDF("k", "v")
    st.create("t", a.schema)
    val v0 = st.currentVersion("t")
    st.append("t", a)
    val v1 = st.currentVersion("t")
    st.deleteMoR("t", Seq(Tuple1(4L)).toDF("k"), Seq("k"))
    val v2 = st.currentVersion("t")
    assert(changes(st, v1, v2) === Seq(
      (4L, "v4", "delete", v2), (4L, "v4", "delete", v2)))
    // the feed across both versions carries the inserts AND the deletes
    assert(changes(st, v0, v2).count(_._3 == "delete") === 2)
    assert(changes(st, v0, v2).count(_._3 == "insert") === 6)
  }

  test("tombstone keyed on a NON-LEADING column still nets (order pin)") {
    // the masked read surfaces its anti-join key columns first; without
    // the explicit column-order pin in changesOfVersion, exceptAll would
    // compare positionally misaligned rows and cancel nothing
    val st = newStore()
    val a = (1L to 5L).map(i => (i, s"v$i", i * 10L)).toDF("k", "v", "w")
    st.create("t", a.schema)
    st.append("t", a)
    val v1 = st.currentVersion("t")
    st.deleteMoR("t", Seq(Tuple1(30L)).toDF("w"), Seq("w")) // key = 3rd col
    val v2 = st.currentVersion("t")
    val got = st.changeFeed("t", v1, v2)
      .select("k", "v", "w", TableStore.ChangeTypeCol)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(got === Seq((3L, "v3", 30L, "delete")))
  }

  test("t.changes reads the feed through SQL with version-range options") {
    val root = tmpDir("cf-sql-")
    val st = new TableStore(spark, root)
    spark.conf.set("spark.sql.catalog.gcf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcf.root", root)
    val a = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    st.create("t", a.schema)
    val v0 = st.currentVersion("t")
    st.append("t", a)
    st.delete("t", col("k") === 1L)
    val v2 = st.currentVersion("t")
    st.append("t", Seq((3L, "c")).toDF("k", "v"))
    val got = spark.read
      .option("startVersion", v0).option("endVersion", v2)
      .table("gcf.t.changes")
      .select("k", "v", TableStore.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sorted
    assert(got === Seq((1L, "a", "delete"), (1L, "a", "insert"),
      (2L, "b", "insert")))
    // endVersion defaults to the head
    val toHead = spark.read.option("startVersion", v2)
      .table("gcf.t.changes").collect()
    assert(toHead.map(r => (r.getLong(0), r.getString(2))).toSeq ===
      Seq((3L, "insert")))
    // startVersion is required — a feed never delivers the initial state
    val e = intercept[Exception] {
      spark.read.table("gcf.t.changes").collect()
    }
    assert(e.getMessage.contains("startVersion"))
  }

  test("compaction contributes nothing") {
    val st = newStore()
    val a = (1L to 8L).map(i => (i, s"v$i")).toDF("k", "v")
    st.create("t", a.schema)
    val v0 = st.currentVersion("t")
    st.append("t", a.repartition(4))
    val v1 = st.currentVersion("t")
    st.compact("t", numFiles = 1)
    val v2 = st.currentVersion("t")
    assert(changes(st, v1, v2) === Seq.empty)
    // and the full feed still nets to the table's live rows
    val feed = changes(st, v0, v2)
    assert(feed.count(_._3 == "insert") === 8)
    assert(feed.count(_._3 == "delete") === 0)
  }

  test("materializing pending MoR deletes contributes nothing") {
    val st = newStore()
    val a = (1L to 6L).map(i => (i, s"v$i")).toDF("k", "v")
    st.create("t", a.schema)
    st.append("t", a)
    val v1 = st.currentVersion("t")
    st.deleteMoR("t", Seq(Tuple1(2L)).toDF("k"), Seq("k"))
    val v2 = st.currentVersion("t")
    st.materializeDeletes("t")
    val v3 = st.currentVersion("t")
    assert(changes(st, v1, v2) === Seq((2L, "v2", "delete", v2)))
    // the fold rewrote files but changed no visible rows
    assert(changes(st, v2, v3) === Seq.empty)
  }

  test("update pairing: same-commit same-key delete+insert relabel as " +
      "pre/post images; null keys and unpaired rows pass through") {
    val st = newStore()
    val a = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .select(col("k").cast("long").as("k"), col("v"))
    st.create("t", a.schema)
    st.append("t", a)
    val v1 = st.currentVersion("t")
    // one CoW commit that UPDATES k=1 (delete old + insert new), truly
    // DELETES k=2, and inserts a NEW key 4 — all in the same rewrite
    val rewritten = Seq((1L, "a2"), (3L, "c"), (4L, "d")).toDF("k", "v")
      .select(col("k").cast("long").as("k"), col("v"))
    st.overwrite("t", rewritten)
    val v2 = st.currentVersion("t")
    val got = st.changeFeedWithUpdates("t", v1, v2, Seq("k"))
      .select("k", "v", TableStore.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sorted
    assert(got === Seq(
      (1L, "a", "update_preimage"), (1L, "a2", "update_postimage"),
      (2L, "b", "delete"), (4L, "d", "insert")))

    // NULL identifier components never pair
    val st2 = newStore()
    val n0 = Seq((Option.empty[Long], "x")).toDF("k", "v")
    st2.create("t", n0.schema)
    st2.append("t", n0)
    val w1 = st2.currentVersion("t")
    st2.overwrite("t", Seq((Option.empty[Long], "y")).toDF("k", "v"))
    val w2 = st2.currentVersion("t")
    val nulls = st2.changeFeedWithUpdates("t", w1, w2, Seq("k"))
      .select("v", TableStore.ChangeTypeCol)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(nulls === Seq(("x", "delete"), ("y", "insert")))
  }
}
