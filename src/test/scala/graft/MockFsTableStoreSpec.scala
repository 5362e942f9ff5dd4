package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import graft.tables.TableStore

/** TableStore on a NON-`file:` scheme (mockfs: → MockFs): every commit
  * primitive runs through the Hadoop-generic branch — FileContext
  * rename-with-overwrite for the `_current`/schema swaps, and
  * `fs.create(overwrite = false)` for the commit lock — instead of the
  * java.nio local fast path the rest of the suite exercises. This is the
  * proof the store's guarantees do not silently depend on POSIX rename
  * (round-4 gap #3: the reference gets the equivalent guarantee from
  * Iceberg's catalog commit, SparkUtils.java:46-50). */
class MockFsTableStoreSpec extends SparkSpec {

  private val fsProps = Map(
    "fs.mockfs.impl" -> classOf[MockFs].getName,
    "fs.AbstractFileSystem.mockfs.impl" -> classOf[MockAbstractFs].getName)

  private def newStore(): TableStore = {
    // Spark's own read/write paths resolve the scheme from the session
    // hadoop conf; the store additionally receives the props through its
    // hadoop.* passthrough, proving that plumbing too
    fsProps.foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v) }
    new TableStore(spark, "mockfs:" + tmpDir("mockfs-store-"), fsProps)
  }

  private def fsOf(st: TableStore) =
    new HPath(st.root).getFileSystem({
      val c = spark.sessionState.newHadoopConf()
      fsProps.foreach { case (k, v) => c.set(k, v) }
      c
    })

  test("full lifecycle on a non-file scheme: create/append/upsert/delete/compact/time-travel") {
    import spark.implicits._
    val st = newStore()
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    st.create("t", df.schema, zoneCols = Seq("id"))
    st.append("t", df)
    assert(st.read("t").count() === 100)
    val v1 = st.currentVersion("t")

    // upsert through applyNet: copy-on-write rewrite via FileContext commits
    st.upsert("t", Seq((5L, "updated"), (101L, "new")).toDF("id", "v"), Seq("id"))
    assert(st.read("t").filter(col("id") === 5).select("v")
      .collect()(0).getString(0) === "updated")
    assert(st.read("t").count() === 101)

    st.delete("t", col("id") > 90)
    assert(st.read("t").count() === 90) // 91..100 and the upserted 101 gone

    st.compact("t", 2)
    assert(st.read("t").count() === 90)
    assert(st.currentRelPaths("t").length === 2)

    // snapshots written before all of the above remain readable
    assert(st.readVersion("t", v1).count() === 100)

    // schema evolution swaps _schema.json through the same rename branch
    st.addColumns("t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.DoubleType))))
    assert(st.read("t").columns.toSeq === Seq("id", "v", "score"))
    assert(st.read("t").filter(col("score").isNotNull).count() === 0)

    // the round-5 metadata layer holds on the non-file branch too:
    // recorded row counts answer exactly after the CoW mutations above
    assert(st.rowCount("t") === Some(90L))
    assert(st.columnRange("t", "id") === Some((1L, 90L)))
  }

  test("bloom sidecars, merge, and orphan cleanup work on the non-file branch") {
    import spark.implicits._
    val st = newStore()
    val df = (0L until 200L).map(i => (i, i * 37 % 10000, 1.0)).toDF("id", "u", "amt")
    st.create("b", df.schema, zoneCols = Seq("id"),
      bloomCols = Seq("u"), bloomItems = 1000)
    st.append("b", df.repartitionByRange(4, col("id")))
    // bloom-pruned candidates for a scattered key batch
    val cand = st.candidateFilesForKeys("b", Seq(37L * 150 % 10000).toDF("u"), Seq("u"))
    assert(cand.length < 4, s"bloom pruned nothing on mockfs: $cand")
    // partial-column merge commits atomically through FileContext renames
    st.merge("b", Seq((150L, 0L, 99.0)).toDF("id", "u", "amt"),
      Seq("id"), updateCols = Seq("amt"))
    val row = st.read("b").filter(col("id") === 150L).collect()(0)
    assert(row.getDouble(2) === 99.0)
    assert(row.getLong(1) === 37L * 150 % 10000) // non-update col preserved
    // orphan cleanup respects references and the age fence here too
    val fs = fsOf(st)
    val orphan = new HPath(st.root + "/b/data/orphan.parquet")
    val o = fs.create(orphan, true); o.write("junk".getBytes); o.close()
    assert(st.removeOrphans("b") === Seq.empty) // young
    fs.setTimes(orphan, System.currentTimeMillis() - 25L * 3600 * 1000, -1)
    assert(st.removeOrphans("b") === Seq("orphan.parquet"))
    assert(st.read("b").count() === 200)
  }

  test("concurrent-writer lock waits, times out, releases on the non-file branch") {
    import spark.implicits._
    val st = newStore()
    val df = Seq((1L, "a")).toDF("id", "v")
    st.create("t", df.schema)
    val fs = fsOf(st)
    val lock = new HPath(new HPath(st.root, "t"), "_commit.lock")
    fs.create(lock, false).close() // a live competing writer
    val prior = TableStore.LockWaitMs
    TableStore.LockWaitMs = 300L
    try intercept[IllegalStateException] { st.append("t", df) }
    finally TableStore.LockWaitMs = prior
    fs.delete(lock, false)
    st.append("t", df) // lock released → commit proceeds
    assert(st.read("t").count() === 1)
  }

  test("stale lock is reclaimed via rename on the non-file branch") {
    import spark.implicits._
    val st = newStore()
    val df = Seq((1L, "a")).toDF("id", "v")
    st.create("t", df.schema)
    val fs = fsOf(st)
    val lock = new HPath(new HPath(st.root, "t"), "_commit.lock")
    fs.create(lock, false).close()
    // age it past the reclaim threshold — crash debris, not a live writer
    fs.setTimes(lock, System.currentTimeMillis() - TableStore.StaleLockMs - 60000, -1)
    st.append("t", df) // must reclaim and commit, not throw
    assert(st.read("t").count() === 1)
    assert(!fs.exists(lock))
  }

  test("reader isolation holds across FileContext pointer swaps") {
    import spark.implicits._
    val st = newStore()
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    st.create("t", df.schema)
    st.append("t", df)
    val before = st.read("t")
    st.upsert("t", Seq((1L, "changed")).toDF("id", "v"), Seq("id"))
    // the pre-commit DataFrame still reads its own snapshot's files
    assert(before.filter(col("id") === 1).select("v")
      .collect()(0).getString(0) === "a")
    assert(st.read("t").filter(col("id") === 1).select("v")
      .collect()(0).getString(0) === "changed")
  }

  test("round-7 surfaces hold on the non-file branch: namespaces, views, " +
    "MoR update/apply, position deletes") {
    import spark.implicits._
    val st = newStore()
    // namespaces + markers through the generic atomicWrite path
    st.createNamespace(Seq("ns"), Map("tier" -> "t"))
    assert(st.namespaceExists(Seq("ns")))
    assert(st.namespaceProps(Seq("ns")) === Map("tier" -> "t"))
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v")
    st.create("ns.t", df.schema)
    st.append("ns.t", df)
    // views (marker files) resolve and read back
    st.createView("ns.view1", "SELECT 1 AS one")
    assert(st.viewExists("ns.view1"))
    assert(st.viewSql("ns.view1") === "SELECT 1 AS one")
    assert(st.dropView("ns.view1"))
    // MoR update: position sidecar + appended rows, one commit
    val files = st.currentRelPaths("ns.t").toSet
    st.updateMoR("ns.t", col("k") <= 5, Map("v" -> lit("u")))
    assert(files.subsetOf(st.currentRelPaths("ns.t").toSet))
    assert(st.pendingDeletes("ns.t") === 1)
    assert(st.read("ns.t").filter(col("v") === "u").count() === 5L)
    // MoR CDC apply (property-routed)
    st.setProperties("ns.t", Map("write.merge.mode" -> Some("merge-on-read")))
    st.applyNet("ns.t", Seq(7L).toDF("k"), Seq((7L, "seven")).toDF("k", "v"),
      Seq("k"))
    assert(st.read("ns.t").filter(col("k") === 7).select("v")
      .head().getString(0) === "seven")
    // position delete + materialize fold
    st.deletePos("ns.t", col("k") > 45)
    assert(st.read("ns.t").count() === 45L)
    st.materializeDeletes("ns.t")
    assert(st.pendingDeletes("ns.t") === 0)
    assert(st.read("ns.t").count() === 45L)
    // cascade teardown
    assert(st.dropNamespace(Seq("ns"), cascade = true))
    assert(!st.exists("ns.t"))
  }
}
