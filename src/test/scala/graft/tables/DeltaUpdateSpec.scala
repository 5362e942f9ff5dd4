package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Delta-based (merge-on-read) SQL row-level operations via
  * SupportsDelta: UPDATE/MERGE write position sidecars + appended rows
  * instead of rewriting candidate files. */
class DeltaUpdateSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("delta-")
  spark.conf.set("spark.sql.catalog.gdl", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gdl.root", root)
  private def store = new TableStore(spark, root)

  test("SQL UPDATE under write.update.mode=merge-on-read rewrites nothing") {
    spark.sql("""CREATE TABLE gdl.t (k BIGINT, v STRING, amt DOUBLE)
      TBLPROPERTIES ('zone_cols'='k', 'write.update.mode'='merge-on-read')""")
    store.append("t", (0L until 100L).map(i => (i, s"v$i", i * 1.0))
      .toDF("k", "v", "amt").repartition(4))
    val before = store.currentRelPaths("t").toSet
    val ver = store.currentVersion("t")
    spark.sql("UPDATE gdl.t SET amt = amt + 1000.0, v = 'upd' WHERE k < 10")
    assert(store.currentVersion("t") === ver + 1, "one atomic commit")
    assert(before.subsetOf(store.currentRelPaths("t").toSet),
      "MoR update must not rewrite existing files")
    assert(store.pendingDeletes("t") === 1, "one position sidecar")
    val got = spark.sql("SELECT k, v, amt FROM gdl.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.length === 100)
    assert(got(3) === ((3L, "upd", 1003.0)))
    assert(got(50) === ((50L, "v50", 50.0)))
    // update matching nothing commits nothing
    val v2 = store.currentVersion("t")
    spark.sql("UPDATE gdl.t SET v = 'x' WHERE k > 10000")
    assert(store.currentVersion("t") === v2)
    // chained update over previously-updated rows sees their new values
    spark.sql("UPDATE gdl.t SET amt = amt * 2 WHERE v = 'upd'")
    assert(spark.sql("SELECT amt FROM gdl.t WHERE k = 3").head().getDouble(0)
      === 2006.0)
    // materialize folds; results unchanged
    spark.sql("CALL gdl.system.materialize_deletes('t')")
    assert(store.pendingDeletes("t") === 0)
    assert(spark.sql("SELECT amt FROM gdl.t WHERE k = 3").head().getDouble(0)
      === 2006.0)
    assert(spark.sql("SELECT count(*) FROM gdl.t").head().getLong(0) === 100L)
  }

  test("MERGE INTO under write.merge.mode=merge-on-read: matched update, " +
    "matched delete, and inserts in one commit") {
    spark.sql("""CREATE TABLE gdl.m (k BIGINT, v STRING)
      TBLPROPERTIES ('write.merge.mode'='merge-on-read')""")
    store.append("m", Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v"))
    Seq((2L, "B"), (3L, "DEL"), (9L, "new")).toDF("k", "v")
      .createOrReplaceTempView("gdl_src")
    val before = store.currentRelPaths("m").toSet
    val ver = store.currentVersion("m")
    spark.sql("""MERGE INTO gdl.m t USING gdl_src s ON t.k = s.k
      WHEN MATCHED AND s.v = 'DEL' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    assert(store.currentVersion("m") === ver + 1, "one atomic commit")
    assert(before.subsetOf(store.currentRelPaths("m").toSet),
      "MoR merge must not rewrite existing files")
    assert(store.pendingDeletes("m") === 1)
    val got = spark.sql("SELECT k, v FROM gdl.m ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a"), (2L, "B"), (4L, "d"), (9L, "new")))
  }

  test("MERGE NOT MATCHED BY SOURCE under merge-on-read stays delta") {
    spark.sql("""CREATE TABLE gdl.ms (k BIGINT, v STRING)
      TBLPROPERTIES ('write.merge.mode'='merge-on-read')""")
    store.append("ms", (1L to 8L).map(i => (i, s"v$i")).toDF("k", "v"))
    Seq((2L, "B"), (9L, "new")).toDF("k", "v")
      .createOrReplaceTempView("gdl_ms_src")
    val before = store.currentRelPaths("ms").toSet
    val ver = store.currentVersion("ms")
    // full sync-style mirror: every clause kind incl. BY SOURCE, one
    // commit, no data file rewritten (deltas + appends only)
    spark.sql("""MERGE INTO gdl.ms t USING gdl_ms_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.k > 6 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    assert(store.currentVersion("ms") === ver + 1, "one atomic commit")
    assert(before.subsetOf(store.currentRelPaths("ms").toSet),
      "MoR merge must not rewrite existing files")
    assert(store.pendingDeletes("ms") >= 1)
    val got = spark.sql("SELECT k, v FROM gdl.ms ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "stale"), (2L, "B"), (3L, "stale"),
      (4L, "stale"), (5L, "stale"), (6L, "stale"), (9L, "new")))
  }

  test("delta DELETE via the rewrite path (subquery condition) stays MoR") {
    spark.sql("""CREATE TABLE gdl.d (k BIGINT, v STRING)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    store.append("d", (0L until 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    Seq(3L, 5L).toDF("kk").createOrReplaceTempView("gdl_kill")
    val before = store.currentRelPaths("d").toSet
    // a subquery condition cannot reach deleteWhere — it takes the
    // rewrite path, which under merge-on-read is the DELTA plan
    spark.sql("DELETE FROM gdl.d WHERE k IN (SELECT kk FROM gdl_kill)")
    assert(before.subsetOf(store.currentRelPaths("d").toSet),
      "rewrite-path MoR delete must not rewrite files")
    assert(store.pendingDeletes("d") >= 1)
    assert(spark.sql("SELECT count(*) FROM gdl.d").head().getLong(0) === 18L)
    assert(spark.sql("SELECT k FROM gdl.d WHERE k IN (3, 5)").count() === 0L)
  }

  test("partitioned table: delta inserts land in partition dirs; " +
    "updated rows stay readable per partition") {
    spark.sql("""CREATE TABLE gdl.p (k BIGINT, p STRING)
      PARTITIONED BY (p)
      TBLPROPERTIES ('write.update.mode'='merge-on-read')""")
    store.append("p", Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("k", "p"))
    spark.sql("UPDATE gdl.p SET k = k + 100 WHERE p = 'x'")
    assert(store.pendingDeletes("p") === 1)
    val got = spark.sql("SELECT k, p FROM gdl.p ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((3L, "y"), (101L, "x"), (102L, "x")))
    // partition pruning still sees the appended rows
    assert(spark.sql("SELECT count(*) FROM gdl.p WHERE p = 'x'")
      .head().getLong(0) === 2L)
  }

  test("delta write clusters by partition: one appended file per dir") {
    spark.sql("""CREATE TABLE gdl.w (k BIGINT, p STRING)
      PARTITIONED BY (p)
      TBLPROPERTIES ('write.update.mode'='merge-on-read')""")
    store.append("w", (0L until 400L)
      .map(i => (i, s"p${i % 4}")).toDF("k", "p").repartition(8))
    val before = store.currentRelPaths("w").toSet
    spark.sql("UPDATE gdl.w SET k = k + 1000 WHERE k < 200")
    val appended = store.currentRelPaths("w").toSet -- before
    // updated rows span all 4 partitions from 8 input partitions; the
    // clustered distribution must land ONE file per partition dir
    val byDir = appended.groupBy(_.split('/').init.mkString("/"))
    assert(byDir.keys.size === 4, s"expected 4 dirs, got ${byDir.keys}")
    byDir.foreach { case (dir, fs) =>
      assert(fs.size === 1, s"$dir got ${fs.size} files — spray, not clustered")
    }
    assert(spark.sql("SELECT count(*) FROM gdl.w WHERE k >= 1000")
      .head().getLong(0) === 200L)
    assert(spark.sql("SELECT count(*) FROM gdl.w").head().getLong(0) === 400L)
  }

  test("copy-on-write remains the default (no property, files rewrite)") {
    spark.sql("CREATE TABLE gdl.c (k BIGINT, v STRING)")
    store.append("c", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    spark.sql("UPDATE gdl.c SET v = 'z' WHERE k = 1")
    assert(store.pendingDeletes("c") === 0, "default UPDATE stays CoW")
    assert(spark.sql("SELECT v FROM gdl.c WHERE k = 1").head().getString(0)
      === "z")
  }
}
