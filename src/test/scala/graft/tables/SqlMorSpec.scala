package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `write.delete.mode=merge-on-read` on the SQL path: key-equality
  * DELETEs commit equality-delete sidecars (metadata-only, no data file
  * rewritten); non-key shapes fall back to copy-on-write; properties
  * round-trip through CREATE / ALTER / SHOW. */
class SqlMorSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("sqlmor-")
  spark.conf.set("spark.sql.catalog.gsm", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gsm.root", root)
  private def store = new TableStore(spark, root)

  test("MoR DELETE masks without rewriting files; materialize folds") {
    spark.sql("""CREATE TABLE gsm.t (k BIGINT, grp STRING, v DOUBLE)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.range(0, 100).select(col("id").as("k"),
      concat(lit("g"), col("id") % 4).as("grp"),
      (col("id") * 1.5).as("v"))
      .repartition(4).createOrReplaceTempView("gsm_src")
    spark.sql("INSERT INTO gsm.t SELECT * FROM gsm_src")
    val filesBefore = store.currentRelPaths("t")
    spark.sql("DELETE FROM gsm.t WHERE k = 5")
    spark.sql("DELETE FROM gsm.t WHERE k IN (10, 11, 12)")
    spark.sql("DELETE FROM gsm.t WHERE grp = 'g3'")
    assert(store.currentRelPaths("t") === filesBefore,
      "no data file may be rewritten by a MoR delete")
    assert(store.pendingDeletes("t") === 3)
    val expect = (0L until 100L)
      .filterNot(k => k == 5 || Seq(10L, 11L, 12L).contains(k) || k % 4 == 3)
    assert(spark.sql("SELECT k FROM gsm.t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === expect)
    // composite conjunction: k = 20 AND grp = 'g0' — one composite tuple
    spark.sql("DELETE FROM gsm.t WHERE k = 20 AND grp = 'g0'")
    assert(store.pendingDeletes("t") === 4)
    assert(spark.sql("SELECT count(*) FROM gsm.t").head().getLong(0) ===
      expect.size - 1L)
    // fold via CALL; content identical, sidecars gone
    spark.sql("CALL gsm.system.materialize_deletes('t')")
    assert(store.pendingDeletes("t") === 0)
    assert(spark.sql("SELECT count(*) FROM gsm.t").head().getLong(0) ===
      expect.size - 1L)
  }

  test("non-key-shaped DELETE stays merge-on-read via a POSITION sidecar") {
    spark.sql("""CREATE TABLE gsm.c (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")
    spark.range(0, 50).select(col("id").as("k"), col("id").cast("double").as("v"))
      .createOrReplaceTempView("gsm_src2")
    spark.sql("INSERT INTO gsm.c SELECT * FROM gsm_src2")
    val files = store.currentRelPaths("c").size
    spark.sql("DELETE FROM gsm.c WHERE k >= 40") // range: positional MoR
    assert(store.pendingDeletes("c") === 1, "range delete must MoR via positions")
    assert(store.currentRelPaths("c").size === files, "no data file rewritten")
    assert(spark.sql("SELECT count(*) FROM gsm.c").head().getLong(0) === 40L)
    // null-matching predicates keep rows (SQL DELETE semantics) — the
    // positional path evaluates the predicate exactly, and a no-match
    // delete commits NOTHING (no empty sidecar)
    spark.sql("DELETE FROM gsm.c WHERE v IS NULL")
    assert(store.pendingDeletes("c") === 1, "no-match delete must not commit")
    assert(spark.sql("SELECT count(*) FROM gsm.c").head().getLong(0) === 40L)
    // materialize folds the positional mask into the files
    spark.sql("CALL gsm.system.materialize_deletes('c')")
    assert(store.pendingDeletes("c") === 0)
    assert(spark.sql("SELECT count(*) FROM gsm.c").head().getLong(0) === 40L)
    // without the property, a range delete is copy-on-write as before
    spark.sql("CREATE TABLE gsm.c2 (k BIGINT)")
    spark.sql("INSERT INTO gsm.c2 VALUES (1), (2), (3)")
    spark.sql("DELETE FROM gsm.c2 WHERE k >= 2")
    assert(store.pendingDeletes("c2") === 0, "default mode stays CoW")
    assert(spark.sql("SELECT count(*) FROM gsm.c2").head().getLong(0) === 1L)
  }

  test("mode toggles via ALTER TABLE SET/UNSET TBLPROPERTIES") {
    spark.sql("CREATE TABLE gsm.m (k BIGINT)")
    spark.sql("INSERT INTO gsm.m VALUES (1), (2), (3)")
    spark.sql("DELETE FROM gsm.m WHERE k = 1") // default: CoW
    assert(store.pendingDeletes("m") === 0)
    spark.sql(
      "ALTER TABLE gsm.m SET TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    val props = spark.sql("SHOW TBLPROPERTIES gsm.m").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("write.delete.mode") === Some("merge-on-read"))
    spark.sql("DELETE FROM gsm.m WHERE k = 2")
    assert(store.pendingDeletes("m") === 1)
    assert(spark.sql("SELECT k FROM gsm.m ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(3L))
    spark.sql("ALTER TABLE gsm.m UNSET TBLPROPERTIES ('write.delete.mode')")
    spark.sql("DELETE FROM gsm.m WHERE k = 3")
    // back to CoW: the pending delete materialized first, then CoW ran
    assert(store.pendingDeletes("m") === 0)
    assert(spark.sql("SELECT count(*) FROM gsm.m").head().getLong(0) === 0L)
  }

  test("layout properties refuse post-create changes") {
    spark.sql("CREATE TABLE gsm.z (k BIGINT) TBLPROPERTIES ('zone_cols'='k')")
    intercept[Exception] {
      spark.sql("ALTER TABLE gsm.z SET TBLPROPERTIES ('zone_cols'='v')")
    }
  }

  test("equalityKeys decomposition") {
    import org.apache.spark.sql.sources._
    assert(GraftSqlTable.equalityKeys(Array(EqualTo("a", 1L))) ===
      Some((Seq("a"), Seq(Seq(1L)))))
    assert(GraftSqlTable.equalityKeys(
      Array(EqualTo("a", 1L), In("b", Array("x", "y")))) ===
      Some((Seq("a", "b"), Seq(Seq(1L, "x"), Seq(1L, "y")))))
    assert(GraftSqlTable.equalityKeys(Array(GreaterThan("a", 1L))) === None)
    assert(GraftSqlTable.equalityKeys(Array(EqualTo("a", null))) === None)
    assert(GraftSqlTable.equalityKeys(
      Array(In("a", Array(1L, null)))) === None)
    assert(GraftSqlTable.equalityKeys(
      Array(In("a", Array(1L)), In("b", Array(2L)))) === None,
      "two IN lists refuse (no cross-product explosion)")
    assert(GraftSqlTable.equalityKeys(Array.empty[Filter]) === None)
  }
}
