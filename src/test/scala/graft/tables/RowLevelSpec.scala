package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SQL `UPDATE` / `MERGE INTO` through `SupportsRowLevelOperations` —
  * group-based copy-on-write, one snapshot per statement, candidate
  * files pruned by the statement condition. */
class RowLevelSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("rowlevel-")
  spark.conf.set("spark.sql.catalog.grl", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.grl.root", root)
  private def store = new TableStore(spark, root)

  test("UPDATE rewrites matching rows in one snapshot") {
    spark.sql("CREATE TABLE grl.u1 (k BIGINT, v STRING, amt DOUBLE)")
    store.append("u1", Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "amt"))
    val v0 = store.currentVersion("u1")
    spark.sql("UPDATE grl.u1 SET amt = amt * 2, v = 'upd' WHERE k >= 2")
    assert(store.currentVersion("u1") === v0 + 1) // ONE commit
    val rows = spark.sql("SELECT k, v, amt FROM grl.u1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq((1L, "a", 10.0), (2L, "upd", 40.0), (3L, "upd", 60.0)))
  }

  test("UPDATE with zone pruning rewrites only files holding matches") {
    spark.sql("""CREATE TABLE grl.u2 (k BIGINT, v STRING)
      TBLPROPERTIES ('zone_cols'='k')""")
    // 4 range-partitioned files over k=0..999
    store.append("u2", spark.range(0, 1000).select(
      col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(4, col("id")))
    val before = store.currentRelPaths("u2").toSet
    assert(before.size === 4)
    spark.sql("UPDATE grl.u2 SET v = 'hit' WHERE k = 17")
    val after = store.currentRelPaths("u2").toSet
    // exactly one file replaced: three carried over untouched
    assert((before intersect after).size === 3,
      s"expected 3 carried files, got ${(before intersect after).size}")
    assert(spark.sql("SELECT v FROM grl.u2 WHERE k = 17").head().getString(0)
      === "hit")
    assert(spark.sql("SELECT count(*) FROM grl.u2 WHERE v = 'hit'")
      .head().getLong(0) === 1L)
    assert(spark.sql("SELECT count(*) FROM grl.u2").head().getLong(0) === 1000L)
  }

  test("UPDATE on a partitioned table keeps hive layout readable") {
    spark.sql("""CREATE TABLE grl.u3 (k BIGINT, v STRING, p STRING)
      PARTITIONED BY (p)""")
    store.append("u3", Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x"),
      (4L, "d", null.asInstanceOf[String])).toDF("k", "v", "p"))
    spark.sql("UPDATE grl.u3 SET v = concat(v, '!') WHERE k IN (1, 4)")
    val rows = spark.sql("SELECT k, v, p FROM grl.u3 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSeq
    assert(rows === Seq((1L, "a!", Some("x")), (2L, "b", Some("y")),
      (3L, "c", Some("x")), (4L, "d!", None)))
    // moved UPDATE: changing the partition column relocates the row
    spark.sql("UPDATE grl.u3 SET p = 'z' WHERE k = 2")
    assert(spark.sql("SELECT p FROM grl.u3 WHERE k = 2").head().getString(0)
      === "z")
    assert(spark.sql("SELECT count(*) FROM grl.u3").head().getLong(0) === 4L)
  }

  test("MERGE INTO: update + insert + delete clauses in one snapshot") {
    spark.sql("CREATE TABLE grl.m1 (k BIGINT, v STRING, amt DOUBLE)")
    store.append("m1", Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "amt"))
    Seq((2L, "B", 200.0), (3L, "C", -1.0), (4L, "D", 400.0))
      .toDF("k", "v", "amt").createOrReplaceTempView("m1_src")
    val v0 = store.currentVersion("m1")
    spark.sql("""MERGE INTO grl.m1 t USING m1_src s ON t.k = s.k
      WHEN MATCHED AND s.amt < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
      WHEN NOT MATCHED THEN INSERT (k, v, amt) VALUES (s.k, s.v, s.amt)""")
    assert(store.currentVersion("m1") === v0 + 1)
    val rows = spark.sql("SELECT k, v, amt FROM grl.m1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq((1L, "a", 10.0), (2L, "B", 200.0), (4L, "D", 400.0)))
  }

  test("MERGE INTO an empty-match target still inserts") {
    spark.sql("CREATE TABLE grl.m2 (k BIGINT, v STRING)")
    store.append("m2", Seq((1L, "a")).toDF("k", "v"))
    Seq((9L, "z")).toDF("k", "v").createOrReplaceTempView("m2_src")
    spark.sql("""MERGE INTO grl.m2 t USING m2_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    val rows = spark.sql("SELECT k, v FROM grl.m2 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "a"), (9L, "z")))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: the sync-style mirror statement") {
    spark.sql("CREATE TABLE grl.m4 (k BIGINT, v STRING, amt DOUBLE)")
    store.append("m4", Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("k", "v", "amt"))
    Seq((2L, "B", 200.0), (5L, "E", 500.0)).toDF("k", "v", "amt")
      .createOrReplaceTempView("m4_src")
    val v0 = store.currentVersion("m4")
    // mirror the source: update matches, insert new, delete stale-but-
    // small, demote the rest — all four clause kinds, ONE snapshot
    spark.sql("""MERGE INTO grl.m4 t USING m4_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND t.amt < 35.0 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""")
    assert(store.currentVersion("m4") === v0 + 1)
    val rows = spark.sql("SELECT k, v, amt FROM grl.m4 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows === Seq((2L, "B", 200.0), (4L, "stale", 40.0),
      (5L, "E", 500.0)))
  }

  test("MERGE NOT MATCHED BY SOURCE alone mirrors a full delete-sync") {
    spark.sql("CREATE TABLE grl.m5 (k BIGINT, v STRING)")
    store.append("m5", (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    (3L to 7L).map(i => (i, "")).toDF("k", "ignore")
      .createOrReplaceTempView("m5_src")
    spark.sql("""MERGE INTO grl.m5 t USING m5_src s ON t.k = s.k
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(spark.sql("SELECT k FROM grl.m5 ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === (3L to 7L))
  }

  test("MERGE prunes candidate files via the runtime _file group filter") {
    spark.sql("""CREATE TABLE grl.m3 (k BIGINT, v STRING)
      TBLPROPERTIES ('zone_cols'='k')""")
    store.append("m3", spark.range(0, 1000).select(
      col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(4, col("id")))
    val before = store.currentRelPaths("m3").toSet
    assert(before.size === 4)
    // source keys land in ONE of the four range files
    Seq((10L, "X"), (11L, "Y")).toDF("k", "v").createOrReplaceTempView("m3_src")
    spark.sql("""MERGE INTO grl.m3 t USING m3_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v""")
    val after = store.currentRelPaths("m3").toSet
    assert((before intersect after).size === 3,
      s"runtime group filter should carry 3 of 4 files, carried " +
        s"${(before intersect after).size}")
    assert(spark.sql("SELECT v FROM grl.m3 WHERE k IN (10, 11) ORDER BY k")
      .collect().map(_.getString(0)).toSeq === Seq("X", "Y"))
    assert(spark.sql("SELECT count(*) FROM grl.m3").head().getLong(0) === 1000L)
  }

  test("SELECT _file metadata column names each row's data file") {
    spark.sql("CREATE TABLE grl.f1 (k BIGINT)")
    store.append("f1", Seq(1L).toDF("k"))
    store.append("f1", Seq(2L).toDF("k"))
    val rows = spark.sql("SELECT k, _file FROM grl.f1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length === 2)
    assert(rows.forall(_._2.endsWith(".parquet")))
    assert(rows(0)._2 !== rows(1)._2, "two appends = two distinct files")
  }

  test("UPDATE matching nothing commits nothing") {
    spark.sql("CREATE TABLE grl.u4 (k BIGINT, v STRING)")
    store.append("u4", Seq((1L, "a")).toDF("k", "v"))
    val v0 = store.currentVersion("u4")
    spark.sql("UPDATE grl.u4 SET v = 'x' WHERE k = 999")
    assert(store.currentVersion("u4") === v0, "no-op UPDATE must not commit")
    assert(spark.sql("SELECT v FROM grl.u4").head().getString(0) === "a")
  }
}
