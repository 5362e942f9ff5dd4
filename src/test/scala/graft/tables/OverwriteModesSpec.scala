package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** INSERT OVERWRITE beyond whole-table: filter overwrite (static
  * PARTITION clause) and DYNAMIC partition overwrite — both one atomic
  * commit replacing exactly the matched scope, with untouched files
  * carried byte-identical. */
class OverwriteModesSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("ovw-")
  spark.conf.set("spark.sql.catalog.ovw", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.ovw.root", root)
  private val store = new TableStore(spark, root)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("dynamic overwrite replaces only the partitions the data touches") {
    spark.sql("CREATE TABLE ovw.ev (ts TIMESTAMP, k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    val d1 = Seq(
      (ts("2024-01-01 08:00:00"), 1L, 1.0),
      (ts("2024-01-01 09:00:00"), 2L, 2.0),
      (ts("2024-01-02 08:00:00"), 3L, 3.0),
      (ts("2024-01-03 08:00:00"), 4L, 4.0)).toDF("ts", "k", "v")
    d1.writeTo("ovw.ev").append()
    val day2Before = store.currentRelPaths("ev").filter(_.contains("ts_day"))
      .filter(_.contains("2024-01-02"))
    val before = store.currentVersion("ev")
    // re-run day 1's pipeline: only the 2024-01-01 partition is replaced
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try Seq((ts("2024-01-01 10:00:00"), 9L, 9.0)).toDF("ts", "k", "v")
      .writeTo("ovw.ev").overwritePartitions()
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(store.currentVersion("ev") === before + 1, "one atomic commit")
    val got = spark.sql("SELECT k FROM ovw.ev ORDER BY k").collect()
      .map(_.getLong(0)).toSeq
    assert(got === Seq(3L, 4L, 9L))
    // untouched partitions kept their exact files
    val day2After = store.currentRelPaths("ev").filter(_.contains("2024-01-02"))
    assert(day2After.sorted === day2Before.sorted)
  }

  test("filter overwrite (static PARTITION semantics) replaces matching " +
      "rows in one commit; new rows feed the change feed as inserts") {
    spark.sql("CREATE TABLE ovw.t (k BIGINT, seg STRING, v DOUBLE)")
    Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("k", "seg", "v").writeTo("ovw.t").append()
    val v0 = store.currentVersion("t")
    store.overwriteWhere("t", col("seg") === "a",
      Seq((10L, "a", 10.0)).toDF("k", "seg", "v"))
    val v1 = store.currentVersion("t")
    assert(v1 === v0 + 1, "one atomic commit")
    assert(spark.sql("SELECT k FROM ovw.t ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(3L, 10L))
    // the change feed reports the replaced rows as deletes, fresh as inserts
    val ch = store.changeFeed("t", v0, v1)
      .select("k", TableStore.ChangeTypeCol).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(ch === Seq((1L, "delete"), (2L, "delete"), (10L, "insert")))
    // incremental readers see ONLY the fresh rows as appended
    assert(store.readAppendedSince("t", v0).collect().map(_.getLong(0)).toSeq
      === Seq(10L))
  }

  test("SQL INSERT OVERWRITE: whole-table static stays, dynamic mode " +
      "scopes to touched partitions") {
    spark.sql("CREATE TABLE ovw.s (ts TIMESTAMP, k BIGINT) " +
      "PARTITIONED BY (days(ts))")
    spark.sql("INSERT INTO ovw.s VALUES " +
      "(TIMESTAMP'2024-02-01 08:00:00', 1), " +
      "(TIMESTAMP'2024-02-02 08:00:00', 2)")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql("INSERT OVERWRITE ovw.s VALUES " +
      "(TIMESTAMP'2024-02-01 09:00:00', 7)")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(spark.sql("SELECT k FROM ovw.s ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(2L, 7L))
    // static (default) mode replaces the whole table
    spark.sql("INSERT OVERWRITE ovw.s VALUES " +
      "(TIMESTAMP'2024-02-03 09:00:00', 5)")
    assert(spark.sql("SELECT k FROM ovw.s").collect()
      .map(_.getLong(0)).toSeq === Seq(5L))
  }

  test("dynamic overwrite refuses unpartitioned and multi-generation " +
      "layouts") {
    spark.sql("CREATE TABLE ovw.u (k BIGINT)")
    Seq(Tuple1(1L)).toDF("k").writeTo("ovw.u").append()
    val e = intercept[IllegalArgumentException](
      store.overwriteDynamic("u", Seq(Tuple1(2L)).toDF("k")))
    assert(e.getMessage.contains("partitioned"))
  }
}
