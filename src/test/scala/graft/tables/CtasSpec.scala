package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Atomic CTAS / RTAS through the SQL catalog ([[StagingTableCatalog]]):
  * the definition and the data publish in ONE step — a failed query
  * leaves no table (CREATE) or the ORIGINAL table intact (REPLACE),
  * never a half-state. */
class CtasSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("ctas-")
  spark.conf.set("spark.sql.catalog.gct", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gct.root", root)
  private def store = new TableStore(spark, root)

  Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    .createOrReplaceTempView("src_ctas")

  test("CTAS lands schema and rows in one publish") {
    spark.sql("CREATE TABLE gct.c1 AS SELECT k, upper(v) AS v FROM src_ctas")
    val rows = spark.sql("SELECT k, v FROM gct.c1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "A"), (2L, "B"), (3L, "C")))
    // nothing staged left behind, and the listing shows only real tables
    assert(store.tables() === Seq("c1"))
  }

  test("CTAS with partitioning and layout properties") {
    spark.sql("""CREATE TABLE gct.c2 PARTITIONED BY (v)
      TBLPROPERTIES ('zone_cols'='k')
      AS SELECT k, v FROM src_ctas""")
    assert(store.partitionCols("c2") === Seq("v"))
    assert(store.zoneCols("c2") === Seq("k"))
    assert(spark.sql("SELECT count(*) AS n FROM gct.c2")
      .collect()(0).getLong(0) === 3L)
  }

  test("failed CTAS leaves NO table and no staged debris") {
    val bad = udf((k: Long) =>
      if (k > 1L) sys.error("boom") else k)
    spark.udf.register("ctas_boom", bad)
    intercept[Exception] {
      spark.sql("CREATE TABLE gct.cfail AS SELECT ctas_boom(k) AS k FROM src_ctas")
    }
    assert(!store.exists("cfail"))
    assert(!store.tables().exists(_.startsWith("cfail")))
  }

  test("RTAS swaps data and schema atomically; old table survives failure") {
    spark.sql("CREATE TABLE gct.r1 AS SELECT k, v FROM src_ctas")
    spark.sql("REPLACE TABLE gct.r1 AS SELECT v, k * 10 AS k10 FROM src_ctas")
    val rows = spark.sql("SELECT v, k10 FROM gct.r1 ORDER BY k10")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("a", 10L), ("b", 20L), ("c", 30L)))
    // a failing replacement query must leave the CURRENT table untouched
    intercept[Exception] {
      spark.sql("REPLACE TABLE gct.r1 AS SELECT ctas_boom(k10) AS x FROM gct.r1")
    }
    assert(spark.sql("SELECT count(*) AS n FROM gct.r1")
      .collect()(0).getLong(0) === 3L)
    assert(spark.table("gct.r1").columns.toSeq === Seq("v", "k10"))
  }

  test("REPLACE of a missing table refuses; CREATE OR REPLACE creates") {
    intercept[Exception] {
      spark.sql("REPLACE TABLE gct.nope AS SELECT k FROM src_ctas")
    }
    assert(!store.exists("nope"))
    spark.sql("CREATE OR REPLACE TABLE gct.cor AS SELECT k FROM src_ctas")
    assert(spark.sql("SELECT count(*) AS n FROM gct.cor")
      .collect()(0).getLong(0) === 3L)
    spark.sql("CREATE OR REPLACE TABLE gct.cor AS SELECT k FROM src_ctas WHERE k = 1")
    assert(spark.sql("SELECT count(*) AS n FROM gct.cor")
      .collect()(0).getLong(0) === 1L)
  }

  test("staged names are rejected as user table names") {
    intercept[Exception] {
      spark.sql("CREATE TABLE gct.`evil__stage__x` (k BIGINT)")
    }
  }
}
