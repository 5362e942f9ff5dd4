package graft.tables

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Variant shredding: typed sub-columns derived from a JSON column at
  * write time ([[TableStore.addVariantShred]]) — exact extraction, the
  * derivation overriding writer-supplied values, zone-based FILE
  * SKIPPING on the shredded path, and the CDC-apply path deriving too. */
class VariantShredSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): TableStore = new TableStore(spark, tmpDir("var-"))

  private def scanned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    df.collect()
    val counts = df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[HadoopFsRelation]
          .location.asInstanceOf[ZoneMapFileIndex]
    }.flatMap(_.lastScanCounts)
    (counts.map(_._1).sum, counts.map(_._2).sum)
  }

  private def payload(k: Long): String =
    s"""{"amount": ${k * 10}, "who": {"name": "u$k"}, "extra": "e$k"}"""

  test("shreds derive at append: typed, exact, JSON is source of truth") {
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("k", LongType), StructField("payload", StringType))))
    st.addVariantShred("t", "payload", "$.amount", "amount", LongType)
    st.addVariantShred("t", "payload", "$.who.name", "who_name", StringType)
    val df = (0L until 10L).map(k => (k, payload(k))).toDF("k", "payload")
    st.append("t", df)
    val back = st.read("t").orderBy("k").collect()
    assert(back.map(_.getAs[Long]("amount")).toSeq ===
      (0L until 10L).map(_ * 10))
    assert(back.map(_.getAs[String]("who_name")).toSeq ===
      (0L until 10L).map(k => s"u$k"))
    // a writer-supplied shred value is OVERRIDDEN by the derivation
    st.append("t", Seq((100L, payload(100L), -1L, "lie"))
      .toDF("k", "payload", "amount", "who_name"))
    val r = st.read("t").filter($"k" === 100L).head()
    assert(r.getAs[Long]("amount") === 1000L)
    assert(r.getAs[String]("who_name") === "u100")
    // a missing path lands NULL (not an error)
    st.append("t", Seq((200L, """{"who": {}}""")).toDF("k", "payload"))
    val r2 = st.read("t").filter($"k" === 200L).head()
    assert(r2.isNullAt(r2.fieldIndex("amount")))
    assert(r2.isNullAt(r2.fieldIndex("who_name")))
  }

  test("filters on a shredded path skip files via zone stats") {
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("k", LongType), StructField("payload", StringType))))
    st.addVariantShred("t", "payload", "$.amount", "amount", LongType)
    // 4 appends with DISJOINT amount ranges → 4 files with tight zones
    (0 until 4).foreach { b =>
      val rows = (0L until 25L).map { i =>
        val k = b * 25L + i
        (k, s"""{"amount": ${b * 1000 + i}}""")
      }
      st.append("t", rows.toDF("k", "payload").coalesce(1))
    }
    val q = st.read("t").filter($"amount" >= 3000L)
    val (total, kept) = scanned(q)
    assert(q.count() === 25L)
    assert(total === 4 && kept === 1,
      s"shred-path filter must zone-prune to one file, kept $kept of $total")
  }

  test("CDC net-apply derives shreds for inserted rows") {
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("k", LongType), StructField("payload", StringType))))
    st.addVariantShred("t", "payload", "$.amount", "amount", LongType)
    st.append("t", Seq((1L, payload(1L)), (2L, payload(2L)))
      .toDF("k", "payload"))
    // net CDC batch: delete k=1, upsert k=2 with a NEW payload, add k=3
    st.applyNet("t",
      keys = Seq(1L, 2L, 3L).toDF("k"),
      newRows = Seq((2L, """{"amount": 999}"""), (3L, payload(3L)))
        .toDF("k", "payload"),
      keyCols = Seq("k"))
    val back = st.read("t").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("amount")))
    assert(back.toSeq === Seq((2L, 999L), (3L, 30L)))
  }

  test("SQL surface: CALL add_variant_shred + INSERT derives; rewrites refuse") {
    val root = tmpDir("varsql-")
    spark.conf.set("spark.sql.catalog.gvar", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvar.root", root)
    spark.sql("CREATE TABLE gvar.t (k BIGINT, payload STRING)")
    val r = spark.sql("CALL gvar.system.add_variant_shred(" +
      "`table` => 't', source_col => 'payload', path => '$.amount', " +
      "as_name => 'amount', shred_type => 'BIGINT')").head()
    assert(r.getString(0) === "amount")
    // INSERT INTO funnels through alignTo → the shred derives
    spark.sql(
      """INSERT INTO gvar.t (k, payload) VALUES (1, '{"amount": 42}')""")
    val row = spark.sql("SELECT k, amount FROM gvar.t").head()
    assert((row.getLong(0), row.getLong(1)) === ((1L, 42L)))
    // row-producing SQL mutations refuse loudly (shreds would not
    // re-derive through the rewrite writers); DELETE stays allowed
    val e = intercept[Exception] {
      spark.sql("UPDATE gvar.t SET payload = '{}' WHERE k = 1")
    }
    assert(e.getMessage.contains("variant-shredded"))
    spark.sql("DELETE FROM gvar.t WHERE k = 1")
    assert(spark.sql("SELECT count(*) FROM gvar.t").head().getLong(0) === 0L)
  }

  test("declaration guards: type, path shape, and pre-data requirement") {
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("k", LongType), StructField("payload", StringType))))
    intercept[IllegalArgumentException] {
      st.addVariantShred("t", "k", "$.x", "x", LongType) // not a string col
    }
    intercept[IllegalArgumentException] {
      st.addVariantShred("t", "payload", "x", "x", LongType) // bad path
    }
    st.append("t", Seq((1L, "{}")).toDF("k", "payload"))
    intercept[IllegalArgumentException] {
      st.addVariantShred("t", "payload", "$.x", "x", LongType) // has data
    }
  }
}
