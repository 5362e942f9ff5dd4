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

  test("compaction carries shred values: full rewrite and bin-pack") {
    val st = newStore()
    st.create("t", StructType(Seq(
      StructField("k", LongType), StructField("payload", StringType))))
    st.addVariantShred("t", "payload", "$.amount", "amount", LongType)
    // many tiny appends — the CDC fragmentation shape
    (0L until 6L).foreach { k =>
      st.append("t", Seq((k, payload(k))).toDF("k", "payload").coalesce(1))
    }
    def amounts = st.read("t").orderBy("k").collect()
      .map(_.getAs[Long]("amount")).toSeq
    assert(amounts === (0L until 6L).map(_ * 10))
    // bin-pack: rewritten files carry the derived values verbatim (the
    // masked read returns them; no re-derivation needed — JSON unchanged)
    val (rw, wr) = st.compactSmallFiles("t", targetBytes = 1L << 20)
    assert(rw === 6 && wr === 1)
    assert(amounts === (0L until 6L).map(_ * 10))
    // full-table compact too
    st.append("t", Seq((6L, payload(6L))).toDF("k", "payload"))
    st.compact("t", numFiles = 1)
    assert(amounts === (0L until 7L).map(_ * 10))
    // and the shred still derives on writes AFTER the rewrites
    st.append("t", Seq((7L, payload(7L))).toDF("k", "payload"))
    assert(amounts === (0L until 8L).map(_ * 10))
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

  test("SQL surface: CALL add_variant_shred; INSERT/UPDATE/MERGE re-derive") {
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
    // SQL UPDATE changing the VARIANT column re-derives in the rewrite
    // writer (even though the statement never mentions the shred) —
    // and a direct SET on the shred itself is OVERRIDDEN by the JSON
    spark.sql("UPDATE gvar.t SET payload = '{\"amount\": 99}' WHERE k = 1")
    assert(spark.sql("SELECT amount FROM gvar.t WHERE k = 1")
      .head().getLong(0) === 99L)
    spark.sql("UPDATE gvar.t SET amount = -1 WHERE k = 1")
    assert(spark.sql("SELECT amount FROM gvar.t WHERE k = 1")
      .head().getLong(0) === 99L, "the JSON is the source of truth")
    // MERGE: both the matched-update and not-matched-insert branches
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW vsrc AS
      SELECT * FROM VALUES (1, '{"amount": 7}'), (2, '{"amount": 8}')
      AS t(k, payload)""")
    spark.sql("""MERGE INTO gvar.t USING vsrc ON gvar.t.k = vsrc.k
      WHEN MATCHED THEN UPDATE SET payload = vsrc.payload
      WHEN NOT MATCHED THEN INSERT (k, payload) VALUES (vsrc.k, vsrc.payload)""")
    val rows = spark.sql("SELECT k, amount FROM gvar.t ORDER BY k")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(rows.toSeq === Seq((1L, 7L), (2L, 8L)))
    // the merge-on-read DELTA path re-derives too
    spark.sql("ALTER TABLE gvar.t SET TBLPROPERTIES " +
      "('write.update.mode'='merge-on-read')")
    spark.sql("UPDATE gvar.t SET payload = '{\"amount\": 70}' WHERE k = 1")
    assert(spark.sql("SELECT amount FROM gvar.t WHERE k = 1")
      .head().getLong(0) === 70L)
    spark.sql("DELETE FROM gvar.t WHERE k = 1")
    assert(spark.sql("SELECT count(*) FROM gvar.t").head().getLong(0) === 1L)
    // rename/drop of shred participants refuses (would sever derivation)
    val st = new TableStore(spark, root)
    intercept[IllegalArgumentException] {
      st.renameColumn("t", "payload", "body")
    }
    intercept[IllegalArgumentException] { st.dropColumn("t", "amount") }
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
