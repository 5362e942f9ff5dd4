package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Nested-column schema evolution: ADD / RENAME / DROP inside structs,
  * all metadata-only (no data file touched), plus zone stats on dotted
  * paths. The physical file schema keeps every leaf's creation name;
  * the logical schema evolves freely above it. */
class NestedEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): TableStore = new TableStore(spark, tmpDir("nest-"))

  private def payloadDf(lo: Long, hi: Long) =
    spark.range(lo, hi).select(col("id").as("k"),
      struct(concat(lit("s"), col("id") % 3).as("status"),
        (col("id") * 1.5).as("price")).as("payload"))

  test("nested ADD backfills null for old files and old producers") {
    val st = newStore()
    st.create("t", payloadDf(0, 1).schema)
    st.append("t", payloadDf(0, 10))
    st.addNestedField("t", Seq("payload", "disc"), DoubleType)
    // old files read back with the new subfield as null
    val r1 = st.read("t").select("k", "payload.disc").collect()
    assert(r1.forall(_.isNullAt(1)))
    // a pre-evolution producer (no disc) still appends
    st.append("t", payloadDf(10, 15))
    // an upgraded producer writes it
    st.append("t", spark.range(15, 20).select(col("id").as("k"),
      struct(lit("sX").as("status"), (col("id") * 1.5).as("price"),
        lit(9.9).as("disc")).as("payload")))
    val all = st.read("t").select(col("k"), col("payload.disc").as("d"))
      .orderBy("k").collect()
    assert(all.length === 20)
    assert(all.take(15).forall(_.isNullAt(1)))
    assert(all.drop(15).forall(_.getDouble(1) === 9.9))
    // a frame missing a NON-added nested field still fails loudly
    val bad = spark.range(0, 1).select(col("id").as("k"),
      struct(lit("s").as("status")).as("payload"))
    val e = intercept[Exception] { st.append("t", bad) }
    assert(e.getMessage.contains("payload.price"))
  }

  test("nested RENAME is metadata-only; old and new snapshots read back") {
    val st = newStore()
    st.create("t", payloadDf(0, 1).schema)
    st.append("t", payloadDf(0, 10))
    val v1 = st.currentVersion("t")
    val filesBefore = st.currentRelPaths("t")
    st.renameNestedField("t", Seq("payload", "status"), "state")
    assert(st.currentRelPaths("t") === filesBefore, "no file rewritten")
    assert(st.schema("t")("payload").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("state", "price"))
    val r = st.read("t").select(col("k"), col("payload.state").as("s"))
      .orderBy("k").collect()
    assert(r.map(_.getString(1)).take(3).toSeq === Seq("s0", "s1", "s2"))
    // writes under the NEW logical name land in the OLD physical name —
    // a fresh store instance (fresh caches) reads both generations
    st.append("t", payloadDf(10, 12)
      .select(col("k"), struct(col("payload.status").as("state"),
        col("payload.price").as("price")).as("payload")))
    val st2 = new TableStore(spark, st.root)
    assert(st2.read("t").count() === 12)
    // time travel predates the rename: still served under the LIVE name
    assert(st2.readVersion("t", v1).select("payload.state").count() === 10)
  }

  test("nested DROP hides bytes; re-add of the same name starts null") {
    val st = newStore()
    st.create("t", payloadDf(0, 1).schema)
    st.append("t", payloadDf(0, 5))
    st.dropNestedField("t", Seq("payload", "price"))
    assert(st.schema("t")("payload").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("status"))
    assert(st.read("t").select("payload.*").columns.toSeq === Seq("status"))
    // re-add the SAME name: must NOT resurrect the dropped bytes
    st.addNestedField("t", Seq("payload", "price"), DoubleType)
    val r = st.read("t").select(col("payload.price")).collect()
    assert(r.forall(_.isNullAt(0)), "dropped data must stay dead")
    // cannot drop the last field of a struct
    st.dropNestedField("t", Seq("payload", "price"))
    intercept[Exception] { st.dropNestedField("t", Seq("payload", "status")) }
  }

  test("rename + add + drop compose; CoW mutations preserve the mapping") {
    val st = newStore()
    st.create("t", payloadDf(0, 1).schema)
    st.append("t", payloadDf(0, 20).repartition(2))
    st.renameNestedField("t", Seq("payload", "status"), "state")
    st.addNestedField("t", Seq("payload", "disc"), DoubleType)
    // CoW delete rewrites SOME files post-evolution
    st.delete("t", col("k") < 5L)
    assert(st.read("t").count() === 15)
    val got = st.read("t")
      .select(col("k"), col("payload.state").as("s"), col("payload.disc"))
      .orderBy("k").collect()
    assert(got.map(_.getLong(0)).toSeq === (5L until 20L))
    assert(got.forall(r => r.getString(1).startsWith("s") && r.isNullAt(2)))
    // upsert through the rewritten layout
    st.upsert("t", spark.range(5, 6).select(col("id").as("k"),
      struct(lit("NEW").as("state"), lit(0.0).as("price"),
        lit(1.25).as("disc")).as("payload")), Seq("k"))
    val row = st.read("t").filter(col("k") === 5L)
      .select(col("payload.state"), col("payload.disc")).head()
    assert(row.getString(0) === "NEW" && row.getDouble(1) === 1.25)
  }

  test("SQL nested ALTERs through the catalog") {
    val root = tmpDir("nest-sql-")
    spark.conf.set("spark.sql.catalog.gne", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gne.root", root)
    spark.sql("""CREATE TABLE gne.t (k BIGINT,
      payload STRUCT<status: STRING, price: DOUBLE>)""")
    spark.sql("INSERT INTO gne.t VALUES (1, named_struct('status','a','price',1.0))")
    spark.sql("ALTER TABLE gne.t ADD COLUMNS (payload.disc DOUBLE)")
    spark.sql("ALTER TABLE gne.t RENAME COLUMN payload.status TO state")
    spark.sql("INSERT INTO gne.t VALUES (2, named_struct('state','b','price',2.0,'disc',0.5))")
    val r = spark.sql("""SELECT k, payload.state, payload.price, payload.disc
      FROM gne.t ORDER BY k""").collect()
    assert(r.map(_.getString(1)).toSeq === Seq("a", "b"))
    assert(r(0).isNullAt(3) && r(1).getDouble(3) === 0.5)
    spark.sql("ALTER TABLE gne.t DROP COLUMN payload.price")
    assert(spark.sql("SELECT payload.* FROM gne.t").columns.toSeq ===
      Seq("state", "disc"))
    spark.sql("DROP TABLE gne.t")
  }

  test("zone stats on dotted nested paths prune files") {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val st = newStore()
    val df = payloadDf(0, 1)
    st.create("t", df.schema, zoneCols = Seq("payload.price"))
    (0 until 4).foreach { b =>
      st.append("t", payloadDf(b * 100L, b * 100L + 100L).coalesce(1))
    }
    val q = st.read("t").filter(col("payload.price") >= 150.0 &&
      col("payload.price") <= 200.0)
    val n = q.count()
    assert(n === (100L to 133L).count(k => k * 1.5 >= 150.0 && k * 1.5 <= 200.0))
    val idx = q.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[HadoopFsRelation]
          .location.asInstanceOf[ZoneMapFileIndex]
    }.head
    assert(idx.lastScanCounts === Some((4, 1)),
      s"nested zone pruning: ${idx.lastScanCounts}")
  }
}
