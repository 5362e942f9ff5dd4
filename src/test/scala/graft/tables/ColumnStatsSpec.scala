package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** CBO column statistics from the metadata layer: table-level NDV (HLL
  * union of per-file sketches), nullCount (null ledger), min/max (zone
  * bound fold) — reported through `Statistics.columnStats()` on both
  * scan paths and consumed by Catalyst as `attributeStats`. The scale
  * story: a filtered dimension's CBO estimate shrinks below the
  * broadcast threshold, trading a fact-table shuffle for a broadcast. */
class ColumnStatsSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): TableStore = new TableStore(spark, tmpDir("colstats-"))

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("s", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  test("columnStatsFor: ndv/nulls/bounds from metadata, unions across appends") {
    val st = newStore()
    st.create("t", sch, zoneCols = Seq("k", "s"))
    st.append("t", spark.range(0, 500).select(col("id").as("k"),
      concat(lit("s"), (col("id") % 100)).as("s"),
      col("id").cast("double").as("v")).coalesce(2))
    val first = st.columnStatsFor("t")
    assert(first.keySet === Set("k", "s"))
    val k1 = first("k")
    assert(k1.nullCount === Some(0L))
    assert(k1.bounds === Some((0L, 499L)))
    // HLL at lgK=12 is near-exact at this cardinality
    assert(k1.ndv.exists(n => math.abs(n - 500L) <= 15), s"ndv=${k1.ndv}")
    assert(first("s").ndv.exists(n => math.abs(n - 100L) <= 5))
    // second append with overlap + nulls: union grows, never resets
    st.append("t", spark.range(400, 900).select(
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).cast("long").as("k"),
      concat(lit("s"), (col("id") % 200)).as("s"),
      col("id").cast("double").as("v")).coalesce(2))
    val second = st.columnStatsFor("t")
    val k2 = second("k")
    assert(k2.nullCount === Some(50L))
    assert(k2.bounds === Some((0L, 899L)))
    // true ndv(k) = 900 non-null distinct minus the 50 nulled = 850
    assert(k2.ndv.exists(n => math.abs(n - 850L) <= 25), s"ndv=${k2.ndv}")
    assert(second("s").ndv.exists(n => math.abs(n - 200L) <= 8))
    // v is not a zone column: no stats claimed for it
    assert(!second.contains("v"))
  }

  test("CoW delete keeps stats (ndv an upper bound); MoR delete suspends them") {
    val st = newStore()
    st.create("t", sch, zoneCols = Seq("k"))
    st.append("t", spark.range(0, 300).select(col("id").as("k"),
      lit("x").as("s"), lit(1.0).as("v")).coalesce(1))
    st.delete("t", col("k") >= 200) // CoW rewrite
    val cs = st.columnStatsFor("t")("k")
    // bounds refreshed by the rewrite's new file stats
    assert(cs.bounds === Some((0L, 199L)))
    // ndv cannot subtract: documented upper bound, never an undercount
    assert(cs.ndv.exists(n => n >= 195 && n <= 310), s"ndv=${cs.ndv}")
    st.deletePos("t", col("k") === 7) // pending MoR mask
    assert(st.columnStatsFor("t").isEmpty)
  }

  test("legacy manifest without ndv still reports nulls and bounds") {
    val st = newStore()
    st.create("t", sch, zoneCols = Seq("k"))
    st.append("t", spark.range(0, 100).select(col("id").as("k"),
      lit("x").as("s"), lit(1.0).as("v")).coalesce(1))
    val v = st.currentVersion("t")
    val mf = java.nio.file.Paths.get(st.root, "t", f"manifest-$v%06d.stats.json")
    val raw = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
    val i = raw.indexOf("\"ndv\"")
    assert(i >= 0)
    java.nio.file.Files.write(mf,
      (raw.substring(0, i) + "\"ndv\": {}}").getBytes("UTF-8"))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      st.root, "t", f".manifest-$v%06d.stats.json.crc"))
    val cs = st.columnStatsFor("t")("k")
    assert(cs.ndv.isEmpty)
    assert(cs.nullCount === Some(0L))
    assert(cs.bounds === Some((0L, 99L)))
  }

  test("SQL path: attributeStats flow through the V1 bridge into the plan") {
    val root = tmpDir("cbosql-")
    spark.conf.set("spark.sql.catalog.gstat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstat.root", root)
    spark.sql("""CREATE TABLE gstat.t (k BIGINT, s STRING, v DOUBLE)
      TBLPROPERTIES ('zone_cols'='k')""")
    val st = new TableStore(spark, root)
    st.append("t", spark.range(0, 1000).select(col("id").as("k"),
      lit("x").as("s"), col("id").cast("double").as("v")).coalesce(2))
    val df = spark.sql("SELECT k, v FROM gstat.t")
    df.collect()
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount === Some(BigInt(1000)))
    val byName = stats.attributeStats.toSeq.map { case (a, cs) => a.name -> cs }.toMap
    assert(byName.contains("k"), s"attributeStats=$byName")
    val kStat = byName("k")
    assert(kStat.distinctCount.exists(n => (n - BigInt(1000)).abs <= 30),
      s"distinctCount=${kStat.distinctCount}")
    assert(kStat.nullCount === Some(BigInt(0)))
    assert(kStat.min === Some(0L) && kStat.max === Some(999L))
    // v is not a zone column — no claim
    assert(!byName.contains("v"))
    spark.sql("DROP TABLE gstat.t")
  }

  test("CBO: a selective filter on a stats-bearing dim wins a broadcast join") {
    // conf-sensitive planning test: suites share one session and run in
    // parallel, so toggle AQE/CBO/threshold on an ISOLATED child session
    // (own SQLConf, shared context) instead of racing the global one
    val spark = this.spark.newSession()
    val root = tmpDir("cbojoin-")
    spark.conf.set("spark.sql.catalog.gcj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcj.root", root)
    spark.sql("""CREATE TABLE gcj.dim (k BIGINT, pad STRING)
      TBLPROPERTIES ('zone_cols'='k')""")
    spark.sql("CREATE TABLE gcj.fact (k BIGINT, m DOUBLE)")
    val st = new TableStore(spark, root)
    // dim pad is INCOMPRESSIBLE (hash chains): recorded file size — the
    // scan's sizeInBytes — stays well over the broadcast threshold
    st.append("dim", spark.range(0, 20000).select(col("id").as("k"),
      concat(sha2(col("id").cast("string"), 256),
        sha2(concat(col("id").cast("string"), lit("x")), 256),
        sha2(concat(col("id").cast("string"), lit("y")), 256)).as("pad"))
      .coalesce(2))
    st.append("fact", spark.range(0, 50000).select((col("id") % 20000).as("k"),
      col("id").cast("double").as("m")).coalesce(2))
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
      .map(k => k -> spark.conf.getOption(k))
    // AQE OFF: its runtime-size broadcast conversion would mask whether
    // the PLANNER's CBO estimate (the thing under test) made the call
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (300 * 1024).toString)
    try {
      // filter keeps k < 400 of 20000 → CBO range-estimates ~2% of the
      // dim (~66 KB) → broadcast; without column stats the 3.3 MB
      // size-only estimate shrugs at the filter and plans a shuffle join
      val sql =
        """SELECT f.k AS k, d.pad AS pad, f.m AS m
          |FROM gcj.fact f JOIN gcj.dim d ON f.k = d.k
          |WHERE d.k < 400""".stripMargin
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val q = spark.sql(sql)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected CBO to pick a broadcast join, got:\n$plan")
      // negative control: same query, CBO off → size-only estimate →
      // shuffle join. Proves the column stats are what won the plan.
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val q0 = spark.sql(sql)
      assert(!q0.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "control failed: broadcast without CBO means the test proves nothing")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    spark.sql("DROP TABLE gcj.dim"); spark.sql("DROP TABLE gcj.fact")
  }
}
