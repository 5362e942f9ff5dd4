package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** `rollback_to_version` (Iceberg rollback_to_snapshot as a FORWARD
  * commit — monotonic versions, restored pending-delete state, rolled-
  * away snapshots still time-travelable) and `analyze` (rebuild the
  * table-level NDV union from the live files' immutable sketches,
  * restoring exactness after CoW deletes and backfilling legacy
  * snapshots). */
class RollbackAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): TableStore = new TableStore(spark, tmpDir("rba-"))

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("v", StringType, nullable = true)))

  private def batch(lo: Long, hi: Long) =
    spark.range(lo, hi).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v")).coalesce(1)

  test("rollback restores file set and content as a forward commit") {
    val st = newStore()
    st.create("t", sch, zoneCols = Seq("k"))
    st.append("t", batch(0, 100))
    val v1 = st.currentVersion("t")
    val filesV1 = st.currentRelPaths("t")
    st.append("t", batch(100, 200))
    st.delete("t", col("k") < 50) // CoW rewrite
    val vBad = st.currentVersion("t")
    st.rollback("t", v1)
    val vNew = st.currentVersion("t")
    assert(vNew > vBad, "rollback must be a forward commit")
    assert(st.commitParent("t", vNew) === Some(vBad), "history stays linear")
    assert(st.currentRelPaths("t").sorted === filesV1.sorted)
    assert(st.read("t").count() === 100L)
    assert(st.read("t").agg(min("k"), max("k")).head() ===
      org.apache.spark.sql.Row(0L, 99L))
    // the rolled-away snapshot is still reachable by time travel
    assert(st.readVersion("t", vBad).count() === 150L)
    // rollback commits append no rows to the incremental feed
    assert(st.readAppendedSince("t", vBad).count() === 0L)
    // metadata aggregates still answer from the restored snapshot
    assert(st.rowCount("t") === Some(100L))
  }

  test("rollback restores the pending MoR delete state of the target") {
    val st = newStore()
    st.create("t", sch, zoneCols = Seq("k"))
    st.append("t", batch(0, 100))
    st.deleteMoR("t", Seq(1L, 2L, 3L).toDF("k"), Seq("k"))
    val vMasked = st.currentVersion("t")
    assert(st.pendingDeletes("t") === 1)
    st.materializeDeletes("t")
    st.append("t", batch(100, 120))
    assert(st.pendingDeletes("t") === 0)
    // roll back to the masked snapshot: the tombstones come back
    st.rollback("t", vMasked)
    assert(st.pendingDeletes("t") === 1)
    assert(st.read("t").count() === 97L)
    assert(st.read("t").filter(col("k").isin(1L, 2L, 3L)).count() === 0L)
    // and folding them afterwards still works
    st.materializeDeletes("t")
    assert(st.read("t").count() === 97L)
  }

  test("rollback refuses non-ancestors and expired snapshots; head is a no-op") {
    val st = newStore()
    st.create("t", sch)
    st.append("t", batch(0, 10))
    val v1 = st.currentVersion("t")
    st.createBranch("t", "b", v1)
    st.append("t", batch(10, 20), branch = Some("b"))
    val bHead = st.refVersion("t", "b")
    st.append("t", batch(20, 30))
    intercept[IllegalArgumentException](st.rollback("t", bHead))
    val head = st.currentVersion("t")
    st.rollback("t", head) // no-op, no new commit
    assert(st.currentVersion("t") === head)
    st.append("t", batch(30, 40))
    st.expireSnapshots("t", keepLast = 1)
    intercept[IllegalArgumentException](st.rollback("t", v1))
  }

  test("analyze restores NDV exactness after a CoW delete") {
    val st = newStore()
    st.create("t", sch, zoneCols = Seq("k"))
    st.append("t", batch(0, 1000))
    st.delete("t", col("k") >= 500) // CoW: union keeps dead contributions
    val before = st.columnStatsFor("t")("k").ndv.get
    assert(before > 900, s"pre-analyze ndv should over-count, got $before")
    val est = st.analyzeTable("t")
    assert(est.contains("k"))
    assert(math.abs(est("k") - 500L) <= 20, s"est=${est("k")}")
    val after = st.columnStatsFor("t")("k").ndv.get
    assert(after === est("k"))
    // appends after analyze keep unioning on the corrected base
    st.append("t", batch(500, 600))
    val grown = st.columnStatsFor("t")("k").ndv.get
    assert(math.abs(grown - 600L) <= 25, s"grown=$grown")
  }

  test("analyze backfills per-file sketches on a legacy table") {
    val st = newStore()
    st.create("t", sch, zoneCols = Seq("k"))
    st.append("t", batch(0, 200))
    // simulate a pre-NDV snapshot: strip __hll from every sidecar and
    // ndv from the manifest
    val v = st.currentVersion("t")
    val dir = java.nio.file.Paths.get(st.root, "t")
    java.nio.file.Files.list(dir).forEach { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".stats.json") || n.startsWith("stats-")) {
        val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val cut = raw.indexOf(", \"__hll\"")
        val cut2 = raw.indexOf(", \"ndv\"")
        val stripped =
          if (cut >= 0) raw.substring(0, cut) + "}"
          else if (cut2 >= 0) raw.substring(0, cut2) + "}"
          else raw
        if (stripped != raw) {
          java.nio.file.Files.write(p, stripped.getBytes("UTF-8"))
          java.nio.file.Files.deleteIfExists(
            p.getParent.resolve("." + n + ".crc"))
        }
      }
    }
    assert(st.columnStatsFor("t")("k").ndv.isEmpty)
    val est = st.analyzeTable("t")
    assert(math.abs(est("k") - 200L) <= 10, s"est=$est")
    assert(st.columnStatsFor("t")("k").ndv === Some(est("k")))
  }

  test("SQL CALL surface: rollback_to_version and analyze") {
    val root = tmpDir("rbasql-")
    spark.conf.set("spark.sql.catalog.grba", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grba.root", root)
    spark.sql("""CREATE TABLE grba.t (k BIGINT, v STRING)
      TBLPROPERTIES ('zone_cols'='k')""")
    val st = new TableStore(spark, root)
    st.append("t", batch(0, 100))
    val v1 = st.currentVersion("t")
    spark.sql("DELETE FROM grba.t WHERE k < 90")
    val r = spark.sql(
      s"CALL grba.system.rollback_to_version('t', $v1)").head()
    assert(r.getLong(0) === v1.toLong)
    assert(spark.sql("SELECT count(*) AS n FROM grba.t").head().getLong(0) === 100L)
    val a = spark.sql("CALL grba.system.analyze('t')").head()
    assert(a.getString(0).startsWith("k="), a.getString(0))
    spark.sql("DROP TABLE grba.t")
  }
}
