package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DSv2 `LIMIT` / `ORDER BY … LIMIT` (TopN) partial pushdown: the scan
  * serves a provably-sufficient FILE SUBSET chosen from recorded per-file
  * row counts (LIMIT) or zone bounds + the per-file null ledger (TopN),
  * and Spark's own Limit on top makes the result exact. At 100 TB this is
  * the difference between scheduling a handful of splits and scheduling
  * the whole table for a `LIMIT 10`. */
class LimitPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): TableStore = new TableStore(spark, tmpDir("limit-"))

  /** Four files with known counts and disjoint ascending k-ranges:
    * f0 k∈[0,99] (100 rows), f1 k∈[100,149] (50), f2 k∈[150,159] (10),
    * f3 k∈[160,164] (5). */
  private def fourFiles(st: TableStore, zone: Boolean = true): Unit = {
    val sch = spark.range(0).select(col("id").as("k"), col("id").as("v")).schema
    st.create("t", sch, zoneCols = if (zone) Seq("k") else Nil)
    Seq((0L, 100L), (100L, 150L), (150L, 160L), (160L, 165L)).foreach {
      case (lo, hi) => st.append("t",
        spark.range(lo, hi).select(col("id").as("k"), col("id").as("v"))
          .coalesce(1))
    }
  }

  test("limitRels picks a minimal fullest-first subset") {
    val st = newStore(); fourFiles(st)
    assert(st.limitRels("t", 60).get.size === 1)   // 100-row file suffices
    assert(TableStore.lastLimitPrune === Some((4, 1)))
    assert(st.limitRels("t", 120).get.size === 2)  // 100 + 50
    assert(st.limitRels("t", 160).get.size === 3)  // 100 + 50 + 10
    assert(st.limitRels("t", 9999).get.size === 4) // table smaller than n
    assert(st.limitRels("t", 0).get.isEmpty)
    // the subset really holds ≥ n rows
    val rels = st.limitRels("t", 120).get
    assert(st.readRels("t", rels).count() >= 120)
  }

  test("limitRels declines under pending MoR deletes (counts become upper bounds)") {
    val st = newStore(); fourFiles(st)
    st.deletePos("t", col("k") % 7 === 0)
    assert(st.limitRels("t", 10) === None)
    assert(TableStore.lastLimitPrune === None)
  }

  test("topNRels prunes by zone bounds in both directions") {
    val st = newStore(); fourFiles(st)
    // ascending: the k∈[0,99] file alone covers any n ≤ 100
    val asc = st.topNRels("t", "k", asc = true, nullsFirst = false, n = 10).get
    assert(asc.size === 1)
    assert(st.readRels("t", asc).agg(min("k")).head.getLong(0) === 0L)
    // descending: the k∈[160,164] file has only 5 rows, n=10 needs the next
    val d5 = st.topNRels("t", "k", asc = false, nullsFirst = false, n = 5).get
    assert(d5.size === 1)
    val d10 = st.topNRels("t", "k", asc = false, nullsFirst = false, n = 10).get
    assert(d10.size === 2)
    // sanity: the kept subset reproduces the true top-n
    val got = st.readRels("t", d10).orderBy(col("k").desc).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val want = st.read("t").orderBy(col("k").desc).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(got === want)
  }

  test("topNRels is null-aware: nulls-first keeps null contributors") {
    val st = newStore()
    // nullable k: the table really holds null keys
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType, nullable = true)))
    st.create("t", sch, zoneCols = Seq("k"))
    st.append("t", spark.range(0, 100)
      .select(col("id").as("k"), col("id").as("v")).coalesce(1))
    // one file whose k is entirely null (3 rows)
    st.append("t", spark.range(0, 3)
      .select(lit(null).cast("long").as("k"), col("id").as("v")).coalesce(1))
    // nulls first, n=2 ≤ 3 nulls: ONLY the null file is needed
    val nf = st.topNRels("t", "k", asc = true, nullsFirst = true, n = 2).get
    assert(nf.size === 1)
    assert(st.readRels("t", nf).filter(col("k").isNull).count() === 3)
    // nulls first, n=10 > 3 nulls: null file + the low-k file
    val nf10 = st.topNRels("t", "k", asc = true, nullsFirst = true, n = 10).get
    assert(nf10.size === 2)
    // nulls LAST asc, n=10: the all-null file is prunable
    val nl = st.topNRels("t", "k", asc = true, nullsFirst = false, n = 10).get
    assert(nl.size === 1)
    assert(st.readRels("t", nl).filter(col("k").isNull).count() === 0)
  }

  test("topNRels declines on a non-zone column and on pending deletes") {
    val st = newStore(); fourFiles(st)
    assert(st.topNRels("t", "v", asc = true, nullsFirst = false, n = 5) === None)
    st.deletePos("t", col("k") === 3)
    assert(st.topNRels("t", "k", asc = true, nullsFirst = false, n = 5) === None)
  }

  test("topNRels declines for legacy tables without the null ledger") {
    val st = newStore(); fourFiles(st)
    // simulate a pre-ledger snapshot: strip `nulls` from the consolidated
    // manifest the same way a round-6 writer would have left it
    val v = st.currentVersion("t")
    val mf = java.nio.file.Paths.get(st.root, "t", f"manifest-$v%06d.stats.json")
    val raw = new String(java.nio.file.Files.readAllBytes(mf), "UTF-8")
    val i = raw.indexOf("\"nulls\"")
    assert(i >= 0, "expected a nulls ledger in the fresh manifest")
    val stripped = raw.substring(0, i) + "\"nulls\": {}}"
    java.nio.file.Files.write(mf, stripped.getBytes("UTF-8"))
    // the nio write bypasses Hadoop's checksum layer — drop the stale crc
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      st.root, "t", f".manifest-$v%06d.stats.json.crc"))
    assert(st.topNRels("t", "k", asc = true, nullsFirst = false, n = 5) === None)
    // LIMIT needs only row counts, which legacy snapshots do have
    assert(st.limitRels("t", 10).isDefined)
  }

  test("SQL LIMIT and ORDER BY LIMIT engage the pushdown end-to-end") {
    val root = tmpDir("limsql-")
    spark.conf.set("spark.sql.catalog.glim", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.glim.root", root)
    spark.sql("""CREATE TABLE glim.t (k BIGINT, v BIGINT)
      TBLPROPERTIES ('zone_cols'='k')""")
    val st = new TableStore(spark, root)
    Seq((0L, 100L), (100L, 150L), (150L, 160L), (160L, 165L)).foreach {
      case (lo, hi) => st.append("t",
        spark.range(lo, hi).select(col("id").as("k"), col("id").as("v"))
          .coalesce(1))
    }
    TableStore.lastLimitPrune = None
    assert(spark.sql("SELECT k FROM glim.t LIMIT 7").count() === 7L)
    assert(TableStore.lastLimitPrune === Some((4, 1)))
    TableStore.lastLimitPrune = None
    val top = spark.sql("SELECT k FROM glim.t ORDER BY k DESC LIMIT 8")
      .collect().map(_.getLong(0)).toSeq
    assert(top === (157L to 164L).reverse)
    assert(TableStore.lastLimitPrune === Some((4, 2)))
    // TopN with a tie-breaker column still pushes on the leading key
    TableStore.lastLimitPrune = None
    val tb = spark.sql("SELECT k, v FROM glim.t ORDER BY k, v LIMIT 3")
      .collect().map(_.getLong(0)).toSeq
    assert(tb === Seq(0L, 1L, 2L))
    assert(TableStore.lastLimitPrune === Some((4, 1)))
    // a WHERE clause (pushed filter) refuses the limit pushdown — the
    // per-file guarantee no longer holds — and the answer stays right
    TableStore.lastLimitPrune = None
    assert(spark.sql("SELECT k FROM glim.t WHERE k >= 150 LIMIT 20").count() === 15L)
    assert(TableStore.lastLimitPrune === None)
    spark.sql("DROP TABLE glim.t")
  }
}
