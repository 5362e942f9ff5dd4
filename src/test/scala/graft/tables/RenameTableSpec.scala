package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `RENAME TABLE`: one directory move must preserve history (time
  * travel), named refs (tags and branch heads), incremental reads, and
  * the SQL path must serve it as `ALTER TABLE ... RENAME TO`. */
class RenameTableSpec extends SparkSpec {
  import spark.implicits._

  test("rename preserves history, refs, and time travel") {
    val st = new TableStore(spark, tmpDir("ren-"))
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    st.create("t", df.schema)
    st.append("t", df.filter(col("id") <= 25L))
    val v1 = st.currentVersion("t")
    st.createTag("t", "first")
    st.createBranch("t", "dev")
    st.append("t", df.filter(col("id") > 25L))
    st.append("t", df.filter(col("id") > 40L), branch = Some("dev"))
    val devCount = st.readRef("t", "dev").count()

    st.renameTable("t", "t2")
    assert(!st.exists("t"))
    assert(st.exists("t2"))
    assert(st.read("t2").count() === 50L)
    // time travel across the rename
    assert(st.readVersion("t2", v1).count() === 25L)
    // tags and branch heads survived
    assert(st.refs("t2").keySet === Set("first", "dev"))
    assert(st.readRef("t2", "first").count() === 25L)
    assert(st.readRef("t2", "dev").count() === devCount)
    // writes continue under the new name, branch included
    st.append("t2", Seq((99L, "z")).toDF("id", "v"))
    assert(st.read("t2").count() === 51L)
    st.append("t2", Seq((98L, "y")).toDF("id", "v"), branch = Some("dev"))
    assert(st.readRef("t2", "dev").count() === devCount + 1)
    // incremental read across the rename boundary
    assert(st.readAppendedSince("t2", v1).count() === 26L)
    // old name is reusable
    st.create("t", df.schema)
    assert(st.read("t").count() === 0L)
  }

  test("rename refuses collisions and bad names") {
    val st = new TableStore(spark, tmpDir("ren2-"))
    val df = Seq((1L, "a")).toDF("id", "v")
    st.create("a", df.schema)
    st.create("b", df.schema)
    intercept[IllegalArgumentException] { st.renameTable("a", "b") }
    intercept[IllegalArgumentException] { st.renameTable("missing", "c") }
    intercept[IllegalArgumentException] { st.renameTable("a", "x/y") }
    assert(st.exists("a") && st.exists("b"))
  }

  test("SQL ALTER TABLE RENAME TO through the catalog") {
    val root = tmpDir("ren-sql-")
    spark.conf.set("spark.sql.catalog.grn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grn.root", root)
    spark.sql("CREATE TABLE grn.src (k BIGINT, v STRING)")
    spark.sql("INSERT INTO grn.src VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE grn.src RENAME TO dst")
    assert(spark.sql("SELECT count(*) FROM grn.dst").head().getLong(0) === 2L)
    intercept[Exception] { spark.sql("SELECT * FROM grn.src").collect() }
    spark.sql("INSERT INTO grn.dst VALUES (3, 'c')")
    assert(spark.sql("SELECT count(*) FROM grn.dst").head().getLong(0) === 3L)
    spark.sql("DROP TABLE grn.dst")
  }

  test("row-level candidate scan enforces its shuffle-free invariant") {
    val st = new TableStore(spark, tmpDir("sf-"))
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
    st.create("t", df.schema)
    // multi-file table: a single-file scan is SinglePartition and would
    // satisfy any distribution without a shuffle, hiding the violation
    st.append("t", df.repartition(4))
    // the real scan passes (file read + projection, no exchange)
    GraftCowScan.requireShuffleFree(st.read("t").select("id"), "read")
    // a violating plan fails loudly instead of corrupting the rewrite
    val e = intercept[IllegalStateException] {
      GraftCowScan.requireShuffleFree(st.read("t").repartition(4), "bad")
    }
    assert(e.getMessage.contains("shuffle-free"))
    // requirement-driven exchange (EnsureRequirements, not the planner):
    // tiny files pack into ONE split (satisfying any distribution), so
    // force one split per file to make the aggregation genuinely shuffle
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "512")
      val e2 = intercept[IllegalStateException] {
        GraftCowScan.requireShuffleFree(
          st.read("t").groupBy("v").agg(sum("id")), "agg")
      }
      assert(e2.getMessage.contains("exchange"))
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
