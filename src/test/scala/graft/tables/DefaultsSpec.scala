package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Column DEFAULT values (the Iceberg-v3 initial/write default pair on
  * Spark's CURRENT_DEFAULT/EXISTS_DEFAULT metadata): ADD COLUMN DEFAULT
  * backfills pre-evolution files at READ time (no rewrite), INSERTs
  * resolve omitted columns to the write default, genuine nulls written
  * after the evolution stay null, and SET/DROP DEFAULT moves only the
  * write default. */
class DefaultsSpec extends SparkSpec {
  import spark.implicits._

  // ONE root for the suite: Spark instantiates the catalog once per
  // session, so re-pointing the root conf between tests would strand it
  private val root = tmpDir("dflt-")
  spark.conf.set("spark.sql.catalog.dflt", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.dflt.root", root)
  private val store = new TableStore(spark, root)

  private def freshCatalog(tag: String): (String, TableStore) = (root, store)

  test("ADD COLUMN DEFAULT: old files read the default, new inserts " +
      "resolve it, explicit null survives") {
    freshCatalog("dflt-")
    spark.sql("DROP TABLE IF EXISTS dflt.t")
    spark.sql("CREATE TABLE dflt.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO dflt.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE dflt.t ADD COLUMN score INT DEFAULT 7")
    // pre-evolution files: existence default, NOT null
    assert(spark.sql("SELECT k, score FROM dflt.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 7), (2L, 7)))
    // INSERT omitting the column resolves the write default
    spark.sql("INSERT INTO dflt.t (k, v) VALUES (3, 'c')")
    // INSERT with explicit NULL stays null (post-evolution file HAS the
    // column; the existence default only fills files that lack it)
    spark.sql("INSERT INTO dflt.t VALUES (4, 'd', NULL)")
    // DEFAULT keyword resolves too
    spark.sql("INSERT INTO dflt.t VALUES (5, 'e', DEFAULT)")
    val got = spark.sql("SELECT k, score FROM dflt.t ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1))))
    assert(got.toSeq === Seq(1L -> Some(7), 2L -> Some(7), 3L -> Some(7),
      4L -> None, 5L -> Some(7)))
  }

  test("SET/DROP DEFAULT moves the write default; existence default " +
      "of old files never drifts") {
    freshCatalog("dflt-")
    spark.sql("DROP TABLE IF EXISTS dflt.u")
    spark.sql("CREATE TABLE dflt.u (k BIGINT)")
    spark.sql("INSERT INTO dflt.u VALUES (1)")
    spark.sql("ALTER TABLE dflt.u ADD COLUMN tag STRING DEFAULT 'old'")
    spark.sql("ALTER TABLE dflt.u ALTER COLUMN tag SET DEFAULT 'new'")
    spark.sql("INSERT INTO dflt.u (k) VALUES (2)")
    val got = spark.sql("SELECT k, tag FROM dflt.u ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // row 1 predates the column: reads the ADD-time existence default;
    // row 2 was written under the updated write default
    assert(got === Seq((1L, "old"), (2L, "new")))
    spark.sql("ALTER TABLE dflt.u ALTER COLUMN tag DROP DEFAULT")
    spark.sql("INSERT INTO dflt.u (k) VALUES (3)")
    val after = spark.sql("SELECT k, tag FROM dflt.u ORDER BY k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(after === Seq((1L, Some("old")), (2L, Some("new")), (3L, None)))
  }

  test("programmatic append omitting the column backfills the write " +
      "default; CREATE TABLE with DEFAULT resolves on insert") {
    val (_, st) = freshCatalog("dflt-")
    spark.sql("DROP TABLE IF EXISTS dflt.w")
    spark.sql("CREATE TABLE dflt.w (k BIGINT, v STRING)")
    spark.sql("INSERT INTO dflt.w VALUES (1, 'a')")
    spark.sql("ALTER TABLE dflt.w ADD COLUMN band INT DEFAULT 3")
    st.append("w", Seq((2L, "b")).toDF("k", "v")) // omits band
    val got = spark.sql("SELECT k, band FROM dflt.w ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got === Seq((1L, 3), (2L, 3)))

    spark.sql("DROP TABLE IF EXISTS dflt.c")
    spark.sql("CREATE TABLE dflt.c (k BIGINT, lvl INT DEFAULT 9)")
    spark.sql("INSERT INTO dflt.c (k) VALUES (1)")
    assert(spark.sql("SELECT lvl FROM dflt.c").head().getInt(0) === 9)
  }

  test("defaults survive the table-layer lifecycle: CoW delete, " +
      "compaction, time travel") {
    val (_, st) = freshCatalog("dflt-")
    spark.sql("DROP TABLE IF EXISTS dflt.lc")
    spark.sql("CREATE TABLE dflt.lc (k BIGINT)")
    spark.sql("INSERT INTO dflt.lc SELECT explode(sequence(1, 100))")
    spark.sql("ALTER TABLE dflt.lc ADD COLUMN fl DOUBLE DEFAULT 1.5")
    val v1 = st.currentVersion("lc")
    // CoW delete rewrites old files — rewritten rows MATERIALIZE the
    // default (the rewrite reads it back, then writes real columns)
    spark.sql("DELETE FROM dflt.lc WHERE k % 2 = 0")
    st.compact("lc", numFiles = 1)
    val s = spark.sql("SELECT sum(fl) AS s FROM dflt.lc").head().getDouble(0)
    assert(s === 50 * 1.5)
    // time travel to the pre-delete snapshot still fills the default
    assert(spark.sql(s"SELECT sum(fl) FROM dflt.lc VERSION AS OF $v1")
      .head().getDouble(0) === 100 * 1.5)
  }
}
