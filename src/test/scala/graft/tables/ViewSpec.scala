package graft.tables

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Persistent SQL views (`CALL cat.system.create_view`): stored SQL
  * re-resolved per read, always-current semantics, namespace placement,
  * view-on-view, cycle detection, name-collision refusal. */
class ViewSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("viewcat-")
  spark.conf.set("spark.sql.catalog.gvw", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gvw.root", root)
  private def store = new TableStore(spark, root)

  test("create_view + SELECT: the view re-resolves against current data") {
    spark.sql("CREATE TABLE gvw.base (k BIGINT, v STRING)")
    store.append("base", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    spark.sql("CALL gvw.system.create_view('evens', " +
      "'SELECT k, v FROM gvw.base WHERE k % 2 = 0')")
    assert(spark.sql("SELECT k FROM gvw.evens").collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
    // always-current: a later append shows through without recreating
    store.append("base", Seq((4L, "d")).toDF("k", "v"))
    assert(spark.sql("SELECT k FROM gvw.evens ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(2L, 4L))
    // view-on-view
    spark.sql("CALL gvw.system.create_view('evens_big', " +
      "'SELECT k FROM gvw.evens WHERE k > 2')")
    assert(spark.sql("SELECT k FROM gvw.evens_big").collect()
      .map(_.getLong(0)).toSeq === Seq(4L))
    // SHOW TABLES lists views beside tables
    val names = spark.sql("SHOW TABLES IN gvw").collect()
      .map(_.getString(1)).toSet
    assert(names.contains("base") && names.contains("evens"))
  }

  test("replace, drop, collisions, writes refused") {
    spark.sql("CREATE TABLE gvw.t2 (k BIGINT)")
    store.append("t2", Seq(7L).toDF("k"))
    spark.sql("CALL gvw.system.create_view('v2', 'SELECT k FROM gvw.t2')")
    // plain re-create refuses; replace => 'true' swaps the SQL
    intercept[Exception](store.createView("v2", "SELECT 1"))
    spark.sql("CALL gvw.system.create_view('v2', " +
      "'SELECT k + 1 AS k FROM gvw.t2', replace => 'true')")
    assert(spark.sql("SELECT k FROM gvw.v2").head().getLong(0) === 8L)
    // a view may not shadow a table, nor a table a view
    intercept[Exception](store.createView("t2", "SELECT 1"))
    intercept[Exception](
      spark.sql("CREATE TABLE gvw.v2 (k BIGINT)"))
    // writes into a view fail (read-only capability)
    intercept[Exception](
      spark.sql("INSERT INTO gvw.v2 VALUES (9)"))
    // drop removes resolution
    spark.sql("CALL gvw.system.drop_view('v2')")
    intercept[Exception](spark.sql("SELECT * FROM gvw.v2").collect())
  }

  test("views live in namespaces; cycles fail loudly") {
    spark.sql("CREATE NAMESPACE gvw.rpt")
    spark.sql("CREATE TABLE gvw.rpt.facts (k BIGINT)")
    store.append("rpt.facts", Seq(5L).toDF("k"))
    spark.sql("CALL gvw.system.create_view('rpt.summary', " +
      "'SELECT count(*) AS n FROM gvw.rpt.facts')")
    assert(spark.sql("SELECT n FROM gvw.rpt.summary").head().getLong(0) === 1L)
    assert(spark.sql("SHOW TABLES IN gvw.rpt").collect()
      .map(_.getString(1)).toSet === Set("facts", "summary"))
    // self-cycle: a view selecting from itself must error, not overflow
    store.createView("loop", "SELECT * FROM gvw.loop")
    val e = intercept[Exception](spark.sql("SELECT * FROM gvw.loop").collect())
    def cycleMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("view cycle")) ||
        cycleMsg(t.getCause))
    assert(cycleMsg(e), s"expected a view-cycle error, got: $e")
    // mutual cycle
    store.createView("a1", "SELECT * FROM gvw.b1")
    store.createView("b1", "SELECT * FROM gvw.a1")
    val e2 = intercept[Exception](spark.sql("SELECT * FROM gvw.a1").collect())
    assert(cycleMsg(e2), s"expected a view-cycle error, got: $e2")
  }
}
