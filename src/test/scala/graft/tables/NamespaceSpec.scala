package graft.tables

import graft.SparkSpec

/** Multi-level namespaces over the flat store: DDL/DML addressed as
  * `catalog.namespace.table` (the reference's own addressing,
  * DestinationConfig.java:130-132), namespace properties, metadata
  * tables on namespaced tables, rename across namespaces, CASCADE. */
class NamespaceSpec extends SparkSpec {

  private val root = tmpDir("nscat-")
  spark.conf.set("spark.sql.catalog.gns", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gns.root", root)
  private def store = new TableStore(spark, root)

  test("CREATE NAMESPACE + table DDL/DML under it; flat tables coexist") {
    spark.sql("CREATE NAMESPACE gns.sales")
    assert(store.namespaceExists(Seq("sales")))
    spark.sql("CREATE TABLE gns.sales.orders (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gns.sales.orders VALUES (1, 'a'), (2, 'b')")
    // the store name is the dot-mangled path
    assert(store.exists("sales.orders"))
    // a flat table of the same trailing name is a DIFFERENT table
    spark.sql("CREATE TABLE gns.orders (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gns.orders VALUES (9, 'z')")
    assert(spark.sql("SELECT sum(k) FROM gns.sales.orders").head().getLong(0) === 3L)
    assert(spark.sql("SELECT sum(k) FROM gns.orders").head().getLong(0) === 9L)
    // SHOW TABLES scopes to the namespace
    val inNs = spark.sql("SHOW TABLES IN gns.sales")
      .collect().map(_.getString(1)).toSet
    assert(inNs === Set("orders"))
    val flat = spark.sql("SHOW TABLES IN gns").collect().map(_.getString(1)).toSet
    assert(flat.contains("orders") && !flat.contains("sales.orders"))
  }

  test("SHOW NAMESPACES lists explicit and implied; nested levels") {
    spark.sql("CREATE NAMESPACE gns.a.b")
    spark.sql("CREATE TABLE gns.a.b.t (k BIGINT)")
    val top = spark.sql("SHOW NAMESPACES IN gns").collect()
      .map(_.getString(0)).toSet
    assert(top.contains("a") && top.contains("default"))
    val nested = spark.sql("SHOW NAMESPACES IN gns.a").collect()
      .map(_.getString(0)).toSet
    assert(nested === Set("a.b"))
    // implied-only namespace: a dotted table without a marker still
    // makes its prefixes visible
    store.create("imp.x.t2", spark.range(1).schema)
    store.append("imp.x.t2", spark.range(3).toDF("id"))
    assert(store.namespaceExists(Seq("imp")))
    assert(store.namespaceExists(Seq("imp", "x")))
    assert(spark.sql("SELECT count(*) FROM gns.imp.x.t2").head().getLong(0) === 3L)
  }

  test("namespace properties: DBPROPERTIES, ALTER SET/UNSET, DESCRIBE") {
    spark.sql("CREATE NAMESPACE gns.props WITH DBPROPERTIES ('owner.team'='data')")
    // Spark injects reserved props (owner) alongside the user's
    assert(store.namespaceProps(Seq("props"))("owner.team") === "data")
    spark.sql("ALTER NAMESPACE gns.props SET DBPROPERTIES ('tier'='gold')")
    assert(store.namespaceProps(Seq("props"))("tier") === "gold")
    spark.sql("ALTER NAMESPACE gns.props UNSET DBPROPERTIES ('owner.team')")
    assert(!store.namespaceProps(Seq("props")).contains("owner.team"))
    val desc = spark.sql("DESCRIBE NAMESPACE EXTENDED gns.props").collect()
    assert(desc.nonEmpty)
  }

  test("metadata tables and time travel work on namespaced tables") {
    spark.sql("CREATE NAMESPACE gns.meta")
    spark.sql("CREATE TABLE gns.meta.t (k BIGINT)")
    spark.sql("INSERT INTO gns.meta.t VALUES (1)")
    spark.sql("INSERT INTO gns.meta.t VALUES (2)")
    val snaps = spark.sql("SELECT version FROM gns.meta.t.snapshots").count()
    assert(snaps >= 3) // create + two inserts
    assert(spark.sql("SELECT count(*) FROM gns.meta.t VERSION AS OF 2")
      .head().getLong(0) === 1L)
    // a REAL table shadowing a metadata suffix still resolves as a table
    spark.sql("CREATE TABLE gns.meta.snapshots (k BIGINT)")
    spark.sql("INSERT INTO gns.meta.snapshots VALUES (7)")
    assert(spark.sql("SELECT k FROM gns.meta.snapshots").head().getLong(0) === 7L)
  }

  test("RENAME TABLE moves across namespaces with history intact") {
    spark.sql("CREATE NAMESPACE gns.src")
    spark.sql("CREATE NAMESPACE gns.dst")
    spark.sql("CREATE TABLE gns.src.m (k BIGINT)")
    spark.sql("INSERT INTO gns.src.m VALUES (1)")
    spark.sql("INSERT INTO gns.src.m VALUES (2)")
    spark.sql("ALTER TABLE gns.src.m RENAME TO dst.m")
    assert(!store.exists("src.m") && store.exists("dst.m"))
    assert(spark.sql("SELECT count(*) FROM gns.dst.m").head().getLong(0) === 2L)
    assert(spark.sql("SELECT count(*) FROM gns.dst.m VERSION AS OF 2")
      .head().getLong(0) === 1L)
  }

  test("DROP NAMESPACE refuses non-empty without CASCADE; CASCADE drops tables") {
    spark.sql("CREATE NAMESPACE gns.gone")
    spark.sql("CREATE TABLE gns.gone.t1 (k BIGINT)")
    spark.sql("CREATE TABLE gns.gone.t2 (k BIGINT)")
    val e = intercept[Exception](spark.sql("DROP NAMESPACE gns.gone"))
    assert(e.getMessage.toLowerCase.contains("cascade") ||
      e.getMessage.toLowerCase.contains("not empty"))
    spark.sql("DROP NAMESPACE gns.gone CASCADE")
    assert(!store.namespaceExists(Seq("gone")))
    assert(!store.exists("gone.t1") && !store.exists("gone.t2"))
  }

  test("invalid namespace levels refuse loudly") {
    intercept[Exception](store.createNamespace(Seq("a.b"), Map.empty))
    intercept[Exception](store.createNamespace(Seq(""), Map.empty))
    intercept[Exception](store.createNamespace(Seq("_sys"), Map.empty))
    // duplicate create refuses
    spark.sql("CREATE NAMESPACE gns.dup")
    intercept[Exception](store.createNamespace(Seq("dup"), Map.empty))
    // IF NOT EXISTS is quiet
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gns.dup")
  }
}
