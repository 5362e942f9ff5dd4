package graft.tables

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** End-to-end SQL over the GraftCatalog: DDL, DML, pushdown, time
  * travel — everything through `spark.sql`, nothing through the
  * programmatic API except verification probes. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("sqlcat-")
  spark.conf.set("spark.sql.catalog.gql", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gql.root", root)
  private def store = new TableStore(spark, root)

  test("CREATE / INSERT / SELECT round-trip with properties") {
    spark.sql("""CREATE TABLE gql.t1 (k BIGINT, v STRING, p STRING)
      PARTITIONED BY (p)
      TBLPROPERTIES ('zone_cols'='k', 'bloom_cols'='v')""")
    assert(store.exists("t1"))
    assert(store.partitionCols("t1") === Seq("p"))
    assert(store.zoneCols("t1") === Seq("k"))
    assert(store.bloomCols("t1") === Seq("v"))
    spark.sql("INSERT INTO gql.t1 VALUES (1, 'a', 'x'), (2, 'b', 'y')")
    spark.sql("INSERT INTO gql.t1 VALUES (3, 'c', 'x')")
    val rows = spark.sql("SELECT k, v, p FROM gql.t1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x")))
    // two INSERTs = two snapshots on top of the create commit
    assert(store.currentVersion("t1") === 3)
  }

  test("SELECT pushes filters and projection into the inner scan") {
    spark.sql("""CREATE TABLE gql.t2 (k BIGINT, v STRING)
      TBLPROPERTIES ('zone_cols'='k')""")
    store.append("t2", spark.range(0, 1000).select(
      col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(4, col("id")))
    val df = spark.sql("SELECT v FROM gql.t2 WHERE k BETWEEN 10 AND 12")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("v10", "v11", "v12"))
    // the pushed filters surface on the V2 scan node
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("RowDataSourceScan"),
      s"expected a pushdown scan node in:\n$plan")
    // count(*) survives an empty required schema
    assert(spark.sql("SELECT count(*) FROM gql.t2").head().getLong(0) === 1000L)
  }

  test("DELETE FROM routes to copy-on-write delete; complex predicates refuse") {
    spark.sql("CREATE TABLE gql.t3 (k BIGINT, v STRING)")
    store.append("t3", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    spark.sql("DELETE FROM gql.t3 WHERE k = 2")
    assert(spark.sql("SELECT k FROM gql.t3 ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // NULL-predicate rows are kept (SQL DELETE semantics through the bridge)
    store.append("t3", Seq((null.asInstanceOf[java.lang.Long], "n"))
      .toDF("k", "v"))
    spark.sql("DELETE FROM gql.t3 WHERE k = 1")
    assert(spark.sql("SELECT v FROM gql.t3 ORDER BY v").collect()
      .map(_.getString(0)).toSeq === Seq("c", "n"))
  }

  test("INSERT OVERWRITE replaces the table in one commit; TRUNCATE empties it") {
    spark.sql("CREATE TABLE gql.t4 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gql.t4 VALUES (1, 'a'), (2, 'b')")
    val vBefore = store.currentVersion("t4")
    spark.sql("INSERT OVERWRITE gql.t4 VALUES (9, 'z')")
    assert(store.currentVersion("t4") === vBefore + 1) // ONE commit
    assert(spark.sql("SELECT k, v FROM gql.t4").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((9L, "z")))
    spark.sql("TRUNCATE TABLE gql.t4")
    assert(spark.sql("SELECT * FROM gql.t4").count() === 0)
    // history survives truncation
    assert(store.readVersion("t4", vBefore + 1).count() === 1)
  }

  test("VERSION AS OF time travel; writes to a pinned snapshot refuse") {
    spark.sql("CREATE TABLE gql.t5 (k BIGINT)")
    spark.sql("INSERT INTO gql.t5 VALUES (1)")
    val v1 = store.currentVersion("t5")
    spark.sql("INSERT INTO gql.t5 VALUES (2)")
    assert(spark.sql(s"SELECT k FROM gql.t5 VERSION AS OF $v1").collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
    assert(spark.sql("SELECT k FROM gql.t5 ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L))
    intercept[Exception] {
      spark.sql(s"INSERT INTO gql.t5 VERSION AS OF $v1 VALUES (3)")
    }
  }

  test("ALTER TABLE add/rename/drop column are metadata-only") {
    spark.sql("CREATE TABLE gql.t6 (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gql.t6 VALUES (1, 'a')")
    spark.sql("ALTER TABLE gql.t6 ADD COLUMNS (w DOUBLE)")
    spark.sql("INSERT INTO gql.t6 VALUES (2, 'b', 1.5)")
    spark.sql("ALTER TABLE gql.t6 RENAME COLUMN v TO label")
    val rows = spark.sql("SELECT k, label, w FROM gql.t6 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(rows.toSeq === Seq((1L, "a", None), (2L, "b", Some(1.5))))
    spark.sql("ALTER TABLE gql.t6 DROP COLUMN w")
    assert(spark.sql("SELECT * FROM gql.t6").schema.fieldNames.toSeq ===
      Seq("k", "label"))
  }

  test("SHOW TABLES lists live tables; DROP TABLE removes") {
    spark.sql("CREATE TABLE gql.t7 (k BIGINT)")
    val listed = spark.sql("SHOW TABLES IN gql").collect()
      .map(_.getString(1)).toSet
    assert(listed.contains("t7"))
    spark.sql("DROP TABLE gql.t7")
    assert(!store.exists("t7"))
  }

  test("SQL joins and aggregates compose over catalog tables") {
    spark.sql("CREATE TABLE gql.dim (id BIGINT, name STRING)")
    spark.sql("CREATE TABLE gql.fact (id BIGINT, amt DOUBLE)")
    spark.sql("INSERT INTO gql.dim VALUES (1, 'one'), (2, 'two')")
    spark.sql(
      "INSERT INTO gql.fact VALUES (1, 10.0), (1, 5.0), (2, 2.0), (3, 9.0)")
    val agg = spark.sql("""
      SELECT d.name, sum(f.amt) AS total
      FROM gql.fact f JOIN gql.dim d ON f.id = d.id
      GROUP BY d.name ORDER BY d.name""").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(agg.toSeq === Seq(("one", 15.0), ("two", 2.0)))
  }

  test("scan reports metadata statistics; small dim auto-broadcasts") {
    spark.sql("CREATE TABLE gql.sdim (id BIGINT, name STRING)")
    spark.sql("CREATE TABLE gql.sfact (id BIGINT, amt DOUBLE)")
    store.append("sdim", spark.range(0, 100).select(
      col("id"), concat(lit("n"), col("id")).as("name")))
    store.append("sfact", spark.range(0, 10000).select(
      (col("id") % 100).as("id"), col("id").cast("double").as("amt")))
    // logical stats come from the snapshot metadata, not defaultSizeInBytes
    val scan = spark.sql("SELECT * FROM gql.sdim")
    val stats = scan.queryExecution.optimizedPlan.stats
    val expected = store.scanSizeBytes("sdim")
    assert(expected > 0L)
    assert(stats.sizeInBytes.toLong === expected,
      s"expected recorded size $expected, got ${stats.sizeInBytes}")
    assert(stats.rowCount.map(_.toLong).contains(100L))
    // ...and those stats drive the join strategy: with the DEFAULT 10 MB
    // threshold the KB-sized dim broadcasts. Without reported stats the
    // V2 relation sizes at Long.MaxValue and this plans a sort-merge join.
    val joined = spark.sql("""
      SELECT f.id, f.amt, d.name
      FROM gql.sfact f JOIN gql.sdim d ON f.id = d.id""")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the dim side to auto-broadcast from metadata stats:\n$plan")
    assert(joined.count() === 10000L)
  }

  test("SQL whole-table aggregates answer from metadata, zero data reads") {
    spark.sql("""CREATE TABLE gql.agg (k BIGINT, v STRING)
      TBLPROPERTIES ('zone_cols'='k')""")
    store.append("agg", spark.range(5, 505).select(
      col("id").as("k"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(4, col("id")))
    // the metadata-only proof: corrupt EVERY data file — if any path
    // below still scans, it throws
    val dataDir = new java.io.File(s"$root/agg/data")
    dataDir.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.write(f.toPath,
        "not parquet".getBytes))
    val row = spark.sql(
      "SELECT count(*) AS c, min(k) AS lo, max(k) AS hi FROM gql.agg").head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) === ((500L, 5L, 504L)))
    // decline cases keep the scan (and hence now throw on the corrupt
    // files): a filter, a null-sensitive count(col), a non-zone column
    for (q <- Seq(
        "SELECT count(*) FROM gql.agg WHERE k > 10",
        "SELECT count(v) FROM gql.agg",
        "SELECT min(v) FROM gql.agg",
        "SELECT k, count(*) FROM gql.agg GROUP BY k"))
      intercept[Exception] { spark.sql(q).collect() }
  }

  test("metadata tables: t.snapshots / t.files / t.refs answer via SQL") {
    spark.sql("""CREATE TABLE gql.meta (k BIGINT, v STRING)
      TBLPROPERTIES ('zone_cols'='k')""")
    store.append("meta", spark.range(0, 100).select(
      col("id").as("k"), lit("x").as("v")))
    store.append("meta", spark.range(100, 150).select(
      col("id").as("k"), lit("y").as("v")))
    store.delete("meta", col("k") < 10)
    store.createTag("meta", "v3", 3)

    // CREATE TABLE commits the empty snapshot 1, then append/append/delete
    val snaps = spark.sql("""SELECT version, operation, total_files,
        added_files, removed_files, total_rows
      FROM gql.meta.snapshots ORDER BY version""").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(5)))
    assert(snaps.map(_._1).toSeq === Seq(1, 2, 3, 4))
    assert(snaps.map(_._2).toSeq ===
      Seq("create", "append", "append", "rewrite"))
    assert(snaps.map(_._3).toSeq === Seq(0L, 100L, 150L, 140L))

    // files: per-file recorded lengths and counts sum to the table
    val files = spark.sql(
      "SELECT sum(rows) AS r, count(*) AS n FROM gql.meta.files").head()
    assert(files.getLong(0) === 140L)
    assert(files.getLong(1).toInt === store.currentRelPaths("meta").size)

    // refs: implicit main head plus the tag
    val refs = spark.sql("SELECT name, type, version FROM gql.meta.refs ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(refs.toSeq === Seq(("main", "branch", 4), ("v3", "tag", 3)))

    // a real table named like a metadata suffix still resolves normally
    spark.sql("CREATE TABLE gql.files (a BIGINT)")
    spark.sql("INSERT INTO gql.files VALUES (1)")
    assert(spark.sql("SELECT count(*) AS c FROM gql.files").head().getLong(0) === 1L)

    // partitions: an UNPARTITIONED table reports one '' row whose totals
    // answer from the consolidated manifest alone
    val parts = spark.sql(
      """SELECT partition, file_count, row_count, total_bytes
        |FROM gql.meta.partitions""".stripMargin).collect()
    assert(parts.length === 1)
    assert(parts.head.getString(0) === "")
    assert(parts.head.getLong(1).toInt === store.currentRelPaths("meta").size)
    assert(parts.head.getLong(2) === 140L)
    assert(parts.head.getLong(3) > 0L)
  }

  test("ALTER COLUMN TYPE widens int->bigint metadata-only; old files read back") {
    spark.sql("""CREATE TABLE gql.wide (i INT, f FLOAT, z BIGINT)
      TBLPROPERTIES ('zone_cols'='z')""")
    spark.sql("INSERT INTO gql.wide VALUES (1, CAST(1.5 AS FLOAT), 10)")
    spark.sql("ALTER TABLE gql.wide ALTER COLUMN i TYPE BIGINT")
    spark.sql("ALTER TABLE gql.wide ALTER COLUMN f TYPE DOUBLE")
    // widened schema is visible, old int32/float pages read back widened
    val sch = spark.table("gql.wide").schema
    assert(sch("i").dataType === LongType)
    assert(sch("f").dataType === DoubleType)
    val r0 = spark.sql("SELECT i, f FROM gql.wide").head()
    assert((r0.getLong(0), r0.getDouble(1)) === ((1L, 1.5)))
    // post-widening inserts write the new type; both generations coexist
    spark.sql("INSERT INTO gql.wide VALUES (3000000000, 2.5, 20)")
    val rows = spark.sql("SELECT i FROM gql.wide ORDER BY i").collect()
      .map(_.getLong(0))
    assert(rows.toSeq === Seq(1L, 3000000000L))
    // narrowing and non-widening changes refuse
    intercept[Exception] {
      spark.sql("ALTER TABLE gql.wide ALTER COLUMN z TYPE INT")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gql.wide ALTER COLUMN i TYPE STRING")
    }
  }

  test("TIMESTAMP AS OF and named-ref VERSION AS OF resolve snapshots") {
    spark.sql("CREATE TABLE gql.tt (k BIGINT)")
    store.append("tt", spark.range(0, 10).select(col("id").as("k")))
    Thread.sleep(1100) // separate commit mtimes (filesystem clock)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(1100)
    store.append("tt", spark.range(10, 30).select(col("id").as("k")))
    store.createTag("tt", "first_load", 2)

    // timestamp between the appends sees only the first batch
    val asOf = spark.sql(
      s"SELECT count(*) AS c FROM gql.tt TIMESTAMP AS OF " +
        s"CAST(${betweenMs / 1000}.0 AS TIMESTAMP)").head().getLong(0)
    assert(asOf === 10L)
    // a timestamp after both sees everything; before everything errors
    assert(spark.sql("SELECT count(*) AS c FROM gql.tt TIMESTAMP AS OF " +
      "CURRENT_TIMESTAMP()").head().getLong(0) === 30L)
    intercept[Exception] {
      spark.sql("SELECT * FROM gql.tt TIMESTAMP AS OF " +
        "CAST('2000-01-01' AS TIMESTAMP)").collect()
    }
    // VERSION AS OF accepts a named tag, Iceberg-style
    assert(spark.sql("SELECT count(*) AS c FROM gql.tt VERSION AS OF 'first_load'")
      .head().getLong(0) === 10L)
  }

  test("SQL can SELECT the _row_id metadata column on lineage tables") {
    spark.sql("CREATE TABLE gql.lin (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('row-lineage'='true')")
    spark.sql("INSERT INTO gql.lin VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val rows = spark.sql("SELECT k, _row_id FROM gql.lin ORDER BY _row_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._2).toSeq === Seq(0L, 1L, 2L))
    // stable through a CoW DELETE issued over SQL
    val before = rows.toMap
    spark.sql("DELETE FROM gql.lin WHERE k = 2")
    val after = spark.sql("SELECT k, _row_id FROM gql.lin")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after.keySet === Set(1L, 3L))
    after.foreach { case (k, id) => assert(id === before(k)) }
    // non-lineage tables do not advertise the column
    intercept[Exception] {
      spark.sql("SELECT _row_id FROM gql.t1").collect()
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the target with source columns") {
    spark.sql("CREATE TABLE gql.mse (k BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gql.mse VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    Seq((2L, 200.0, "two"), (9L, 900.0, "nine"))
      .toDF("k", "v", "tag").createOrReplaceTempView("mse_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gql.mse t
      USING mse_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(store.schema("mse").fieldNames.toSeq === Seq("k", "v", "tag"))
    val rows = spark.sql("SELECT k, v, tag FROM gql.mse ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)).getOrElse("-")))
    // untouched rows null-backfill the new column; matched rows carry it
    assert(rows.toSeq === Seq((1L, 10.0, "-"), (2L, 200.0, "two"),
      (3L, 30.0, "-"), (9L, 900.0, "nine")))
    // without the clause, an extra source column still fails loudly
    Seq((1L, 1.0, 7)).toDF("k", "v", "extra2")
      .createOrReplaceTempView("mse_src2")
    intercept[Exception] {
      spark.sql("""MERGE INTO gql.mse t USING mse_src2 s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *""")
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION under merge-on-read (delta path)") {
    spark.sql("""CREATE TABLE gql.msed (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('write.merge.mode'='merge-on-read')""")
    spark.sql("INSERT INTO gql.msed VALUES (1, 10.0), (2, 20.0)")
    val files = store.currentRelPaths("msed").toSet
    Seq((2L, 200.0, "two"), (9L, 900.0, "nine"))
      .toDF("k", "v", "tag").createOrReplaceTempView("msed_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO gql.msed t
      USING msed_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    // still merge-on-read: original data files survive, sidecar pending
    assert(files.subsetOf(store.currentRelPaths("msed").toSet))
    assert(store.pendingDeletes("msed") > 0)
    val rows = spark.sql("SELECT k, v, tag FROM gql.msed ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.getString(2)).getOrElse("-")))
    assert(rows.toSeq === Seq((1L, 10.0, "-"), (2L, 200.0, "two"),
      (9L, 900.0, "nine")))
  }
}
