package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.TableStore
import Tables.t

/** Table-layout gates: storage-level behavior (clustering, zone pruning)
  * proven through the DuckDB oracle — the scan after a layout rewrite
  * must return exactly the rows a plain SQL filter does. Pruning
  * EFFECTIVENESS is pinned in TableStoreSpec (file counts); the gate
  * pins that skipping never loses or invents rows on real data.
  */
object TableQueries {

  /** Z-order clustered scan: lineitem ingested into a managed table,
    * rewritten with a (l_orderkey, l_partkey) Morton layout, then range-
    * scanned on the SECOND clustered column — the scan is file-pruned by
    * zone maps and must still equal the full-table filter. */
  private def tblZorderScan(spark: SparkSession, dir: String): DataFrame = {
    val store = new TableStore(spark,
      Scratch.dir("tbl-zorder", Scratch.tag(dir)))
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    store.create("lineitem", li.schema, overwrite = true,
      zoneCols = Seq("l_orderkey", "l_partkey"))
    store.append("lineitem", li)
    store.compact("lineitem", numFiles = 8,
      clusterCols = Seq("l_orderkey", "l_partkey"))
    // the synthetic lineitem duplicates (l_orderkey, l_linenumber) — sort
    // by every output column so ties are order-free on both engines
    store.readRange("lineitem", "l_partkey", 100L, 300L)
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
  }

  private val tblZorderScanSql =
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
      |FROM lineitem WHERE l_partkey BETWEEN 100 AND 300
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin

  /** Declarative data skipping: orders ingested range-clustered, then read
    * through the plain `read().filter(...)` path — the [[ZoneMapFileIndex]]
    * prunes files from the pushed filter at plan time (no readRange call),
    * and the surviving files must reproduce the full-table filter exactly. */
  private def tblSkippingScan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val store = new TableStore(spark,
      Scratch.dir("tbl-skip", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("orders", ord.repartitionByRange(8, col("o_orderkey")))
    store.read("orders")
      .filter(col("o_orderkey") >= 1000L && col("o_orderkey") <= 3000L &&
        col("o_orderstatus") === "F")
      .orderBy("o_orderkey")
  }

  private val tblSkippingScanSql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders
      |WHERE o_orderkey BETWEEN 1000 AND 3000 AND o_orderstatus = 'F'
      |ORDER BY o_orderkey""".stripMargin

  /** Time travel under the oracle: orders lands in two commits split by a
    * key predicate; reading the FIRST snapshot back (through the zone-map
    * index, filtered) must equal the plain SQL over the first batch's
    * predicate — proving historical reads return exactly the committed
    * snapshot, not the live table. */
  private def tblTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val store = new TableStore(spark,
      Scratch.dir("tbl-travel", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("orders", ord.filter(col("o_orderkey") <= 1000L)
      .repartitionByRange(2, col("o_orderkey")))
    val v1 = store.currentVersion("orders")
    store.append("orders", ord.filter(col("o_orderkey") > 1000L))
    store.readVersion("orders", v1)
      .filter(col("o_orderkey") >= 200L) // zone-prunes the old snapshot too
      .orderBy("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
  }

  private val tblTimeTravelSql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders WHERE o_orderkey <= 1000 AND o_orderkey >= 200
      |ORDER BY o_orderkey, o_custkey, o_totalprice, o_orderstatus""".stripMargin

  /** Compaction-safe incremental read under the oracle: snapshot, COMPACT
    * (which rewrites every file but appends no rows), then append a second
    * batch — `readAppendedSince(snapshot)` must deliver exactly the second
    * batch, never re-delivering compacted rows. The equivalent failure in
    * a file-diff-based incremental consumer is silent double-processing. */
  private def tblIncremental(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val store = new TableStore(spark,
      Scratch.dir("tbl-incr", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("orders", ord.filter(col("o_orderkey") <= 1000L)
      .repartitionByRange(2, col("o_orderkey")))
    val v1 = store.currentVersion("orders")
    store.compact("orders", numFiles = 2)
    store.append("orders", ord.filter(col("o_orderkey") > 1000L))
    store.readAppendedSince("orders", v1)
      .orderBy("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
  }

  private val tblIncrementalSql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders WHERE o_orderkey > 1000
      |ORDER BY o_orderkey, o_custkey, o_totalprice, o_orderstatus""".stripMargin

  /** Schema evolution under the oracle: the table starts WITHOUT
    * o_totalprice, evolves it in (addColumns) between two appends, then
    * renames o_custkey — all metadata-only. The read must backfill null
    * for pre-evolution rows and serve the rename without touching a data
    * file; the oracle expresses the same history as a CASE over the
    * ingest predicate plus a column alias. */
  private def tblEvolution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val store = new TableStore(spark,
      Scratch.dir("tbl-evolve", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val original = StructType(ord.schema.fields.dropRight(1))
    store.create("orders", original, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("orders", ord.filter(col("o_orderkey") <= 1000L)
      .drop("o_totalprice"))
    store.addColumns("orders",
      StructType(Seq(StructField("o_totalprice", DoubleType))))
    store.append("orders", ord.filter(col("o_orderkey") > 1000L))
    store.renameColumn("orders", "o_custkey", "customer")
    store.read("orders")
      .filter(col("o_orderkey") <= 2000L)
      .orderBy("o_orderkey", "customer", "o_orderstatus", "o_totalprice")
  }

  private val tblEvolutionSql =
    """SELECT o_orderkey, o_custkey AS customer, o_orderstatus,
      |  CASE WHEN o_orderkey > 1000 THEN o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderkey <= 2000
      |ORDER BY o_orderkey, customer, o_orderstatus, o_totalprice""".stripMargin

  /** Bloom-filter point-lookup skipping under the oracle: orders is
    * range-clustered on o_orderkey, so o_custkey values are SCATTERED —
    * zone maps cannot prune an o_custkey equality at all. Per-file bloom
    * sidecars can: the plain `read().filter(custkey IN ...)` path probes
    * each candidate file's bloom at plan time and must still reproduce
    * the full-table filter exactly (false positives only ever KEEP a
    * file). Pruning effectiveness is pinned in TableStoreSpec. */
  private def tblBloomScan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val store = new TableStore(spark,
      Scratch.dir("tbl-bloom", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"), bloomCols = Seq("o_custkey"),
      bloomItems = 20000)
    store.append("orders", ord.repartitionByRange(8, col("o_orderkey")))
    store.read("orders")
      .filter(col("o_custkey").isin(7L, 11L, 13L))
      .orderBy("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
  }

  private val tblBloomScanSql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders WHERE o_custkey IN (7, 11, 13)
      |ORDER BY o_orderkey, o_custkey, o_totalprice, o_orderstatus""".stripMargin

  /** Metadata-only aggregates under the oracle: count(*) and column
    * min/max answered from the snapshot's consolidated per-file stats —
    * no data file scanned (TableStoreSpec proves that by corrupting the
    * data files first). The table mutates (CoW delete) between append
    * and read, so the gate also pins that rewrites keep the recorded
    * counts/bounds exact, not merely monotone. */
  private def tblMetaAgg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val store = new TableStore(spark,
      Scratch.dir("tbl-meta", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey", "o_totalprice"))
    store.append("orders", ord.repartitionByRange(4, col("o_orderkey")))
    store.delete("orders", col("o_orderkey") % 10 === 3)
    // metadata-ONLY path: a fallback (None) is a regression, fail loudly
    val cnt = store.rowCount("orders").getOrElse(
      sys.error("tbl_meta_agg: no metadata row count"))
    val (kLo, kHi) = store.columnRange("orders", "o_orderkey").getOrElse(
      sys.error("tbl_meta_agg: no o_orderkey bounds"))
    val (pLo, pHi) = store.columnRange("orders", "o_totalprice").getOrElse(
      sys.error("tbl_meta_agg: no o_totalprice bounds"))
    import spark.implicits._
    Seq((cnt, kLo.asInstanceOf[Long], kHi.asInstanceOf[Long],
        pLo.asInstanceOf[Double], pHi.asInstanceOf[Double]))
      .toDF("cnt", "min_key", "max_key", "min_price", "max_price")
  }

  private val tblMetaAggSql =
    """SELECT count(*) AS cnt,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      |FROM orders WHERE o_orderkey % 10 <> 3""".stripMargin

  /** Declarative metadata-only aggregates: the plain
    * `read(t).agg(count(*), min(k), max(k))` path —
    * [[graft.tables.MetadataAggregateRule]] rewrites the WHOLE aggregate
    * to the snapshot's recorded row count and zone bounds at
    * OPTIMIZATION time, so no scan is planned (TableStoreSpec pins the
    * plan shape). The table mutates first, proving recorded stats track
    * CoW deletes; the oracle recomputes everything the honest way. */
  private def tblCountPushdown(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, max, min}
    val store = new TableStore(spark,
      Scratch.dir("tbl-count", Scratch.tag(dir)))
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    store.create("lineitem", li.schema, overwrite = true,
      zoneCols = Seq("l_orderkey", "l_quantity"))
    store.append("lineitem", li.repartitionByRange(4, col("l_orderkey")))
    store.delete("lineitem", col("l_quantity") > 40.0)
    store.read("lineitem").agg(count(lit(1)).as("cnt"),
      min(col("l_orderkey")).as("min_key"), max(col("l_orderkey")).as("max_key"),
      min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"))
  }

  // delete KEEPS null-predicate rows (SQL DELETE WHERE semantics) — the
  // oracle must too; the fixture has no null l_quantity, but exactness
  // here keeps the gate honest on corpora that do
  private val tblCountPushdownSql =
    """SELECT count(*) AS cnt,
      |  min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
      |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
      |FROM lineitem
      |WHERE l_quantity <= 40.0 OR l_quantity IS NULL""".stripMargin

  /** Partial-column MERGE under the oracle: matched keys update ONLY
    * o_totalprice (the source's decoy o_orderstatus='X' must NOT land —
    * that is the semantics plain upsert cannot express), unmatched
    * source keys insert whole rows. The oracle rebuilds the same table
    * with a CASE for the update plus a UNION ALL for the inserts. */
  private def tblMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val store = new TableStore(spark,
      Scratch.dir("tbl-merge", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
      bloomItems = 20000)
    store.append("orders", ord.repartitionByRange(8, col("o_orderkey")))
    val updates = ord.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        lit("X").as("o_orderstatus"), // decoy: not an updateCol, must not land
        (col("o_totalprice") * 2).as("o_totalprice"))
    val inserts = ord.filter(col("o_orderkey") % 17 === 0)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        col("o_custkey"), lit("N").as("o_orderstatus"),
        lit(1.0).as("o_totalprice"))
    store.merge("orders", updates.unionByName(inserts),
      Seq("o_orderkey"), updateCols = Seq("o_totalprice"))
    store.read("orders")
      .orderBy("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
  }

  private val tblMergeSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 2
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |UNION ALL
      |SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
      |  'N' AS o_orderstatus, 1.0 AS o_totalprice
      |FROM orders WHERE o_orderkey % 17 = 0
      |ORDER BY o_orderkey, o_custkey, o_orderstatus, o_totalprice""".stripMargin

  /** Key-level snapshot diff under the oracle: the table takes a
    * partial-column merge (update + insert) and a delete between two
    * snapshots; `diffVersions` must classify every key as
    * added/removed/changed exactly — including a key updated and THEN
    * deleted (net: removed) and a key inserted and then deleted inside
    * the window (net: NOTHING — absent from both snapshots). The oracle
    * derives the same classification from the mutation predicates. */
  private def tblDiff(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val store = new TableStore(spark,
      Scratch.dir("tbl-diff", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("orders", ord.repartitionByRange(4, col("o_orderkey")))
    val v1 = store.currentVersion("orders")
    val updates = ord.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice") * 2).as("o_totalprice"))
    val inserts = ord.filter(col("o_orderkey") % 17 === 0)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        col("o_custkey"), lit(1.0).as("o_totalprice"))
    store.merge("orders", updates.unionByName(inserts),
      Seq("o_orderkey"), updateCols = Seq("o_totalprice"))
    store.delete("orders", col("o_orderkey") % 101 === 0)
    val v2 = store.currentVersion("orders")
    store.diffVersions("orders", v1, v2, Seq("o_orderkey"),
        compareCols = Seq("o_totalprice"))
      .orderBy("o_orderkey", "change")
  }

  private val tblDiffSql =
    """SELECT o_orderkey, 'removed' AS change FROM orders
      |WHERE o_orderkey % 101 = 0
      |UNION ALL
      |SELECT o_orderkey, 'changed' AS change FROM orders
      |WHERE o_orderkey % 13 = 0 AND o_orderkey % 101 <> 0
      |UNION ALL
      |SELECT o_orderkey + 10000000 AS o_orderkey, 'added' AS change
      |FROM orders WHERE o_orderkey % 17 = 0
      |  AND (o_orderkey + 10000000) % 101 <> 0
      |ORDER BY o_orderkey, change""".stripMargin

  /** MERGE with a delete clause under the oracle: one source carries
    * updates (%13 → doubled price), tombstones (%19 → DELETE — winning
    * over the update for keys divisible by both, e.g. 247), and inserts
    * (+10M for %17); one atomic merge applies all three. The oracle
    * rebuilds the same outcome from the predicates. Every tombstone key
    * exists in the table here, so all of them MATCH and delete; the
    * unmatched-tombstone-inserts caveat is pinned in TableStoreSpec. */
  private def tblMergeDelete(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val store = new TableStore(spark,
      Scratch.dir("tbl-merge-del", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
      bloomItems = 20000)
    store.append("orders", ord.repartitionByRange(8, col("o_orderkey")))
    // one pass builds a UNIQUE-key source: delete wins over update for
    // overlap keys IN the clause condition (the row carries the updated
    // price too — merge must delete it, not update it)
    val upserts = ord.filter(col("o_orderkey") % 13 === 0 ||
        col("o_orderkey") % 19 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        (col("o_totalprice") * 2).as("o_totalprice"),
        when(col("o_orderkey") % 19 === 0, lit("D"))
          .otherwise(lit("U")).as("__op"))
    val inserts = ord.filter(col("o_orderkey") % 17 === 0)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        col("o_custkey"), lit("N").as("o_orderstatus"),
        lit(1.0).as("o_totalprice"), lit("I").as("__op"))
    store.merge("orders", upserts.unionByName(inserts),
      Seq("o_orderkey"), updateCols = Seq("o_totalprice"),
      deleteWhen = Some(col("__op") === "D"))
    store.read("orders")
      .orderBy("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
  }

  private val tblMergeDeleteSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 2
      |       ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderkey % 19 <> 0
      |UNION ALL
      |SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
      |  'N' AS o_orderstatus, 1.0 AS o_totalprice
      |FROM orders WHERE o_orderkey % 17 = 0
      |ORDER BY o_orderkey, o_custkey, o_orderstatus, o_totalprice""".stripMargin

  /** Concurrent writers under the oracle: two threads append disjoint
    * halves of orders to the same table AT THE SAME TIME (two store
    * handles, real lock contention, optimistic rebase), then a third
    * writer deletes a slice — the surviving table must equal the plain
    * SQL over the union, proving no commit was lost and no row
    * duplicated regardless of which appender won the race. */
  private def tblConcurrent(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val root = Scratch.dir("tbl-concurrent", Scratch.tag(dir))
    val a = new TableStore(spark, root)
    val b = new TableStore(spark, root)
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    a.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val t1 = new Thread(() =>
      try a.append("orders", ord.filter(col("o_orderkey") % 2 === 0)
        .repartitionByRange(2, col("o_orderkey")))
      catch { case e: Throwable => errs.add(e); () })
    val t2 = new Thread(() =>
      try b.append("orders", ord.filter(col("o_orderkey") % 2 =!= 0)
        .repartitionByRange(2, col("o_orderkey")))
      catch { case e: Throwable => errs.add(e); () })
    t1.start(); t2.start(); t1.join(); t2.join()
    if (!errs.isEmpty) throw errs.peek()
    a.delete("orders", col("o_orderkey") % 7 === 0)
    a.read("orders")
      .orderBy("o_orderkey", "o_custkey", "o_totalprice")
  }

  private val tblConcurrentSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey % 7 <> 0
      |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin

  /** Partition evolution under the oracle: orders starts hive-partitioned
    * by o_orderstatus, evolves (metadata-only) to partition by
    * o_orderpriority between two appends, then takes a CoW delete
    * SPANNING both layouts. The filtered read must equal the plain SQL —
    * o_orderstatus is a directory value in generation 0 and a data
    * column in generation 1, and the union must not care. */
  private def tblPartitionEvolution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val store = new TableStore(spark,
      Scratch.dir("tbl-partevo", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        "o_totalprice")
    store.create("orders", ord.schema, overwrite = true,
      partitionBy = Seq("o_orderstatus"), zoneCols = Seq("o_orderkey"))
    store.append("orders", ord.filter(col("o_orderkey") <= 7500L))
    store.repartitionSpec("orders", Seq("o_orderpriority"))
    store.append("orders", ord.filter(col("o_orderkey") > 7500L))
    store.delete("orders", col("o_orderkey") % 11 === 0)
    store.read("orders")
      .filter(col("o_orderstatus") === "F" && col("o_orderkey") >= 500L)
      .orderBy("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
  }

  private val tblPartitionEvolutionSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
      |  o_totalprice
      |FROM orders
      |WHERE o_orderstatus = 'F' AND o_orderkey >= 500
      |  AND o_orderkey % 11 <> 0
      |ORDER BY o_orderkey, o_custkey, o_orderpriority, o_totalprice""".stripMargin

  /** Write-audit-publish under the oracle: the second half of orders is
    * staged on an `audit` branch (two commits), audited by a branch read
    * (count must match the staged predicate — a wrong staging fails the
    * gate HERE, before publish), published via fast-forward, and then
    * mutated on main. The final read must equal the plain SQL over the
    * whole lifecycle; branch isolation (main unchanged until publish)
    * is spec-pinned in RefsSpec. */
  private def tblBranchWap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val store = new TableStore(spark,
      Scratch.dir("tbl-wap", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("orders", ord.filter(col("o_orderkey") <= 7500L)
      .repartitionByRange(2, col("o_orderkey")))
    store.createBranch("orders", "audit")
    store.append("orders",
      ord.filter(col("o_orderkey") > 7500L && col("o_orderkey") <= 15000L),
      branch = Some("audit"))
    store.append("orders", ord.filter(col("o_orderkey") > 15000L),
      branch = Some("audit"))
    // audit step: staged row count must equal the source predicate's
    val staged = store.readRef("orders", "audit").count()
    val expected = ord.count()
    require(staged == expected,
      s"audit failed: $staged staged rows, expected $expected")
    store.fastForward("orders", "audit")
    store.dropRef("orders", "audit")
    store.delete("orders", col("o_orderkey") % 11 === 0)
    store.read("orders")
      .orderBy("o_orderkey", "o_custkey", "o_totalprice")
  }

  private val tblBranchWapSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey % 11 <> 0
      |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin

  /** Merge-on-read equality deletes under the oracle: a metadata-only
    * tombstone commit masks %7 keys, then a LATER append re-inserts the
    * %21 subset at a new price — the sequence-number rule must revive
    * exactly those while the rest of the %7 family stays masked, and the
    * final read happens with the delete STILL PENDING (the masked-read
    * path, not the materialized one — materialization is spec-pinned in
    * MoRDeleteSpec). The oracle rebuilds the same net state. */
  private def tblMorDelete(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val store = new TableStore(spark,
      Scratch.dir("tbl-mor", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"), bloomCols = Seq("o_orderkey"),
      bloomItems = 20000)
    store.append("orders", ord.repartitionByRange(8, col("o_orderkey")))
    store.deleteMoR("orders",
      ord.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"),
      Seq("o_orderkey"))
    store.append("orders", ord.filter(col("o_orderkey") % 21 === 0)
      .withColumn("o_totalprice", lit(1.0)))
    store.read("orders")
      .orderBy("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
  }

  private val tblMorDeleteSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey % 7 <> 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_orderstatus, 1.0 AS o_totalprice
      |FROM orders WHERE o_orderkey % 21 = 0
      |ORDER BY o_orderkey, o_custkey, o_orderstatus, o_totalprice""".stripMargin

  /** The pure-SQL lifecycle through [[graft.tables.GraftCatalog]]: CREATE
    * (with zone-map properties), INSERT INTO from a view, DELETE FROM a
    * key range, then a filtered aggregate SELECT — every statement via
    * `spark.sql` against the registered catalog, no programmatic store
    * call. This is the surface the reference's users actually drive
    * (Spark SQL over an Iceberg catalog, SparkUtils.java:40-50); the
    * oracle recomputes the same lifecycle's net effect in DuckDB. */
  private def tblSqlCatalog(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gsql",
      classOf[graft.tables.GraftCatalog].getName)
    // one FIXED root: the catalog instance is cached by name per session,
    // so per-dir isolation comes from the table name, not the root
    spark.conf.set("spark.sql.catalog.gsql.root", Scratch.dir("tbl-sqlcat"))
    // Scratch.tag keeps dots (path-safe, not identifier-safe) — strip them
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val src = s"gsql_src_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gsql.$tbl")
    spark.sql(s"""CREATE TABLE gsql.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT,
      o_orderstatus STRING, o_totalprice DOUBLE)
      TBLPROPERTIES ('zone_cols'='o_orderkey')""")
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO gsql.$tbl SELECT * FROM $src")
    spark.sql(
      s"DELETE FROM gsql.$tbl WHERE o_orderkey >= 4000 AND o_orderkey < 5000")
    // zone maps prune the range filter's files at plan time; decimal-exact
    // money sum for cross-engine determinism (Dets rationale)
    spark.sql(s"""SELECT o_orderstatus, count(*) AS cnt,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM gsql.$tbl WHERE o_orderkey <= 20000
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  private val tblSqlCatalogSql =
    """SELECT o_orderstatus, count(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |WHERE NOT (o_orderkey >= 4000 AND o_orderkey < 5000)
      |  AND o_orderkey <= 20000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** SQL whole-table count/min/max answered from snapshot metadata via
    * DSv2 complete aggregate pushdown (`SupportsPushDownAggregates` on
    * [[graft.tables.GraftScanBuilder]]) — the SQL face of tbl_meta_agg:
    * the aggregate lives above the V1 scan bridge where
    * MetadataAggregateRule cannot see it, so the scan builder itself
    * answers from `rowCount`/`columnRange` and the plan reads ONE
    * in-memory row, zero data files (GraftCatalogSpec proves that by
    * corrupting the files). A CoW delete between append and read pins
    * that rewrites keep the recorded stats exact. */
  private def tblSqlAgg(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gsqla",
      classOf[graft.tables.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsqla.root", Scratch.dir("tbl-sqlagg"))
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val src = s"gsqla_src_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gsqla.$tbl")
    spark.sql(s"""CREATE TABLE gsqla.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
      TBLPROPERTIES ('zone_cols'='o_orderkey,o_totalprice')""")
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO gsqla.$tbl SELECT * FROM $src")
    spark.sql(s"DELETE FROM gsqla.$tbl WHERE o_orderkey % 10 = 3")
    spark.sql(s"""SELECT count(*) AS cnt,
        min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      FROM gsqla.$tbl""")
  }

  private val tblSqlAggSql =
    """SELECT count(*) AS cnt,
      |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
      |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
      |FROM orders WHERE o_orderkey % 10 <> 3""".stripMargin

  /** SQL inspection metadata tables under the oracle
    * (`cat.t.snapshots`, Iceberg's metadata-table surface served by
    * [[graft.tables.GraftMetaTable]]): the snapshot history of a
    * create → append → CoW-delete lifecycle, with per-snapshot exact
    * row totals from the consolidated stats — everything derived from
    * manifests, zero data files read. The oracle reconstructs the same
    * history from the source table, so version numbering, operation
    * classification, AND the recorded row totals are all pinned. */
  private def tblMetaTables(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gsqlm",
      classOf[graft.tables.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsqlm.root", Scratch.dir("tbl-sqlmeta"))
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val src = s"gsqlm_src_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gsqlm.$tbl")
    spark.sql(s"""CREATE TABLE gsqlm.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
      TBLPROPERTIES ('zone_cols'='o_orderkey')""")
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO gsqlm.$tbl SELECT * FROM $src")
    spark.sql(s"DELETE FROM gsqlm.$tbl WHERE o_orderkey % 10 = 3")
    spark.sql(s"""SELECT version, operation, total_rows
      FROM gsqlm.$tbl.snapshots ORDER BY version""")
  }

  private val tblMetaTablesSql =
    """SELECT * FROM (
      |  SELECT 1 AS version, 'create' AS operation, 0 AS total_rows
      |  UNION ALL
      |  SELECT 2, 'append', count(*) FROM orders
      |  UNION ALL
      |  SELECT 3, 'rewrite',
      |    (SELECT count(*) FROM orders WHERE o_orderkey % 10 <> 3))
      |ORDER BY version""".stripMargin

  /** SQL `CALL` maintenance lifecycle under the oracle
    * ([[graft.tables.GraftProcedures]], the Iceberg stored-procedure
    * model): four separate append snapshots → `CALL compact` (rewrite
    * into 2 zone-clustered files) → `CALL expire_snapshots` (drop
    * history, delete unreferenced pre-compaction files) → `CALL
    * create_tag` — and the table content must be byte-identical to the
    * source through all three, proven by a range aggregate the oracle
    * reproduces. The CALL results themselves (file counts before/after,
    * retained version) feed the output row, pinning that compaction
    * actually reduced files and expiry kept exactly the head. */
  private def tblCall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.catalog.gsqlc",
      classOf[graft.tables.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsqlc.root", Scratch.dir("tbl-sqlcall"))
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gsqlc.$tbl")
    spark.sql(s"""CREATE TABLE gsqlc.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
      TBLPROPERTIES ('zone_cols'='o_orderkey')""")
    val store = new graft.tables.TableStore(spark, Scratch.dir("tbl-sqlcall"))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    // four appends = four small-file snapshots, the compaction motive
    (0 until 4).foreach(i =>
      store.append(tbl, ord.filter(col("o_orderkey") % 4 === i)))
    val c = spark.sql(s"CALL gsqlc.system.compact(`table` => '$tbl', " +
      "num_files => 2)").head()
    // files_before is corpus-dependent (input partitioning per append) —
    // the oracle-stable invariants are the TARGET file count and that
    // compaction actually reduced the file count
    val filesBefore = c.getLong(0); val filesAfter = c.getLong(1)
    spark.sql(s"CALL gsqlc.system.expire_snapshots('$tbl', 1)")
    spark.sql(s"CALL gsqlc.system.create_tag('$tbl', 'post_compact')")
    val tagged = spark.sql(
      s"SELECT version FROM gsqlc.$tbl.refs WHERE name = 'post_compact'")
      .head().getInt(0).toLong
    val headV = store.currentVersion(tbl).toLong
    import spark.implicits._
    spark.sql(s"""SELECT count(*) AS cnt,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM gsqlc.$tbl WHERE o_orderkey BETWEEN 100 AND 2000""")
      .crossJoin(Seq((filesAfter, filesBefore > filesAfter, tagged == headV))
        .toDF("files_after", "compacted", "tag_at_head"))
  }

  private val tblCallSql =
    """SELECT count(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  2 AS files_after, TRUE AS compacted, TRUE AS tag_at_head
      |FROM orders WHERE o_orderkey BETWEEN 100 AND 2000""".stripMargin

  /** SQL `UPDATE` through `SupportsRowLevelOperations` (RowLevelOps):
    * group-based copy-on-write, the statement condition pruning
    * candidate files through the zone index, one atomic snapshot.
    * Additive price bump (not a multiply) keeps the decimal cast in the
    * check aggregate away from rounding-mode boundaries across engines. */
  private def tblSqlUpdate(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gsqlu",
      classOf[graft.tables.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsqlu.root", Scratch.dir("tbl-sqlupd"))
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val src = s"gsqlu_src_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gsqlu.$tbl")
    spark.sql(s"""CREATE TABLE gsqlu.$tbl (
      o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
      TBLPROPERTIES ('zone_cols'='o_orderkey')""")
    t(spark, dir, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO gsqlu.$tbl SELECT * FROM $src")
    spark.sql(s"""UPDATE gsqlu.$tbl
      SET o_totalprice = o_totalprice + 10, o_orderstatus = 'U'
      WHERE o_orderkey BETWEEN 1000 AND 3000""")
    spark.sql(s"""SELECT o_orderstatus, count(*) AS cnt,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM gsqlu.$tbl GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  private val tblSqlUpdateSql =
    """SELECT CASE WHEN o_orderkey BETWEEN 1000 AND 3000 THEN 'U'
      |            ELSE o_orderstatus END AS o_orderstatus,
      |  count(*) AS cnt,
      |  CAST(SUM(CAST(CASE WHEN o_orderkey BETWEEN 1000 AND 3000
      |                     THEN o_totalprice + 10 ELSE o_totalprice END
      |       AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** SQL `MERGE INTO` with all three clauses (delete / update / insert)
    * in ONE atomic snapshot — the statement the reference's users get
    * from Iceberg's extensions (`SparkUtils.java:45`) and the README's
    * delete-then-insert workaround exists to approximate. Candidate
    * files come from the runtime `_file` group filter (the ON condition
    * joined with the source — nothing statically pushable). */
  private def tblSqlMerge(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gsqlm",
      classOf[graft.tables.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsqlm.root", Scratch.dir("tbl-sqlmrg"))
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"customer_$ident"
    val cust = s"gsqlm_cust_$ident"
    val ords = s"gsqlm_ord_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gsqlm.$tbl")
    spark.sql(s"""CREATE TABLE gsqlm.$tbl (
      c_custkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING)
      TBLPROPERTIES ('zone_cols'='c_custkey')""")
    t(spark, dir, "customer")
      .select("c_custkey", "c_acctbal", "c_mktsegment")
      .createOrReplaceTempView(cust)
    t(spark, dir, "orders").createOrReplaceTempView(ords)
    spark.sql(s"INSERT INTO gsqlm.$tbl SELECT * FROM $cust")
    // per-customer spend, plus the same rows key-shifted past the key
    // domain = guaranteed NOT MATCHED inserts
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gsqlm_src_$ident AS
      WITH spend AS (
        SELECT o_custkey AS key,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
        FROM $ords GROUP BY o_custkey)
      SELECT key, spent FROM spend
      UNION ALL
      SELECT key + 1 + (SELECT GREATEST(MAX(c_custkey), MAX(key2.key2m)) FROM $cust,
                    (SELECT MAX(o_custkey) AS key2m FROM $ords) key2) AS key,
        spent
      FROM spend""")
    spark.sql(s"""MERGE INTO gsqlm.$tbl t USING gsqlm_src_$ident s
      ON t.c_custkey = s.key
      WHEN MATCHED AND s.spent > 300000 THEN DELETE
      WHEN MATCHED THEN UPDATE SET c_acctbal = t.c_acctbal + s.spent
      WHEN NOT MATCHED THEN
        INSERT (c_custkey, c_acctbal, c_mktsegment) VALUES (s.key, s.spent, 'NEW')""")
    spark.sql(s"""SELECT c_mktsegment, count(*) AS cnt,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM gsqlm.$tbl GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  /** SQL MERGE **schema evolution** — `MERGE WITH SCHEMA EVOLUTION INTO`
    * whose source carries a column the target lacks (`n_orders`):
    * Spark's ResolveMergeIntoSchemaEvolution turns it into an AddColumn
    * through the catalog (metadata-only — the capability is advertised
    * in [[graft.tables.GraftSqlTable.capabilities]]), then MATCHED rows
    * land values, pre-evolution rows read back NULL. The staple of any
    * pipeline promoting staged data into evolving tables. */
  private def tblSqlMergeEvolve(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gsqme",
      classOf[graft.tables.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsqme.root", Scratch.dir("tbl-sqlmev"))
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"customer_$ident"
    val cust = s"gsqme_cust_$ident"
    val ords = s"gsqme_ord_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gsqme.$tbl")
    spark.sql(s"""CREATE TABLE gsqme.$tbl (c_custkey BIGINT, c_acctbal DOUBLE)
      TBLPROPERTIES ('zone_cols'='c_custkey')""")
    t(spark, dir, "customer").select("c_custkey", "c_acctbal")
      .createOrReplaceTempView(cust)
    t(spark, dir, "orders").createOrReplaceTempView(ords)
    spark.sql(s"INSERT INTO gsqme.$tbl SELECT * FROM $cust")
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW gsqme_src_$ident AS
      WITH spend AS (
        SELECT o_custkey AS key,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent,
          COUNT(*) AS n_orders
        FROM $ords GROUP BY o_custkey)
      SELECT key, spent, n_orders FROM spend
      UNION ALL
      SELECT key + 1 + GREATEST((SELECT MAX(c_custkey) FROM $cust),
                                (SELECT MAX(o_custkey) FROM $ords)) AS key,
        spent, n_orders
      FROM spend""")
    spark.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO gsqme.$tbl t
      USING gsqme_src_$ident s ON t.c_custkey = s.key
      WHEN MATCHED THEN
        UPDATE SET c_acctbal = t.c_acctbal + s.spent, n_orders = s.n_orders
      WHEN NOT MATCHED THEN
        INSERT (c_custkey, c_acctbal, n_orders) VALUES (s.key, s.spent, s.n_orders)""")
    val store = new graft.tables.TableStore(spark, Scratch.dir("tbl-sqlmev"))
    require(store.schema(tbl).fieldNames.toSeq ==
      Seq("c_custkey", "c_acctbal", "n_orders"),
      s"MERGE must have evolved the schema, got " +
        s"${store.schema(tbl).fieldNames.mkString(",")}")
    spark.sql(s"""SELECT
        CASE WHEN n_orders IS NULL THEN 'old' ELSE 'new' END AS grp,
        c_custkey % 7 AS bucket, count(*) AS cnt,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
        SUM(n_orders) AS sum_orders
      FROM gsqme.$tbl GROUP BY 1, 2 ORDER BY 1, 2""")
  }

  private val tblSqlMergeEvolveSql =
    """WITH spend AS (
      |  SELECT o_custkey AS key,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY o_custkey),
      |src AS (
      |  SELECT key, spent, n_orders FROM spend
      |  UNION ALL
      |  SELECT key + 1 + GREATEST((SELECT MAX(c_custkey) FROM customer),
      |                            (SELECT MAX(o_custkey) FROM orders))
      |      AS key, spent, n_orders
      |  FROM spend),
      |merged AS (
      |  SELECT c.c_custkey AS k,
      |    CASE WHEN s.key IS NOT NULL THEN c.c_acctbal + s.spent
      |         ELSE c.c_acctbal END AS bal,
      |    s.n_orders AS n_orders
      |  FROM customer c LEFT JOIN src s ON c.c_custkey = s.key
      |  UNION ALL
      |  SELECT s.key AS k, s.spent AS bal, s.n_orders
      |  FROM src s LEFT JOIN customer c ON c.c_custkey = s.key
      |  WHERE c.c_custkey IS NULL)
      |SELECT CASE WHEN n_orders IS NULL THEN 'old' ELSE 'new' END AS grp,
      | k % 7 AS bucket, COUNT(*) AS cnt,
      | CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total,
      | CAST(SUM(n_orders) AS BIGINT) AS sum_orders
      |FROM merged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private val tblSqlMergeSql =
    """WITH spend AS (
      |  SELECT o_custkey AS key,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
      |  FROM orders GROUP BY o_custkey),
      |src AS (
      |  SELECT key, spent FROM spend
      |  UNION ALL
      |  SELECT key + 1 + (SELECT GREATEST(MAX(c.c_custkey), MAX(o.o_custkey))
      |                    FROM customer c, orders o) AS key, spent
      |  FROM spend),
      |merged AS (
      |  SELECT CASE WHEN s.key IS NOT NULL THEN c.c_acctbal + s.spent
      |              ELSE c.c_acctbal END AS bal,
      |         c.c_mktsegment AS seg
      |  FROM customer c LEFT JOIN src s ON c.c_custkey = s.key
      |  WHERE s.key IS NULL OR s.spent <= 300000
      |  UNION ALL
      |  SELECT s.spent AS bal, 'NEW' AS seg
      |  FROM src s LEFT JOIN customer c ON c.c_custkey = s.key
      |  WHERE c.c_custkey IS NULL)
      |SELECT seg AS c_mktsegment, count(*) AS cnt,
      |  CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM merged GROUP BY seg ORDER BY seg""".stripMargin

  val all: Seq[Q] = Seq(
    Q("tbl_zorder_scan", tblZorderScan, Some(tblZorderScanSql)),
    Q("tbl_skipping_scan", tblSkippingScan, Some(tblSkippingScanSql)),
    Q("tbl_time_travel", tblTimeTravel, Some(tblTimeTravelSql)),
    Q("tbl_incremental", tblIncremental, Some(tblIncrementalSql)),
    Q("tbl_evolution", tblEvolution, Some(tblEvolutionSql)),
    Q("tbl_bloom_scan", tblBloomScan, Some(tblBloomScanSql)),
    Q("tbl_meta_agg", tblMetaAgg, Some(tblMetaAggSql)),
    Q("tbl_count_pushdown", tblCountPushdown, Some(tblCountPushdownSql)),
    Q("tbl_merge", tblMerge, Some(tblMergeSql)),
    Q("tbl_merge_delete", tblMergeDelete, Some(tblMergeDeleteSql)),
    Q("tbl_concurrent", tblConcurrent, Some(tblConcurrentSql)),
    Q("tbl_partition_evolution", tblPartitionEvolution,
      Some(tblPartitionEvolutionSql)),
    Q("tbl_diff", tblDiff, Some(tblDiffSql)),
    Q("tbl_sql_catalog", tblSqlCatalog, Some(tblSqlCatalogSql)),
    Q("tbl_sql_agg", tblSqlAgg, Some(tblSqlAggSql)),
    Q("tbl_meta_tables", tblMetaTables, Some(tblMetaTablesSql)),
    Q("tbl_call", tblCall, Some(tblCallSql)),
    Q("tbl_mor_delete", tblMorDelete, Some(tblMorDeleteSql)),
    Q("tbl_branch_wap", tblBranchWap, Some(tblBranchWapSql)),
    Q("tbl_sql_update", tblSqlUpdate, Some(tblSqlUpdateSql)),
    Q("tbl_sql_merge", tblSqlMerge, Some(tblSqlMergeSql)),
    Q("tbl_sql_merge_evolve", tblSqlMergeEvolve, Some(tblSqlMergeEvolveSql)),
    Q("tbl_hidden_partition", TableQueries2.tblHiddenPartition,
      Some(TableQueries2.tblHiddenPartitionSql)),
    Q("tbl_sql_mor", TableQueries2.tblSqlMor, Some(TableQueries2.tblSqlMorSql)),
    Q("tbl_mor_update", TableQueries2.tblMorUpdate,
      Some(TableQueries2.tblMorUpdateSql)),
    Q("tbl_row_lineage", TableQueries2.tblRowLineage,
      Some(TableQueries2.tblRowLineageSql)),
    Q("tbl_sql_delta", TableQueries2.tblSqlDelta,
      Some(TableQueries2.tblSqlDeltaSql)),
    Q("tbl_sql_merge_source", TableQueries2.tblSqlMergeSource,
      Some(TableQueries2.tblSqlMergeSourceSql)),
    Q("tbl_snapshot", TableQueries2.tblSnapshot,
      Some(TableQueries2.tblSnapshotSql)),
    Q("tbl_mview", TableQueries2.tblMview,
      Some(TableQueries2.tblMviewSql)),
    Q("tbl_mview_rewrite", TableQueries2.tblMviewRewrite,
      Some(TableQueries2.tblMviewRewriteSql)),
    Q("tbl_nested_evolution", TableQueries2.tblNestedEvolution,
      Some(TableQueries2.tblNestedEvolutionSql)),
    Q("tbl_pos_delete", TableQueries2.tblPosDelete,
      Some(TableQueries2.tblPosDeleteSql)),
    Q("tbl_spj", TableQueries2.tblSpj, Some(TableQueries2.tblSpjSql)),
    Q("tbl_changelog", TableQueries2.tblChangelog,
      Some(TableQueries2.tblChangelogSql)),
    Q("tbl_namespace", TableQueries2.tblNamespace,
      Some(TableQueries2.tblNamespaceSql)),
    Q("tbl_sql_view", TableQueries2.tblSqlView,
      Some(TableQueries2.tblSqlViewSql)),
    Q("tbl_sql_ctas", TableQueries2.tblSqlCtas,
      Some(TableQueries2.tblSqlCtasSql)),
    Q("tbl_limit_pushdown", TableQueries2.tblLimitPushdown,
      Some(TableQueries2.tblLimitPushdownSql)),
    Q("tbl_rollback", TableQueries2.tblRollback,
      Some(TableQueries2.tblRollbackSql)),
    Q("tbl_cbo_broadcast", TableQueries2.tblCboBroadcast,
      Some(TableQueries2.tblCboBroadcastSql)),
    Q("tbl_add_files", TableQueries2.tblAddFiles,
      Some(TableQueries2.tblAddFilesSql)),
    Q("tbl_add_files_partitioned", TableQueries2.tblAddFilesPartitioned,
      Some(TableQueries2.tblAddFilesPartitionedSql)),
    Q("tbl_changelog_updates", TableQueries2.tblChangelogUpdates,
      Some(TableQueries2.tblChangelogUpdatesSql)),
    Q("tbl_spj_identity", TableQueries2.tblSpjIdentity,
      Some(TableQueries2.tblSpjIdentitySql)),
    Q("tbl_spj_temporal", TableQueries2.tblSpjTemporal,
      Some(TableQueries2.tblSpjTemporalSql)),
    Q("tbl_defaults", TableQueries2.tblDefaults,
      Some(TableQueries2.tblDefaultsSql)),
    Q("tbl_dynamic_overwrite", TableQueries2.tblDynamicOverwrite,
      Some(TableQueries2.tblDynamicOverwriteSql)),
    Q("tbl_partitions_meta", TableQueries2.tblPartitionsMeta,
      Some(TableQueries2.tblPartitionsMetaSql)),
    Q("tbl_variant", TableQueries2.tblVariant,
      Some(TableQueries2.tblVariantSql)),
    Q("tbl_maintain", TableQueries2.tblMaintain,
      Some(TableQueries2.tblMaintainSql)),
    Q("tbl_txn", TableQueries2.tblTxn, Some(TableQueries2.tblTxnSql)),
    Q("tbl_sorted_write", TableQueries2.tblSortedWrite,
      Some(TableQueries2.tblSortedWriteSql)),
    Q("tbl_binpack", TableQueries2.tblBinpack,
      Some(TableQueries2.tblBinpackSql)))
}

/** Late-round table gates — separate object so the registry list above
  * can reference their SQL vals without initialization-order traps. */
object TableQueries2 {
  import Tables.t

  /** Hidden partitioning under the oracle (the Iceberg partition model
    * the reference inherits, SparkUtils.java:46): events lands under
    * `days(ts)` × `bucket(8, user_id)` derived directories, takes a CoW
    * delete spanning the layout, and is then queried with predicates on
    * the SOURCE columns only — a ts range (pruned by day directories)
    * and a user-id IN list (pruned by bucket arithmetic). The result
    * must equal the plain SQL; pruning EFFECTIVENESS (directory counts)
    * is pinned in HiddenPartitionSpec. */
  private[ops] def tblHiddenPartition(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val store = new TableStore(spark,
      Scratch.dir("tbl-hidp", Scratch.tag(dir)))
    val ev = t(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    store.create("events", ev.schema, overwrite = true,
      partitionBy = Seq("days(ts)", "bucket(8:user_id)"))
    // hash distribution: one task's files per (day, bucket) dir — without
    // it every task sprays a tiny file into every dir it holds rows for
    // (32 tasks × 240 dirs here; 1000 × thousands at scale)
    store.setProperties("events",
      Map("write.distribution-mode" -> Some("hash")))
    store.append("events", ev)
    // the delete carries a ts bound so the MUTATION path itself proves
    // transform-aware pruning: day directories outside [08, 20) are never
    // candidates and their files survive byte-identical — at scale a CoW
    // delete without a partition-aligned bound rewrites the whole table
    store.delete("events", col("event_id") % 17 === 0 &&
      col("ts") >= lit(java.time.LocalDateTime.parse("2024-01-08T00:00:00")) &&
      col("ts") < lit(java.time.LocalDateTime.parse("2024-01-20T00:00:00")))
    store.read("events")
      .filter(col("ts") >= lit(java.time.LocalDateTime.parse("2024-01-10T00:00:00")) &&
        col("ts") < lit(java.time.LocalDateTime.parse("2024-01-15T00:00:00")) &&
        col("user_id").isin(10L, 20L, 30L, 40L, 50L))
      .orderBy("event_id")
  }

  private[ops] val tblHiddenPartitionSql =
    """SELECT event_id, ts, user_id, event_type, value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-15 00:00:00'
      |  AND user_id IN (10, 20, 30, 40, 50)
      |  AND NOT (event_id % 17 = 0
      |    AND ts >= TIMESTAMP '2024-01-08 00:00:00'
      |    AND ts < TIMESTAMP '2024-01-20 00:00:00')
      |ORDER BY event_id""".stripMargin

  /** SQL merge-on-read deletes under the oracle
    * (`write.delete.mode=merge-on-read`, the Iceberg v2 property): three
    * scattered SQL DELETEs — point key, IN list, non-clustered equality —
    * each commit an equality-delete sidecar WITHOUT rewriting a single
    * data file (file count require()d unchanged inside the gate), and the
    * returned read runs with all three deletes still PENDING, so the
    * masked-read path itself is what hash-matches DuckDB.
    * Materialization folding is spec-pinned in SqlMorSpec. */
  private[ops] def tblSqlMor(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gmor",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-sqlmor")
    spark.conf.set("spark.sql.catalog.gmor.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val src = s"gmor_src_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gmor.$tbl")
    spark.sql(s"""CREATE TABLE gmor.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT,
      o_orderstatus STRING, o_totalprice DOUBLE)
      TBLPROPERTIES ('zone_cols'='o_orderkey',
        'write.delete.mode'='merge-on-read')""")
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO gmor.$tbl SELECT * FROM $src")
    val store = new TableStore(spark, root)
    val filesBefore = store.currentRelPaths(tbl).size
    spark.sql(s"DELETE FROM gmor.$tbl WHERE o_orderkey = 7")
    spark.sql(s"DELETE FROM gmor.$tbl WHERE o_orderkey IN (100, 101, 102, 103)")
    spark.sql(s"DELETE FROM gmor.$tbl WHERE o_orderstatus = 'P'")
    // a NON-key shape (range) stays merge-on-read too: a POSITION-delete
    // sidecar of matched (file, ordinal) pairs — still no rewrite
    spark.sql(s"DELETE FROM gmor.$tbl WHERE o_totalprice > 304000.0")
    require(store.currentRelPaths(tbl).size == filesBefore,
      "merge-on-read SQL deletes must not rewrite data files")
    require(store.pendingDeletes(tbl) == 4,
      s"expected 4 pending delete sidecars, got ${store.pendingDeletes(tbl)}")
    spark.sql(s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM gmor.$tbl
      ORDER BY o_orderkey, o_custkey, o_orderstatus, o_totalprice""")
  }

  private[ops] val tblSqlMorSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders
      |WHERE o_orderkey <> 7
      |  AND o_orderkey NOT IN (100, 101, 102, 103)
      |  AND o_orderstatus <> 'P'
      |  AND NOT (o_totalprice > 304000.0)
      |ORDER BY o_orderkey, o_custkey, o_orderstatus, o_totalprice""".stripMargin

  /** ROW LINEAGE under the oracle (Iceberg v3 `_row_id`): stable per-row
    * ids assigned metadata-only at commit and carried through a CoW
    * delete, a merge-on-read update, AND a full compaction — the
    * invariants (ids unique; every surviving row keeps its pre-mutation
    * id) are require()d in-gate over the engine-assigned values, and the
    * DATA the lineage read returns hash-matches DuckDB's replay of the
    * same mutations. */
  private[ops] def tblRowLineage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit}
    val store = new TableStore(spark,
      Scratch.dir("tbl-lineage", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.setProperties("orders", Map("row-lineage" -> Some("true")))
    store.append("orders", ord)
    val before = store.readLineage("orders")
      .select(col("o_orderkey"), col("_row_id").as("rid0"))
    store.delete("orders", col("o_orderkey") % 31 === 0)
    store.updateMoR("orders", col("o_orderstatus") === "P",
      Map("o_totalprice" -> (col("o_totalprice") + lit(50000.0))))
    store.compact("orders", numFiles = 4)
    val after = store.readLineage("orders")
    require(after
      .groupBy("_row_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).isEmpty, "row ids must stay unique")
    require(after.select(col("o_orderkey"), col("_row_id"))
      .join(before, "o_orderkey")
      .filter(col("_row_id") =!= col("rid0") ||
        col("_row_id").isNull).isEmpty,
      "every surviving row must keep its pre-mutation id through " +
        "CoW delete + MoR update + compaction")
    after
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  private[ops] val tblRowLineageSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      | CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 50000.0
      |      ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderkey % 31 <> 0
      |ORDER BY o_orderkey""".stripMargin

  /** Merge-on-read UPDATE under the oracle: one atomic commit carries a
    * positional delete of the matched rows plus appended files with the
    * SET applied — zero existing files rewritten (require()d), and the
    * read that hash-matches DuckDB runs with the update masks PENDING.
    * A second update over the first's rows proves chained MoR updates
    * see each other's values. */
  private[ops] def tblMorUpdate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val store = new TableStore(spark,
      Scratch.dir("tbl-morupd", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("orders", ord)
    val before = store.currentRelPaths("orders").toSet
    store.updateMoR("orders", col("o_orderstatus") === "P",
      Map("o_totalprice" -> (col("o_totalprice") + lit(100000.0))))
    store.updateMoR("orders",
      col("o_orderstatus") === "P" && col("o_totalprice") > lit(400000.0),
      Map("o_orderstatus" -> lit("X")))
    require(before.subsetOf(store.currentRelPaths("orders").toSet),
      "MoR update must not rewrite existing data files")
    require(store.pendingDeletes("orders") == 2,
      s"expected 2 pending position sidecars, got " +
        s"${store.pendingDeletes("orders")}")
    // incremental sidecar compaction: the two position sidecars fold
    // into ONE (file-scoped masks merge unconditionally) without
    // touching any data file, and the read that hash-matches DuckDB
    // runs with the MERGED mask pending
    val filesPreRewrite = store.currentRelPaths("orders").toSet
    val (entriesBefore, entriesAfter) = store.rewriteDeletes("orders")
    require(entriesBefore == 2 && entriesAfter == 1,
      s"rewrite_deletes expected 2 -> 1, got $entriesBefore -> $entriesAfter")
    require(store.currentRelPaths("orders").toSet == filesPreRewrite,
      "rewrite_deletes must not touch data files")
    store.read("orders")
      .orderBy("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
  }

  private[ops] val tblMorUpdateSql =
    """SELECT o_orderkey, o_custkey,
      | CASE WHEN o_orderstatus = 'P' AND o_totalprice + 100000.0 > 400000.0
      |      THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
      | CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 100000.0
      |      ELSE o_totalprice END AS o_totalprice
      |FROM orders
      |ORDER BY o_orderkey, o_custkey, o_orderstatus, o_totalprice""".stripMargin

  /** Delta-based SQL row-level ops under the oracle
    * (`write.update.mode` / `write.merge.mode` = `merge-on-read`, the
    * Iceberg v2 positional-delta plan via SupportsDelta): an UPDATE and
    * a MERGE (update + delete + insert clauses) each commit position
    * sidecars plus appended rows — zero existing files rewritten
    * (require()d in-gate) — and the read that hash-matches DuckDB runs
    * with ALL masks pending. */
  private[ops] def tblSqlDelta(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gdlt",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-delta")
    spark.conf.set("spark.sql.catalog.gdlt.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val src = s"gdlt_src_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gdlt.$tbl")
    spark.sql(s"""CREATE TABLE gdlt.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT,
      o_orderstatus STRING, o_totalprice DOUBLE)
      TBLPROPERTIES ('zone_cols'='o_orderkey',
        'write.update.mode'='merge-on-read',
        'write.merge.mode'='merge-on-read')""")
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO gdlt.$tbl SELECT * FROM $src")
    val store = new TableStore(spark, root)
    val before = store.currentRelPaths(tbl).toSet
    spark.sql(s"UPDATE gdlt.$tbl SET o_totalprice = o_totalprice + 50000.0 " +
      "WHERE o_orderstatus = 'F'")
    spark.sql(s"""MERGE INTO gdlt.$tbl t
      USING (SELECT o_orderkey AS k, o_totalprice AS p FROM $src
             WHERE o_orderkey % 1000 = 0) s
      ON t.o_orderkey = s.k
      WHEN MATCHED AND t.o_totalprice < 150000.0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M'
      WHEN NOT MATCHED THEN
        INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
        VALUES (s.k + 90000000, 0, 'Z', s.p)""")
    require(before.subsetOf(store.currentRelPaths(tbl).toSet),
      "delta SQL ops must not rewrite existing data files")
    require(store.pendingDeletes(tbl) >= 2,
      s"expected pending position sidecars, got ${store.pendingDeletes(tbl)}")
    spark.sql(s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM gdlt.$tbl
      ORDER BY o_orderkey, o_custkey, o_orderstatus, o_totalprice""")
  }

  private[ops] val tblSqlDeltaSql =
    """WITH upd AS (
      | SELECT o_orderkey, o_custkey, o_orderstatus,
      |  CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 50000.0
      |       ELSE o_totalprice END AS o_totalprice
      | FROM orders),
      |m AS (
      | SELECT u.o_orderkey, u.o_custkey,
      |  CASE WHEN u.o_orderkey % 1000 = 0 THEN 'M'
      |       ELSE u.o_orderstatus END AS o_orderstatus,
      |  u.o_totalprice,
      |  (u.o_orderkey % 1000 = 0 AND u.o_totalprice < 150000.0) AS killed
      | FROM upd u)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM m WHERE NOT killed
      |ORDER BY o_orderkey, o_custkey, o_orderstatus, o_totalprice""".stripMargin

  /** Zero-copy SNAPSHOT clone under the oracle (Iceberg's `snapshot`
    * procedure): orders loads once, `CALL system.snapshot` clones it by
    * reference (require()d: no byte under the clone's data dir, entries
    * absolute), the CLONE takes a CoW delete while the SOURCE takes an
    * append — both require()d invisible to the other side — and the
    * gate returns the clone's final state (source rows minus the
    * clone's delete, never the source's new row). */
  private[ops] def tblSnapshot(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.catalog.gsnp",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-snap")
    spark.conf.set("spark.sql.catalog.gsnp.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val clone = s"orders_clone_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gsnp.$clone")
    spark.sql(s"DROP TABLE IF EXISTS gsnp.$tbl")
    spark.sql(s"""CREATE TABLE gsnp.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
      TBLPROPERTIES ('zone_cols'='o_orderkey')""")
    val src = s"gsnp_src_$ident"
    t(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO gsnp.$tbl SELECT * FROM $src")
    val store = new graft.tables.TableStore(spark, root)
    val srcRows = store.read(tbl).count()
    val r = spark.sql(
      s"CALL gsnp.system.snapshot(source => '$tbl', dest => '$clone')").head()
    require(r.getLong(0) >= 1L, "clone must reference files")
    require(store.currentRelPaths(clone).forall(_.startsWith("/")),
      "clone entries must be by-reference (absolute)")
    val cloneData = new java.io.File(s"$root/$clone/data")
    require(!cloneData.exists() || cloneData.listFiles().forall(f =>
        !f.getName.endsWith(".parquet")), "snapshot must copy nothing")
    // diverge both sides; each mutation must be invisible to the other
    spark.sql(s"DELETE FROM gsnp.$clone WHERE o_orderkey % 13 = 0")
    spark.sql(s"INSERT INTO gsnp.$tbl VALUES " +
      "(1000000000000, 1, 1.0)") // clear of MakeScale replica key space
    require(store.read(tbl).count() == srcRows + 1,
      "the source keeps all rows plus its own append")
    require(store.read(clone).filter(col("o_orderkey") % 13 === 0)
        .count() == 0L, "the clone's delete applied")
    // SOURCE-side maintenance must not break the clone: a CoW delete
    // rewrites every adopted file on the source, expiry then drops the
    // manifests that referenced them — the foreign-reference guard is
    // the only thing keeping the clone's files on disk here
    val cloneRows = store.read(clone).count()
    spark.sql(s"DELETE FROM gsnp.$tbl WHERE o_orderkey % 2 = 0")
    store.expireSnapshots(tbl, 1)
    store.removeOrphans(tbl, 0L)
    require(store.read(clone).count() == cloneRows,
      "clone must read green after source expiry + orphan cleanup")
    spark.sql(s"""SELECT o_orderkey, o_custkey, o_totalprice
      FROM gsnp.$clone
      ORDER BY o_orderkey, o_custkey, o_totalprice""")
  }

  private[ops] val tblSnapshotSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey % 13 <> 0
      |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin

  /** `MERGE … WHEN NOT MATCHED BY SOURCE` under the oracle — the
    * sync-style mirror statement (Spark 4 clause; the reference
    * inherits it through Iceberg's Spark extensions, SparkUtils.java:45):
    * one statement updates matches, inserts new source rows, deletes
    * overdrawn stale targets and demotes the rest, in ONE merge-on-read
    * commit with no data file rewritten. Source keys are split half
    * existing / half synthetic (at +1e12 — clear of MakeScale replica
    * key space) so every clause fires. The oracle reconstructs the
    * merged state as a pure SELECT (value-exact, including the
    * DECIMAL-summed per-customer totals). */
  private[ops] def tblSqlMergeSource(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gmsrc",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-mergesrc")
    spark.conf.set("spark.sql.catalog.gmsrc.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"customer_$ident"
    val srcO = s"gmsrc_orders_$ident"
    val srcC = s"gmsrc_customer_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gmsrc.$tbl")
    spark.sql(s"""CREATE TABLE gmsrc.$tbl (
      c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE)
      TBLPROPERTIES ('write.merge.mode'='merge-on-read')""")
    t(spark, dir, "orders").createOrReplaceTempView(srcO)
    t(spark, dir, "customer").createOrReplaceTempView(srcC)
    spark.sql(s"INSERT INTO gmsrc.$tbl " +
      s"SELECT c_custkey, c_mktsegment, c_acctbal FROM $srcC")
    val store = new graft.tables.TableStore(spark, root)
    val before = store.currentRelPaths(tbl).toSet
    val ver = store.currentVersion(tbl)
    spark.sql(s"""MERGE INTO gmsrc.$tbl t
      USING (SELECT CASE WHEN o_custkey % 2 = 0 THEN o_custkey
                         ELSE o_custkey + 1000000000000 END AS k,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total
             FROM $srcO WHERE o_orderstatus = 'O'
             GROUP BY 1) s
      ON t.c_custkey = s.k
      WHEN MATCHED THEN UPDATE SET c_mktsegment = 'ACTIVE', c_acctbal = s.total
      WHEN NOT MATCHED THEN
        INSERT (c_custkey, c_mktsegment, c_acctbal) VALUES (s.k, 'NEW', s.total)
      WHEN NOT MATCHED BY SOURCE AND t.c_acctbal < 0 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c_mktsegment = 'DORMANT'""")
    require(store.currentVersion(tbl) == ver + 1,
      "the four-clause merge must be ONE atomic commit")
    require(before.subsetOf(store.currentRelPaths(tbl).toSet),
      "merge-on-read MERGE must not rewrite existing data files")
    require(store.pendingDeletes(tbl) >= 1,
      "deletes/update-before images must pend as sidecars (MoR)")
    spark.sql(s"""SELECT c_custkey, c_mktsegment, c_acctbal FROM gmsrc.$tbl
      ORDER BY c_custkey, c_mktsegment, c_acctbal""")
  }

  private[ops] val tblSqlMergeSourceSql =
    """WITH src AS (
      | SELECT CASE WHEN o_custkey % 2 = 0 THEN o_custkey
      |             ELSE o_custkey + 1000000000000 END AS k,
      |   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      | FROM orders WHERE o_orderstatus = 'O'
      | GROUP BY 1)
      |SELECT c.c_custkey AS c_custkey,
      |  CASE WHEN s.k IS NOT NULL THEN 'ACTIVE'
      |       ELSE 'DORMANT' END AS c_mktsegment,
      |  CASE WHEN s.k IS NOT NULL THEN s.total
      |       ELSE c.c_acctbal END AS c_acctbal
      |FROM customer c LEFT JOIN src s ON c.c_custkey = s.k
      |WHERE s.k IS NOT NULL OR c.c_acctbal >= 0
      |UNION ALL
      |SELECT s.k AS c_custkey, 'NEW' AS c_mktsegment, s.total AS c_acctbal
      |FROM src s LEFT JOIN customer c ON c.c_custkey = s.k
      |WHERE c.c_custkey IS NULL
      |ORDER BY c_custkey, c_mktsegment, c_acctbal""".stripMargin

  /** Nested schema evolution under the oracle: orders lands as a STRUCT
    * payload, a nested field is ADDED between two appends (old files
    * backfill null), the original nested field is RENAMED — both
    * metadata-only — and a CoW delete then rewrites files ACROSS the
    * evolution boundary. The flattened read must equal the plain SQL
    * reconstruction; physical-name stability and pruning are spec-pinned
    * in NestedEvolutionSpec. */
  private[ops] def tblNestedEvolution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, struct}
    import org.apache.spark.sql.types.DoubleType
    val store = new TableStore(spark,
      Scratch.dir("tbl-nested", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
    val batch1 = ord.filter(col("o_orderkey") <= 7500L)
      .select(col("o_orderkey"),
        struct(col("o_orderstatus").as("status"),
          col("o_totalprice").as("price")).as("payload"))
    store.create("orders", batch1.schema, overwrite = true)
    store.append("orders", batch1)
    store.addNestedField("orders", Seq("payload", "disc"), DoubleType)
    store.append("orders", ord.filter(col("o_orderkey") > 7500L)
      .select(col("o_orderkey"),
        struct(col("o_orderstatus").as("status"),
          col("o_totalprice").as("price"),
          (col("o_totalprice") * 0.1).as("disc")).as("payload")))
    store.renameNestedField("orders", Seq("payload", "status"), "state")
    store.delete("orders", col("o_orderkey") % 13 === 0)
    store.read("orders")
      .select(col("o_orderkey"), col("payload.state").as("state"),
        col("payload.price").as("price"), col("payload.disc").as("disc"))
      .orderBy("o_orderkey")
  }

  private[ops] val tblNestedEvolutionSql =
    """SELECT o_orderkey, o_orderstatus AS state, o_totalprice AS price,
      |  CASE WHEN o_orderkey > 7500 THEN o_totalprice * 0.1 END AS disc
      |FROM orders WHERE o_orderkey % 13 <> 0
      |ORDER BY o_orderkey""".stripMargin

  /** Position deletes under the oracle (the Iceberg v2 positional
    * flavor): a PREDICATE-shaped delete — no key columns at all —
    * commits (file, row-ordinal) sidecars metadata-only (file count
    * require()d unchanged), a later append re-inserts a subset untouched
    * by the mask (its file is named in no sidecar), and the read runs
    * with the delete still PENDING. Folding is spec-pinned in
    * PosDeleteSpec. */
  private[ops] def tblPosDelete(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val store = new TableStore(spark,
      Scratch.dir("tbl-posdel", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("orders", ord.repartitionByRange(8, col("o_orderkey")))
    val filesBefore = store.currentRelPaths("orders").size
    store.deletePos("orders", col("o_custkey") % 11 === 0)
    require(store.currentRelPaths("orders").size == filesBefore,
      "position delete must not rewrite data files")
    require(store.pendingDeletes("orders") == 1)
    store.append("orders", ord.filter(col("o_orderkey") % 1000 === 0)
      .withColumn("o_totalprice", lit(1.0)))
    store.read("orders")
      .orderBy("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
  }

  private[ops] val tblPosDeleteSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_custkey % 11 <> 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_orderstatus, 1.0 AS o_totalprice
      |FROM orders WHERE o_orderkey % 1000 = 0
      |ORDER BY o_orderkey, o_custkey, o_orderstatus, o_totalprice""".stripMargin

  /** Storage-partitioned join under the oracle: orders and customer both
    * land bucketed by their customer key (`bucket(16, ...)`), and the
    * join-plus-aggregate runs with broadcast OFF — so every exchange
    * Spark would normally insert is visible — and V2 bucketing ON. The
    * gate require()s ZERO exchanges in the executed plan: both scans
    * report KeyGroupedPartitioning ([[graft.tables.GraftBatchScan]]),
    * Spark zips matching buckets, and the bucket-keyed aggregate reuses
    * the same partitioning. At 100 TB this is the difference between a
    * shuffle of both tables (~2× total size over the wire) and none at
    * all. Result correctness hash-matches DuckDB on the raw parquet. */
  private[ops] def tblSpj(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gspj",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-spj")
    spark.conf.set("spark.sql.catalog.gspj.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val fact = s"orders_$ident"
    val dim = s"customer_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gspj.$fact")
    spark.sql(s"DROP TABLE IF EXISTS gspj.$dim")
    // hash write distribution (same guard tblSpjIdentity/tblSpjTemporal
    // carry): one task's files per bucket dir instead of every insert
    // task spraying a tiny file into all 16 — 16 files, not ~16×tasks
    spark.sql(s"""CREATE TABLE gspj.$fact (
      o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
      PARTITIONED BY (bucket(16, o_custkey))
      TBLPROPERTIES ('write.distribution-mode'='hash')""")
    spark.sql(s"""CREATE TABLE gspj.$dim (
      c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE)
      PARTITIONED BY (bucket(16, c_custkey))
      TBLPROPERTIES ('write.distribution-mode'='hash')""")
    val srcF = s"gspj_fact_$ident"
    val srcD = s"gspj_dim_$ident"
    t(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView(srcF)
    t(spark, dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
      .createOrReplaceTempView(srcD)
    spark.sql(s"INSERT INTO gspj.$fact SELECT * FROM $srcF")
    spark.sql(s"INSERT INTO gspj.$dim SELECT * FROM $srcD")
    // pile MERGE-ON-READ tombstones onto the fact table — one equality
    // sidecar (the CDC tombstone shape) and one position sidecar — and
    // require they are STILL PENDING at read time: the zero-exchange
    // join must survive exactly the state a CDC-busy MoR table lives in
    // (the V2 readers mask per file; see GraftMaskedReaderFactory)
    import org.apache.spark.sql.functions.col
    val store = new graft.tables.TableStore(spark, root)
    store.deleteMoR(fact,
      t(spark, dir, "orders").filter(col("o_orderkey") % 19 === 0)
        .select("o_orderkey"), Seq("o_orderkey"))
    // a SECOND tombstone generation (the CDC-heavy pile shape): its
    // sidecar is layout-clustered with per-file ranges, so each bucket
    // task reads only its slice however large the pile grows
    store.deleteMoR(fact,
      t(spark, dir, "orders").filter(col("o_orderkey") % 23 === 1)
        .select("o_orderkey"), Seq("o_orderkey"))
    store.deletePos(fact, col("o_totalprice") > 200000.0)
    require(store.pendingDeletes(fact) == 3,
      s"expected 3 pending MoR sidecars, got ${store.pendingDeletes(fact)}")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = spark.sql(
        s"""SELECT o.o_custkey AS custkey, c.c_mktsegment AS seg,
           |  count(*) AS cnt,
           |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS total
           |FROM gspj.$fact o JOIN gspj.$dim c ON o.o_custkey = c.c_custkey
           |GROUP BY o.o_custkey, c.c_mktsegment
           |ORDER BY custkey, seg""".stripMargin)
      q.collect() // force execution so the FINAL adaptive plan is pinned
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      require(plan.contains("BatchScan"),
        s"SPJ gate expected the V2 batch scan, got:\n$plan")
      // the final ORDER BY legitimately range-partitions; the join and
      // the bucket-keyed aggregate must add NO hash exchange
      require(!plan.contains("Exchange hashpartitioning"),
        s"SPJ gate expected a shuffle-free join+aggregate, got:\n$plan")
      require(store.pendingDeletes(fact) == 3,
        "the masked read must leave the sidecars pending (MoR, not CoW)")
      // re-issue under restored confs: the RESULT the driver compares is
      // conf-independent, only the plan shape needed the pinned settings
      q
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private[ops] val tblSpjSql =
    """SELECT o.o_custkey AS custkey, c.c_mktsegment AS seg,
      |  count(*) AS cnt,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE o.o_orderkey % 19 <> 0 AND o.o_orderkey % 23 <> 1
      |  AND o.o_totalprice <= 200000.0
      |GROUP BY o.o_custkey, c.c_mktsegment
      |ORDER BY custkey, seg""".stripMargin

  /** IDENTITY-layout storage-partitioned join under the oracle: two
    * classic hive tables partitioned by the same month column (values
    * live in DIRECTORY NAMES only — the V2 reader re-attaches them as
    * parquet partition values) join and aggregate with zero hash
    * exchanges under broadcast-off, require()d in-gate. */
  private[ops] def tblSpjIdentity(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gspi",
      classOf[graft.tables.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspi.root", Scratch.dir("tbl-spji"))
    val ident = Scratch.tag(dir).replace('.', '_')
    val fact = s"orders_$ident"
    val dim = s"months_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gspi.$fact")
    spark.sql(s"DROP TABLE IF EXISTS gspi.$dim")
    // hash write distribution: one task's worth of files per month dir
    // instead of every task spraying into every dir (the small-files
    // guard every partitioned table needs at scale)
    spark.sql(s"""CREATE TABLE gspi.$fact (
      o_orderkey BIGINT, o_totalprice DOUBLE, m STRING)
      PARTITIONED BY (m)
      TBLPROPERTIES ('write.distribution-mode'='hash')""")
    spark.sql(s"""CREATE TABLE gspi.$dim (n_month BIGINT, m STRING)
      PARTITIONED BY (m)
      TBLPROPERTIES ('write.distribution-mode'='hash')""")
    val src = s"gspi_src_$ident"
    t(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_totalprice",
        "date_format(o_orderdate, 'yyyy-MM') AS m")
      .createOrReplaceTempView(src)
    spark.sql(s"INSERT INTO gspi.$fact SELECT * FROM $src")
    spark.sql(
      s"INSERT INTO gspi.$dim SELECT count(*) AS n_month, m FROM $src GROUP BY m")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = spark.sql(
        s"""SELECT f.m, count(*) AS cnt,
           |  CAST(SUM(CAST(f.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |    AS total,
           |  MAX(d.n_month) AS n_month
           |FROM gspi.$fact f JOIN gspi.$dim d ON f.m = d.m
           |GROUP BY f.m ORDER BY f.m""".stripMargin)
      q.collect()
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      require(plan.contains("BatchScan"),
        s"identity SPJ gate expected the V2 batch scan, got:\n$plan")
      require(!plan.contains("Exchange hashpartitioning"),
        s"identity SPJ gate expected a shuffle-free join+agg, got:\n$plan")
      q
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private[ops] val tblSpjIdentitySql =
    """WITH src AS (
      | SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m') AS m
      | FROM orders),
      |d AS (SELECT m, COUNT(*) AS n_month FROM src GROUP BY m)
      |SELECT f.m, count(*) AS cnt,
      | CAST(SUM(CAST(f.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      | CAST(MAX(d.n_month) AS BIGINT) AS n_month
      |FROM src f JOIN d ON f.m = d.m
      |GROUP BY f.m ORDER BY f.m""".stripMargin

  /** Row-level change feed under the oracle (the Delta-CDF/Iceberg-
    * changelog surface): a four-commit lifecycle — two appends, a
    * merge-on-read tombstone batch, a copy-on-write predicate delete —
    * replayed as labeled net changes. The CoW commit also folds the
    * pending tombstones; those rows must NOT be re-reported (they were
    * already invisible at its parent), which is exactly what the
    * masked-read difference guarantees. Versions are rebased to
    * commit_seq so the oracle stays literal. */
  private[ops] def tblChangelog(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    // the final read goes through the SQL face (`t.changes` with
    // version-range read options) so the whole CDF surface sits under
    // the oracle; mutations run programmatically (the SQL mutation
    // paths have their own gates)
    spark.conf.set("spark.sql.catalog.gchg",
      classOf[graft.tables.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gchg.root", Scratch.dir("tbl-chlog"))
    val store = new TableStore(spark, Scratch.dir("tbl-chlog"))
    val tbl = s"orders_${Scratch.tag(dir).replace('.', '_')}"
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    store.create(tbl, ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    val v0 = store.currentVersion(tbl)
    store.append(tbl, ord.filter(col("o_orderkey") <= 7500L)) // seq 1
    store.append(tbl, ord.filter(col("o_orderkey") > 7500L))  // seq 2
    store.deleteMoR(tbl,                                      // seq 3
      ord.filter(col("o_custkey") % 50 === 0)
        .select(col("o_custkey")).distinct(),
      Seq("o_custkey"))
    // folds the pending tombstones first (seq 4, net-zero in the feed),
    // then commits the predicate delete (seq 5)
    store.delete(tbl, col("o_orderkey") % 31 === 0)
    spark.read.option("startVersion", v0)
      .table(s"gchg.$tbl.changes")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col(TableStore.ChangeTypeCol).as("change_type"),
        (col(TableStore.CommitVersionCol) - lit(v0)).as("commit_seq"))
      .orderBy("o_orderkey", "commit_seq", "change_type", "o_custkey",
        "o_totalprice")
  }

  private[ops] val tblChangelogSql =
    """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders)
      |SELECT o_orderkey, o_custkey, o_totalprice,
      |  'insert' AS change_type, 1 AS commit_seq
      |FROM o WHERE o_orderkey <= 7500
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_totalprice,
      |  'insert' AS change_type, 2 AS commit_seq
      |FROM o WHERE o_orderkey > 7500
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_totalprice,
      |  'delete' AS change_type, 3 AS commit_seq
      |FROM o WHERE o_custkey % 50 = 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_totalprice,
      |  'delete' AS change_type, 5 AS commit_seq
      |FROM o WHERE o_orderkey % 31 = 0 AND o_custkey % 50 <> 0
      |ORDER BY o_orderkey, commit_seq, change_type, o_custkey,
      |  o_totalprice""".stripMargin

  /** Atomic CTAS + RTAS through the SQL catalog
    * ([[graft.tables.GraftCatalog]] as a `StagingTableCatalog`): CREATE
    * TABLE AS SELECT materializes a per-segment rollup, then REPLACE
    * TABLE AS SELECT rebuilds the table FROM ITS OWN CURRENT CONTENT
    * (join back to the source) — the self-referencing replace only a
    * staged swap can serve, since Spark's non-staging fallback drops the
    * target before the replacement query runs. The oracle recomputes
    * the composed lifecycle. */
  private[ops] def tblSqlCtas(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gctas",
      classOf[graft.tables.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gctas.root", Scratch.dir("tbl-ctas"))
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"cust_$ident"
    val src = s"gctas_src_$ident"
    t(spark, dir, "customer")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .createOrReplaceTempView(src)
    spark.sql(s"DROP TABLE IF EXISTS gctas.$tbl")
    spark.sql(s"""CREATE TABLE gctas.$tbl AS
      SELECT c_mktsegment AS seg, count(*) AS cnt
      FROM $src GROUP BY c_mktsegment""")
    spark.sql(s"""REPLACE TABLE gctas.$tbl AS
      SELECT s.c_custkey, s.c_mktsegment AS seg, t0.cnt AS seg_cnt
      FROM $src s JOIN gctas.$tbl t0 ON s.c_mktsegment = t0.seg
      WHERE s.c_custkey % 10 = 0""")
    spark.sql(s"""SELECT c_custkey, seg, seg_cnt FROM gctas.$tbl
      ORDER BY c_custkey""")
  }

  /** Multi-level namespaces under the oracle: the reference's own
    * addressing is `catalog.namespace.table`
    * (DestinationConfig.java:130-132). A namespaced table is created,
    * loaded, renamed INTO a sibling namespace, and read back fully
    * qualified — plus a metadata-table probe on the namespaced name and
    * a CASCADE teardown of a scratch namespace, all in-gate. */
  private[ops] def tblNamespace(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gnsg",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-ns")
    spark.conf.set("spark.sql.catalog.gnsg.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"nation_$ident"
    val src = s"gnsg_src_$ident"
    t(spark, dir, "nation").createOrReplaceTempView(src)
    spark.sql(s"DROP NAMESPACE IF EXISTS gnsg.raw_$ident CASCADE")
    spark.sql(s"DROP NAMESPACE IF EXISTS gnsg.curated_$ident CASCADE")
    spark.sql(s"CREATE NAMESPACE gnsg.raw_$ident " +
      "WITH DBPROPERTIES ('tier'='bronze')")
    spark.sql(s"CREATE NAMESPACE gnsg.curated_$ident")
    spark.sql(s"""CREATE TABLE gnsg.raw_$ident.$tbl AS
      SELECT n_nationkey, n_name, n_regionkey FROM $src""")
    spark.sql(s"INSERT INTO gnsg.raw_$ident.$tbl " +
      s"SELECT n_nationkey + 1000, n_name, n_regionkey FROM $src")
    // promote: rename across namespaces, history intact
    spark.sql(s"ALTER TABLE gnsg.raw_$ident.$tbl RENAME TO curated_$ident.$tbl")
    val store = new TableStore(spark, root)
    require(store.exists(s"curated_$ident.$tbl") &&
      !store.exists(s"raw_$ident.$tbl"), "rename across namespaces failed")
    require(spark.sql(s"SELECT count(*) FROM gnsg.curated_$ident.$tbl.snapshots")
      .head().getLong(0) >= 2L, "metadata table on namespaced name failed")
    spark.sql(s"""SELECT n_nationkey, n_name, n_regionkey
      FROM gnsg.curated_$ident.$tbl WHERE n_nationkey < 1000
      ORDER BY n_nationkey""")
  }

  private[ops] val tblNamespaceSql =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin

  /** Persistent SQL views under the oracle: two managed tables, a view
    * joining them, a view ON the view (aggregation), all resolved through
    * the catalog at read time — plus an always-current probe (an INSERT
    * after view creation must show through). Created via
    * `CALL cat.system.create_view` (Spark 4.1 has no V2 CREATE VIEW
    * routing); read back as plain `SELECT ... FROM cat.view`. */
  private[ops] def tblSqlView(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gvwg",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-view")
    spark.conf.set("spark.sql.catalog.gvwg.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val (nat, reg) = (s"nation_$ident", s"region_$ident")
    val store = new TableStore(spark, root)
    Seq(nat, reg, s"vn_$ident", s"vsum_$ident").foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS gvwg.$n")
      store.dropView(n)
    }
    t(spark, dir, "nation").createOrReplaceTempView(s"gvwg_nat_$ident")
    t(spark, dir, "region").createOrReplaceTempView(s"gvwg_reg_$ident")
    spark.sql(s"CREATE TABLE gvwg.$nat AS SELECT * FROM gvwg_nat_$ident " +
      "WHERE n_nationkey < 20")
    spark.sql(s"CREATE TABLE gvwg.$reg AS SELECT * FROM gvwg_reg_$ident")
    spark.sql(s"CALL gvwg.system.create_view('vn_$ident', " +
      s"'SELECT n.n_nationkey, n.n_name, r.r_name FROM gvwg.$nat n " +
      s"JOIN gvwg.$reg r ON n.n_regionkey = r.r_regionkey')")
    spark.sql(s"CALL gvwg.system.create_view('vsum_$ident', " +
      s"'SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation " +
      s"FROM gvwg.vn_$ident GROUP BY r_name')")
    // always-current: rows appended AFTER view creation show through
    spark.sql(s"INSERT INTO gvwg.$nat " +
      s"SELECT n_nationkey, n_name, n_regionkey FROM gvwg_nat_$ident " +
      "WHERE n_nationkey >= 20")
    spark.sql(s"""SELECT r_name, n_nations, first_nation
      FROM gvwg.vsum_$ident ORDER BY r_name""")
  }

  private[ops] val tblSqlViewSql =
    """SELECT r.r_name, COUNT(*) AS n_nations, MIN(n.n_name) AS first_nation
      |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin

  private[ops] val tblSqlCtasSql =
    """WITH seg_counts AS (
      |  SELECT c_mktsegment AS seg, count(*) AS cnt
      |  FROM customer GROUP BY c_mktsegment)
      |SELECT c.c_custkey, c.c_mktsegment AS seg, sc.cnt AS seg_cnt
      |FROM customer c JOIN seg_counts sc ON c.c_mktsegment = sc.seg
      |WHERE c.c_custkey % 10 = 0
      |ORDER BY c_custkey""".stripMargin

  /** LIMIT / TopN pushdown under the oracle: orders lands zone-mapped on
    * `o_orderkey` across range-partitioned files, and `ORDER BY
    * o_orderkey LIMIT 100` plans against a FILE SUBSET chosen from zone
    * bounds + the per-file null ledger — partial pushdown, so Spark's
    * own TopN makes the answer exact while the scan schedules a handful
    * of splits instead of the table. Both prunes (plain LIMIT from row
    * counts, TopN from bounds) are require()d ENGAGED and strict inside
    * the gate; subset sufficiency is what the hash-match then proves.
    * At 100 TB this turns `LIMIT 100` from a full-table scan into a
    * couple of tasks. Per-file soundness details: LimitPushdownSpec. */
  private[ops] def tblLimitPushdown(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.catalog.glimit",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-limit")
    spark.conf.set("spark.sql.catalog.glimit.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    spark.sql(s"DROP TABLE IF EXISTS glimit.$tbl")
    spark.sql(s"""CREATE TABLE glimit.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
      TBLPROPERTIES ('zone_cols'='o_orderkey')""")
    val store = new graft.tables.TableStore(spark, root)
    store.append(tbl, t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartitionByRange(8, col("o_orderkey")))
    val files = store.currentRelPaths(tbl).size
    // plain LIMIT: a sufficient subset from recorded row counts alone
    graft.tables.TableStore.lastLimitPrune = None
    require(spark.sql(s"SELECT o_custkey FROM glimit.$tbl LIMIT 25")
      .count() == 25L, "LIMIT under-delivered")
    require(graft.tables.TableStore.lastLimitPrune.exists(_._2 < files),
      s"LIMIT pushdown did not prune: ${graft.tables.TableStore.lastLimitPrune}")
    // TopN: ordered-prefix subset from zone bounds (+ null ledger)
    graft.tables.TableStore.lastLimitPrune = None
    val q = spark.sql(
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM glimit.$tbl
         |ORDER BY o_orderkey LIMIT 100""".stripMargin)
    q.collect()
    require(graft.tables.TableStore.lastLimitPrune.exists(_._2 < files),
      s"TopN pushdown did not prune: ${graft.tables.TableStore.lastLimitPrune}")
    q
  }

  private[ops] val tblLimitPushdownSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_orderkey LIMIT 100""".stripMargin

  /** Snapshot rollback under the oracle (Iceberg `rollback_to_snapshot`
    * via `CALL`): orders lands, a predicate delete and a corrupting
    * overwrite-style mutation follow, and `rollback_to_version` restores
    * the pre-mutation snapshot as a FORWARD commit — monotonic versions
    * (require()d), rolled-away snapshots still time-travelable
    * (require()d), restored content hash-matching the plain table.
    * Mechanics (pending-MoR restoration, ancestry refusal, expiry
    * interplay) are spec-pinned in RollbackAnalyzeSpec. */
  private[ops] def tblRollback(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.grb",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-rollback")
    spark.conf.set("spark.sql.catalog.grb.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    spark.sql(s"DROP TABLE IF EXISTS grb.$tbl")
    spark.sql(s"""CREATE TABLE grb.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
      TBLPROPERTIES ('zone_cols'='o_orderkey')""")
    val store = new graft.tables.TableStore(spark, root)
    store.append(tbl, t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice"))
    val good = store.currentVersion(tbl)
    spark.sql(s"DELETE FROM grb.$tbl WHERE o_orderkey % 3 = 0")
    spark.sql(s"UPDATE grb.$tbl SET o_totalprice = 0.0 WHERE o_custkey < 500")
    val bad = store.currentVersion(tbl)
    spark.sql(s"CALL grb.system.rollback_to_version('$tbl', $good)")
    require(store.currentVersion(tbl) > bad,
      "rollback must be a forward commit, not a pointer rewind")
    require(spark.sql(
      s"SELECT * FROM grb.$tbl VERSION AS OF $bad").count() <
      spark.sql(s"SELECT * FROM grb.$tbl").count(),
      "rolled-away snapshot must stay time-travelable")
    spark.sql(s"""SELECT o_orderkey, o_custkey, o_totalprice
      FROM grb.$tbl ORDER BY o_orderkey, o_custkey, o_totalprice""")
  }

  private[ops] val tblRollbackSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin

  /** CBO column statistics under the oracle: customer lands as a managed
    * dim whose RAW size exceeds the broadcast threshold (require()d),
    * orders as the fact; with CBO on, the dim's metadata column stats —
    * NDV from the table-level HLL union, bounds from zone-map folds,
    * nullCount from the null ledger — let FilterEstimation shrink the
    * selectively-filtered dim below the threshold, and the planner picks
    * BroadcastHashJoin (require()d, AQE off so the PLANNER owns the
    * call). At 100 TB that estimate is a fact-table shuffle traded for a
    * broadcast. Result hash-matches DuckDB on the raw parquet; the
    * negative control (no CBO → shuffle join) is spec-pinned in
    * ColumnStatsSpec. */
  private[ops] def tblCboBroadcast(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.catalog.gcbo",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-cbo")
    spark.conf.set("spark.sql.catalog.gcbo.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val dim = s"customer_$ident"
    val fact = s"orders_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gcbo.$dim")
    spark.sql(s"DROP TABLE IF EXISTS gcbo.$fact")
    spark.sql(s"""CREATE TABLE gcbo.$dim (
      c_custkey BIGINT, c_name STRING, c_nationkey BIGINT,
      c_acctbal DOUBLE, c_mktsegment STRING)
      TBLPROPERTIES ('zone_cols'='c_custkey')""")
    spark.sql(s"""CREATE TABLE gcbo.$fact (
      o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)""")
    val store = new graft.tables.TableStore(spark, root)
    store.append(dim, t(spark, dir, "customer").select(
      "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    store.append(fact, t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice"))
    val dimBytes = store.scanSizeBytes(dim)
    val maxKey = store.columnRange(dim, "c_custkey")
      .map(_._2.asInstanceOf[Long]).getOrElse(
        sys.error("dim zone bounds missing"))
    val cut = math.max(1L, maxKey / 50) // ~2% of the key range survives
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      // raw dim is ~3x OVER the threshold; only the CBO-estimated
      // filtered dim fits under it
      "spark.sql.autoBroadcastJoinThreshold" -> (dimBytes / 3).toString)
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = spark.sql(
        s"""SELECT f.o_orderkey AS o_orderkey, d.c_custkey AS c_custkey,
           |  d.c_acctbal AS c_acctbal, f.o_totalprice AS o_totalprice
           |FROM gcbo.$fact f JOIN gcbo.$dim d ON f.o_custkey = d.c_custkey
           |WHERE d.c_custkey <= $cut
           |ORDER BY o_orderkey""".stripMargin)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains("BroadcastHashJoin"),
        s"CBO column stats should have won a broadcast join, got:\n$plan")
      q
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private[ops] val tblCboBroadcastSql =
    """SELECT f.o_orderkey AS o_orderkey, d.c_custkey AS c_custkey,
      |  d.c_acctbal AS c_acctbal, f.o_totalprice AS o_totalprice
      |FROM orders f JOIN customer d ON f.o_custkey = d.c_custkey
      |WHERE d.c_custkey <= (SELECT greatest(1, max(c_custkey) // 50) FROM customer)
      |ORDER BY o_orderkey""".stripMargin

  /** `add_files`/`migrate` under the oracle (the Iceberg migration
    * surface the reference inherits through its SparkCatalog): a plain
    * parquet corpus becomes a managed table via `CALL migrate` — adopted
    * BY REFERENCE (absolute manifest entries, zero bytes copied; both
    * require()d in-gate) — then a SQL CoW DELETE mutates the adopted
    * files as first-class data. At 100 TB, migration is one stats job
    * plus one metadata commit, never a corpus rewrite. Zero-copy,
    * stats, ownership, and refusal mechanics: AddFilesSpec. */
  private[ops] def tblAddFiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.catalog.gaf",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-addf")
    spark.conf.set("spark.sql.catalog.gaf.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val src = Scratch.dir("tbl-addf-src", Scratch.tag(dir))
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartitionByRange(6, col("o_orderkey"))
      .write.mode("overwrite").parquet(src)
    spark.sql(s"DROP TABLE IF EXISTS gaf.$tbl")
    val res = spark.sql(
      s"CALL gaf.system.migrate('$tbl', '$src', 'o_orderkey')").head()
    val store = new graft.tables.TableStore(spark, root)
    val rels = store.currentRelPaths(tbl)
    require(rels.nonEmpty && rels.forall(_.startsWith("/")),
      s"migrate must adopt by reference, got entries: ${rels.take(3)}")
    require(res.getLong(0) == rels.size.toLong,
      s"migrate reported ${res.getLong(0)} files, manifest has ${rels.size}")
    // adopted files are first-class: a SQL CoW delete rewrites them
    spark.sql(s"DELETE FROM gaf.$tbl WHERE o_orderkey % 7 = 0")
    spark.sql(s"""SELECT o_orderkey, o_custkey, o_totalprice
      FROM gaf.$tbl ORDER BY o_orderkey, o_custkey, o_totalprice""")
  }

  private[ops] val tblAddFilesSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders WHERE o_orderkey % 7 <> 0
      |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin

  /** PARTITIONED `add_files` under the oracle (Iceberg's
    * add_files(partition_filter)): a hive-layout orders corpus
    * (partitioned by o_orderstatus) adopts BY REFERENCE into a matching
    * identity-partitioned table — two of its three status directories
    * via partition_filter, metadata-only, zero copy (require()d) — and
    * the partition column re-attaches from the adopted paths' directory
    * names. Directory pruning on adopted files is require()d in-gate:
    * a status-equality scan lists only that directory's files. */
  private[ops] def tblAddFilesPartitioned(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.catalog.gafp",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-addfp")
    spark.conf.set("spark.sql.catalog.gafp.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val src = Scratch.dir("tbl-addfp-src", Scratch.tag(dir))
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .repartitionByRange(3, col("o_orderkey"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(src)
    spark.sql(s"DROP TABLE IF EXISTS gafp.$tbl")
    spark.sql(s"""CREATE TABLE gafp.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE,
      o_orderstatus STRING)
      PARTITIONED BY (o_orderstatus)
      TBLPROPERTIES ('zone_cols'='o_orderkey')""")
    val store = new graft.tables.TableStore(spark, root)
    val r1 = spark.sql(s"CALL gafp.system.add_files(`table` => '$tbl', " +
      s"source_dir => '$src', partition_filter => 'o_orderstatus=F')").head()
    val r2 = spark.sql(s"CALL gafp.system.add_files(`table` => '$tbl', " +
      s"source_dir => '$src', partition_filter => 'o_orderstatus=O')").head()
    require(r1.getLong(0) >= 1L && r2.getLong(0) >= 1L,
      "both filtered adoptions must add files")
    val rels = store.currentRelPaths(tbl)
    require(rels.forall(r => r.startsWith("/") &&
        (r.contains("o_orderstatus=F") || r.contains("o_orderstatus=O"))),
      s"by-reference hive entries expected, got: ${rels.take(3)}")
    require(!new java.io.File(s"$root/$tbl/data").exists() ||
        new java.io.File(s"$root/$tbl/data").listFiles().forall(f =>
          !f.getName.endsWith(".parquet")),
      "partitioned add_files must copy nothing")
    // directory pruning on adopted files: the 'F' scan lists only the
    // F directory's files
    val fOnly = store.read(tbl).filter(col("o_orderstatus") === "F")
    fOnly.collect()
    val (cand, scanned) = graft.tables.ZoneMapFileIndex.lastCountsOf(
      store.read(tbl).filter(col("o_orderstatus") === "F"))
    require(cand > 0 && scanned < cand,
      s"partition pruning on adopted files: scanned $scanned of $cand")
    spark.sql(s"""SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM gafp.$tbl
      ORDER BY o_orderkey, o_custkey, o_totalprice, o_orderstatus""")
  }

  private[ops] val tblAddFilesPartitionedSql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders WHERE o_orderstatus IN ('F', 'O')
      |ORDER BY o_orderkey, o_custkey, o_totalprice, o_orderstatus""".stripMargin

  /** Change-feed UPDATE PAIRING under the oracle (Iceberg
    * `create_changelog_view` identifier columns / Delta CDF pre- and
    * post-images): a SQL UPDATE's CoW commit surfaces as paired
    * `update_preimage`/`update_postimage` rows on the identifier
    * (`updateKeys=o_orderkey`), while a later plain append passes
    * through as unpaired 'insert' — proving the pairing window relabels
    * exactly the same-commit same-key delete+insert pairs and nothing
    * else. Doubling o_totalprice keeps the arithmetic float-exact on
    * both engines. NULL-key and non-unique-key mechanics:
    * ChangeFeedSpec. */
  private[ops] def tblChangelogUpdates(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    spark.conf.set("spark.sql.catalog.gchu",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-chupd")
    spark.conf.set("spark.sql.catalog.gchu.root", root)
    val store = new TableStore(spark, root)
    val tbl = s"orders_${Scratch.tag(dir).replace('.', '_')}"
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    store.create(tbl, ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append(tbl, ord.filter(col("o_orderkey") <= 10000L))
    val v1 = store.currentVersion(tbl)
    spark.sql(                                                 // seq 1
      s"UPDATE gchu.$tbl SET o_totalprice = o_totalprice * 2 " +
        "WHERE o_custkey % 10 = 0")
    store.append(tbl, ord.filter(col("o_orderkey") > 10000L))  // seq 2
    spark.read.option("startVersion", v1)
      .option("updateKeys", "o_orderkey")
      .table(s"gchu.$tbl.changes")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col(TableStore.ChangeTypeCol).as("change_type"),
        (col(TableStore.CommitVersionCol) - lit(v1)).as("commit_seq"))
      .orderBy("o_orderkey", "commit_seq", "change_type", "o_custkey",
        "o_totalprice")
  }

  /** Storage-partitioned join over a MIXED hidden layout under the
    * oracle — the time-series CDC shape: two event tables laid out
    * `days(ts), bucket(8, user_id)`, joined on user_id ALONE with
    * Spark's subset-of-partition-keys SPJ trio enabled
    * (allowJoinKeysSubsetOfPartitionKeys + pushPartValues +
    * requireAllClusterKeysForCoPartition=false — the Iceberg SPJ
    * recipe). The join and aggregate must add ZERO hash exchanges
    * (require()d on the final adaptive plan): the temporal transform
    * rides along as extra partition metadata while the bucket field
    * carries the co-partitioning. Both ts columns stay PROJECTED —
    * Spark resolves the reported days(ts) transform against the pruned
    * scan output, so dropping ts would drop the partitioning (the same
    * constraint Iceberg SPJ has). */
  private[ops] def tblSpjTemporal(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gspt",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-spjt")
    spark.conf.set("spark.sql.catalog.gspt.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val views = s"views_$ident"
    val clicks = s"clicks_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gspt.$views")
    spark.sql(s"DROP TABLE IF EXISTS gspt.$clicks")
    // hash write distribution: without it every task writes into every
    // (day, bucket) dir it holds rows for — tiny-file spray that then
    // dominates the join's scan time (the property exists for exactly
    // this layout)
    for (tbl <- Seq(views, clicks))
      spark.sql(s"""CREATE TABLE gspt.$tbl (
        event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE)
        PARTITIONED BY (days(ts), bucket(4, user_id))
        TBLPROPERTIES ('write.distribution-mode'='hash')""")
    val src = s"gspt_events_$ident"
    t(spark, dir, "events").select("event_id", "ts", "user_id",
      "event_type", "value").createOrReplaceTempView(src)
    spark.sql(s"""INSERT INTO gspt.$views SELECT event_id, ts, user_id,
      value FROM $src WHERE event_type = 'view'""")
    spark.sql(s"""INSERT INTO gspt.$clicks SELECT event_id, ts, user_id,
      value FROM $src WHERE event_type = 'click'""")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing" +
        ".allowJoinKeysSubsetOfPartitionKeys.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = spark.sql(
        s"""SELECT v.event_id AS v_id, c.event_id AS c_id,
           |  v.user_id AS user_id,
           |  unix_micros(v.ts) AS v_us, unix_micros(c.ts) AS c_us
           |FROM gspt.$views v JOIN gspt.$clicks c
           |  ON v.user_id = c.user_id
           |WHERE v.event_id % 5 = 0 AND c.event_id % 7 = 0
           |ORDER BY v_id, c_id""".stripMargin)
      q.collect()
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      require(plan.contains("BatchScan"),
        s"temporal SPJ gate expected the V2 batch scan, got:\n$plan")
      require(!plan.contains("Exchange hashpartitioning"),
        s"temporal SPJ gate expected a shuffle-free join, got:\n$plan")
      q
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private[ops] val tblSpjTemporalSql =
    """SELECT v.event_id AS v_id, c.event_id AS c_id,
      |  v.user_id AS user_id,
      |  CAST(EPOCH_US(v.ts) AS BIGINT) AS v_us,
      |  CAST(EPOCH_US(c.ts) AS BIGINT) AS c_us
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON v.user_id = c.user_id
      |WHERE v.event_id % 5 = 0 AND c.event_id % 7 = 0
      |ORDER BY v_id, c_id""".stripMargin

  /** Column DEFAULT values under the oracle (Iceberg-v3 initial/write
    * defaults on Spark's CURRENT_DEFAULT/EXISTS_DEFAULT metadata): half
    * of orders lands BEFORE `ADD COLUMN band INT DEFAULT -1`, half
    * after with an explicit computed band, and one slice inserts
    * omitting the column (write-default resolution). Pre-evolution
    * files read -1 back WITHOUT any rewrite — at 100 TB an existence
    * default is the only sane way to add a non-null-semantics column.
    * Mechanics (explicit NULL survival, SET/DROP DEFAULT, lifecycle
    * interplay): DefaultsSpec. */
  private[ops] def tblDefaults(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gdf",
      classOf[graft.tables.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdf.root", Scratch.dir("tbl-dflt"))
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val src = s"gdf_src_$ident"
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .createOrReplaceTempView(src)
    spark.sql(s"DROP TABLE IF EXISTS gdf.$tbl")
    spark.sql(s"""CREATE TABLE gdf.$tbl (
      o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)""")
    spark.sql(s"""INSERT INTO gdf.$tbl
      SELECT * FROM $src WHERE o_orderkey <= 7500""")
    spark.sql(s"ALTER TABLE gdf.$tbl ADD COLUMN band INT DEFAULT -1")
    spark.sql(s"""INSERT INTO gdf.$tbl
      SELECT o_orderkey, o_custkey, o_totalprice,
        CAST(FLOOR(o_totalprice / 50000.0) AS INT)
      FROM $src WHERE o_orderkey > 7500 AND o_orderkey % 2 = 0""")
    // omitted column resolves the write default at INSERT time
    spark.sql(s"""INSERT INTO gdf.$tbl (o_orderkey, o_custkey, o_totalprice)
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM $src WHERE o_orderkey > 7500 AND o_orderkey % 2 = 1""")
    spark.sql(s"""SELECT o_orderkey, o_custkey, o_totalprice, band
      FROM gdf.$tbl ORDER BY o_orderkey, o_custkey, o_totalprice""")
  }

  private[ops] val tblDefaultsSql =
    """SELECT o_orderkey, o_custkey, o_totalprice,
      |  CASE WHEN o_orderkey > 7500 AND o_orderkey % 2 = 0
      |       THEN CAST(FLOOR(o_totalprice / 50000.0) AS INT)
      |       ELSE -1 END AS band
      |FROM orders
      |ORDER BY o_orderkey, o_custkey, o_totalprice""".stripMargin

  /** DYNAMIC partition overwrite under the oracle — the idempotent
    * backfill primitive: events land in a `days(ts)`-partitioned table,
    * then one day's pipeline "re-runs" (its values doubled) through
    * `INSERT OVERWRITE` in dynamic mode, which must replace exactly
    * that day's directories in ONE commit (require()d) while every
    * other day's files are carried untouched (require()d by rel-path
    * identity). Runs as a true distributed V2 staged write — Spark has
    * no V1 fallback for dynamic overwrite. */
  private[ops] def tblDynamicOverwrite(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gdo",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-dynov")
    spark.conf.set("spark.sql.catalog.gdo.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"events_$ident"
    val src = s"gdo_src_$ident"
    t(spark, dir, "events").select("event_id", "ts", "user_id", "value")
      .createOrReplaceTempView(src)
    spark.sql(s"DROP TABLE IF EXISTS gdo.$tbl")
    spark.sql(s"""CREATE TABLE gdo.$tbl (
      event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE)
      PARTITIONED BY (days(ts))""")
    spark.sql(s"INSERT INTO gdo.$tbl SELECT * FROM $src")
    val store = new graft.tables.TableStore(spark, root)
    val vBefore = store.currentVersion(tbl)
    // the day with the most events is the one being "re-run"
    val hotDay = spark.sql(s"""SELECT CAST(ts AS DATE) AS d FROM $src
      GROUP BY 1 ORDER BY count(*) DESC, d LIMIT 1""").head().getDate(0)
    val untouchedBefore = store.currentRelPaths(tbl)
      .filterNot(_.contains(s"ts_day=$hotDay")).sorted
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try spark.sql(s"""INSERT OVERWRITE gdo.$tbl
      SELECT event_id, ts, user_id, value * 2
      FROM $src WHERE CAST(ts AS DATE) = DATE'$hotDay'""")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    require(store.currentVersion(tbl) == vBefore + 1,
      "dynamic overwrite must be ONE atomic commit")
    val untouchedAfter = store.currentRelPaths(tbl)
      .filterNot(_.contains(s"ts_day=$hotDay")).sorted
    require(untouchedAfter == untouchedBefore,
      "untouched partitions must carry their exact files")
    spark.sql(s"""SELECT event_id, user_id, value FROM gdo.$tbl
      ORDER BY event_id, user_id, value""")
  }

  private[ops] val tblDynamicOverwriteSql =
    """WITH hot AS (
      |  SELECT CAST(ts AS DATE) AS d FROM events
      |  GROUP BY 1 ORDER BY count(*) DESC, d LIMIT 1)
      |SELECT event_id, user_id,
      |  CASE WHEN CAST(ts AS DATE) = (SELECT d FROM hot)
      |       THEN value * 2 ELSE value END AS value
      |FROM events
      |ORDER BY event_id, user_id, value""".stripMargin

  /** `t.partitions` under the oracle (Iceberg's partitions metadata
    * table): per-partition row totals of a `days(ts)` table answered
    * ENTIRELY from the consolidated manifest — zero file listings, zero
    * footer reads (at 100 TB, partition accounting must be a metadata
    * lookup). A CoW delete mutates the table first so the summary
    * proves itself against post-rewrite manifests, and file/byte
    * sanity is require()d in-gate (counts aren't oracle-stable — task
    * splits move them). */
  private[ops] def tblPartitionsMeta(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.catalog.gpm",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-pmeta")
    spark.conf.set("spark.sql.catalog.gpm.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"events_$ident"
    val src = s"gpm_src_$ident"
    t(spark, dir, "events").select("event_id", "ts", "user_id", "value")
      .createOrReplaceTempView(src)
    spark.sql(s"DROP TABLE IF EXISTS gpm.$tbl")
    spark.sql(s"""CREATE TABLE gpm.$tbl (
      event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE)
      PARTITIONED BY (days(ts))""")
    spark.sql(s"INSERT INTO gpm.$tbl SELECT * FROM $src")
    spark.sql(s"DELETE FROM gpm.$tbl WHERE event_id % 13 = 0")
    val meta = spark.sql(s"SELECT * FROM gpm.$tbl.partitions").collect()
    require(meta.nonEmpty && meta.forall(r =>
      r.getLong(1) >= 1L && !r.isNullAt(2) && !r.isNullAt(3) &&
        r.getLong(3) > 0L),
      s"partitions meta must report files/rows/bytes for every " +
        s"partition, got: ${meta.take(3).mkString(", ")}")
    spark.sql(s"""SELECT partition, row_count
      FROM gpm.$tbl.partitions ORDER BY partition""")
  }

  private[ops] val tblPartitionsMetaSql =
    """SELECT 'ts_day=' || COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR),
      |    '__HIVE_DEFAULT_PARTITION__') AS partition,
      |  COUNT(*) AS row_count
      |FROM events WHERE event_id % 13 <> 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Variant shredding under the oracle: orders rows wrap into a
    * schemaless JSON `payload` column (the reference's CDC payload
    * shape, opencdc.proto:96), with two SHREDDED paths declared before
    * load ([[graft.tables.TableStore.addVariantShred]]) — `$.cust` and
    * `$.status` materialize as typed, zone-indexed physical columns at
    * write. The query filters on the shreds (typed comparison, no JSON
    * parse, file-skippable) and extracts a NON-shredded nested path at
    * runtime. The oracle bypasses the JSON round-trip entirely and
    * selects the original columns — exactly the contract shredding
    * must keep: extraction equals the source values. */
  private[ops] def tblVariant(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, get_json_object, struct, to_json}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val store = new TableStore(spark,
      Scratch.dir("tbl-variant", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders").select(
      col("o_orderkey"),
      to_json(struct(
        col("o_custkey").as("cust"),
        col("o_orderstatus").as("status"),
        struct(col("o_orderpriority").as("pri")).as("meta"))).as("payload"))
    store.create("orders_v", StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("payload", StringType))), overwrite = true)
    store.addVariantShred("orders_v", "payload", "$.cust", "cust", LongType)
    store.addVariantShred("orders_v", "payload", "$.status", "status",
      StringType)
    store.append("orders_v", ord.repartitionByRange(8, col("o_orderkey")))
    store.read("orders_v")
      .filter(col("cust") % 10 === 0 && col("status") === "F")
      .select(col("o_orderkey"), col("cust"), col("status"),
        get_json_object(col("payload"), "$.meta.pri").as("pri"))
      .orderBy("o_orderkey")
  }

  private[ops] val tblVariantSql =
    """SELECT o_orderkey, o_custkey AS cust, o_orderstatus AS status,
      |  o_orderpriority AS pri
      |FROM orders WHERE o_custkey % 10 = 0 AND o_orderstatus = 'F'
      |ORDER BY o_orderkey""".stripMargin

  /** Policy-driven delete maintenance through the SQL CALL surface
    * ([[graft.tables.TableStore.maintainDeletes]]): a merge-on-read
    * table accumulates six equality tombstone commits, and
    * `maintain_deletes` ACTS on the `t.deletes` signal — entry count
    * over budget merges the sidecars (`rewrite`, metadata-only, no data
    * file touched), byte pressure against the SPJ mask budget folds
    * them into data files (`materialize`, pending → 0), and a clean
    * table reports `none` (idempotence). The reference's runtime ships
    * the knobs as separate Spark procedures and leaves the policy to an
    * operator; at 100 TB the signal→action loop is the part that has to
    * be automatic. The read-back after both actions hash-matches DuckDB
    * on the raw parquet — maintenance must never change visible rows. */
  private[ops] def tblMaintain(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.catalog.gmnt",
      classOf[graft.tables.GraftCatalog].getName)
    // UNTAGGED root (corpus identity lives in the table name): Spark
    // caches the catalog instance per session with the root it saw at
    // initialize, so a corpus-tagged root breaks the second corpus the
    // same session touches (bench warms at sf0.001 then times sf0.1)
    val root = Scratch.dir("tbl-maint")
    spark.conf.set("spark.sql.catalog.gmnt.root", root)
    val store = new TableStore(spark, root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    store.create(tbl, ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append(tbl, ord.repartitionByRange(4, col("o_orderkey")))
    val filesBefore = store.currentRelPaths(tbl).size
    (0 until 6).foreach { i =>
      store.deleteMoR(tbl,
        ord.filter(col("o_orderkey") % 7 === i).select("o_orderkey"),
        Seq("o_orderkey"))
    }
    require(store.pendingDeletes(tbl) == 6)
    // entries over budget, bytes under: REWRITE — data files untouched
    val r1 = spark.sql(s"CALL gmnt.system.maintain_deletes(" +
      s"`table` => '$tbl', max_entries => 4)").head()
    require(r1.getString(0) == "rewrite" && r1.getLong(2) < r1.getLong(1),
      s"expected a sidecar merge, got $r1")
    require(store.currentRelPaths(tbl).size == filesBefore,
      "rewrite must not touch data files")
    // byte pressure: MATERIALIZE — deletes fold, pending drops to zero
    val r2 = spark.sql(s"CALL gmnt.system.maintain_deletes(" +
      s"`table` => '$tbl', max_bytes => CAST(1 AS BIGINT))").head()
    require(r2.getString(0) == "materialize" && r2.getLong(2) == 0L,
      s"expected a fold to zero pending entries, got $r2")
    require(store.pendingDeletes(tbl) == 0)
    // clean table: NONE (idempotent)
    val r3 = spark.sql(s"CALL gmnt.system.maintain_deletes(" +
      s"`table` => '$tbl')").head()
    require(r3.getString(0) == "none", s"expected a no-op, got $r3")
    spark.sql(s"""SELECT count(*) AS cnt,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        count(DISTINCT o_custkey) AS custs
      FROM gmnt.$tbl WHERE o_orderkey % 2 = 1""")
  }

  private[ops] val tblMaintainSql =
    """SELECT count(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  count(DISTINCT o_custkey) AS custs
      |FROM orders
      |WHERE o_orderkey % 7 = 6 AND o_orderkey % 2 = 1""".stripMargin

  private[ops] val tblChangelogUpdatesSql =
    """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders)
      |SELECT o_orderkey, o_custkey, o_totalprice,
      |  'update_preimage' AS change_type, 1 AS commit_seq
      |FROM o WHERE o_orderkey <= 10000 AND o_custkey % 10 = 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice,
      |  'update_postimage' AS change_type, 1 AS commit_seq
      |FROM o WHERE o_orderkey <= 10000 AND o_custkey % 10 = 0
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_totalprice,
      |  'insert' AS change_type, 2 AS commit_seq
      |FROM o WHERE o_orderkey > 10000
      |ORDER BY o_orderkey, commit_seq, change_type, o_custkey,
      |  o_totalprice""".stripMargin

  /** Multi-table ATOMIC transaction under the oracle
    * ([[graft.tables.TableStore.transaction]] — the Iceberg REST
    * `CommitTransaction` shape the reference lacks even single-table,
    * `README.md:74-77`): a CDC-fan-out pattern writes facts AND their
    * derived per-status rollup in ONE transaction — remaining orders
    * append to the fact table while the rollup is deleted and rebuilt
    * from the transaction's OWN buffered view of the facts
    * (read-your-writes). The returned frame joins the committed rollup
    * against a fresh recount of the committed facts, so the hash match
    * proves the two tables published consistently; atomicity under
    * conflict/abort is pinned in TransactionSpec. */
  private[ops] def tblTxn(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val store = new TableStore(spark,
      Scratch.dir("tbl-txn", Scratch.tag(dir)))
    val o = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    def rollupOf(df: DataFrame): DataFrame =
      df.groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"),
        Dets.dsum(col("o_totalprice")).as("total"))
    val seed = o.filter(col("o_orderkey") % 3 =!= 0)
    store.create("facts", o.schema, overwrite = true)
    store.create("rollup", rollupOf(seed).schema, overwrite = true)
    store.append("facts", seed)
    store.append("rollup", rollupOf(seed))
    store.transaction { tx =>
      tx.append("facts", o.filter(col("o_orderkey") % 3 === 0))
      tx.delete("rollup", lit(true))
      tx.append("rollup", rollupOf(tx.read("facts")))
    }
    val recount = rollupOf(store.read("facts"))
      .withColumnRenamed("cnt", "cnt2").withColumnRenamed("total", "total2")
    store.read("rollup").join(recount, "o_orderstatus")
      .select("o_orderstatus", "cnt", "total", "cnt2", "total2")
      .orderBy("o_orderstatus")
  }

  private[ops] val tblTxnSql =
    """SELECT o_orderstatus, count(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  count(*) AS cnt2,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total2
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Write-time sort order under the oracle (`write.sort-order` +
    * `write.distribution-mode=range`, the Iceberg write properties):
    * lineitem lands through a range shuffle keyed on the declared sort
    * column and a local sort within each task, so file zone ranges on
    * `l_orderkey` are near-disjoint WITHOUT any compaction pass. The
    * key-range read that the gate hash-matches is served by a pruned
    * scan — the in-gate require() pins that a thin key range touches a
    * strict minority of the files (pruning effectiveness ratios are
    * spec-pinned in SortOrderSpec). */
  private[ops] def tblSortedWrite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val store = new TableStore(spark,
      Scratch.dir("tbl-sortw", Scratch.tag(dir)))
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    store.create("lineitem_s", li.schema, overwrite = true,
      zoneCols = Seq("l_orderkey"))
    store.setProperties("lineitem_s", Map(
      "write.distribution-mode" -> Some("range"),
      "write.sort-order" -> Some("l_orderkey")))
    // write from a deliberately key-shuffled input: the layout must come
    // from the table's write properties, not the source ordering
    store.append("lineitem_s",
      li.repartition(8, col("l_partkey")))
    val q = store.read("lineitem_s")
      .filter(col("l_orderkey") >= 100L && col("l_orderkey") <= 400L)
    val (total, scanned) = graft.tables.ZoneMapFileIndex.lastCountsOf(q)
    if (total > 1) require(scanned * 2 <= total,
      s"sorted write should prune a thin key range to a minority of " +
        s"files; scanned $scanned of $total")
    q.groupBy("l_orderkey")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("items"),
        Dets.dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("l_orderkey")
  }

  private[ops] val tblSortedWriteSql =
    """SELECT l_orderkey, count(*) AS items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_orderkey BETWEEN 100 AND 400
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey""".stripMargin

  /** Bin-pack small-file compaction under the oracle
    * ([[graft.tables.TableStore.compactSmallFiles]] — Iceberg's
    * `rewrite_data_files` binpack strategy, the routine-maintenance
    * shape [[graft.tables.TableStore.compact]]'s full rewrite is not):
    * one right-sized load followed by eight tiny CDC-style appends,
    * then ONE pack that must rewrite exactly the eight fragments while
    * the big file survives byte-identical (rel path require()d live).
    * Read-back hash-matches DuckDB on the raw parquet — packing must
    * never change visible rows. Mask folding, partition-dir scoping,
    * lineage carry and idempotence are spec-pinned in BinpackSpec. */
  private[ops] def tblBinpack(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val store = new TableStore(spark,
      Scratch.dir("tbl-binpack", Scratch.tag(dir)))
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    store.create("orders_bp", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    val bulk = ord.filter(col("o_orderkey") % 9 =!= 0)
    store.append("orders_bp", bulk.coalesce(2))
    val bulkRels = store.currentRelPaths("orders_bp").toSet
    (0 until 8).foreach { i =>
      store.append("orders_bp",
        ord.filter(col("o_orderkey") % 9 === 0 &&
          col("o_orderkey") % 8 === i).coalesce(1))
    }
    // target sized AT the bulk files (which vary with the corpus SF):
    // they are "right-sized" by definition, the 1/72-of-the-data
    // fragments fall under the 3/4 threshold at every scale
    val dataDir = Scratch.dir("tbl-binpack", Scratch.tag(dir),
      "orders_bp", "data")
    val targetBytes = bulkRels
      .map(r => new java.io.File(dataDir, r).length()).min
    // zero-row appends commit no file (tiny corpora may yield < 8
    // fragments) — the pack must rewrite exactly the fragments present
    val fragCount =
      store.currentRelPaths("orders_bp").toSet.diff(bulkRels).size
    val (rewritten, written) =
      store.compactSmallFiles("orders_bp", targetBytes = targetBytes)
    if (fragCount >= 2) require(rewritten == fragCount && written < fragCount,
      s"expected the $fragCount fragments to pack, got ($rewritten, $written)")
    require(bulkRels.subsetOf(store.currentRelPaths("orders_bp").toSet),
      "right-sized files must survive a bin-pack untouched")
    store.read("orders_bp")
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"),
        Dets.dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderstatus")
  }

  private[ops] val tblBinpackSql =
    """SELECT o_orderstatus, count(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Incrementally-maintained MATERIALIZED VIEW under the oracle: two
    * thirds of orders load, `CALL create_mview` materializes per-status
    * count + decimal-exact sum + min/max key, then the source takes an
    * APPEND (the held-back third) and a CoW DELETE (which breaks min/max
    * monotonicity → the dirty-group repair path) — each folded by `CALL
    * refresh_mview` reading only the CHANGE FEED, require()d incremental
    * (and a final no-op require()d "none"). The oracle reconstructs the
    * final state as one pure GROUP BY — value-exact including the
    * decimal sums, proving delta maintenance ≡ recompute on real data.
    * At 100 TB this is the difference between folding one CDC batch and
    * re-scanning the table per refresh. */
  private[ops] def tblMview(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.catalog.gmvw",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-mview")
    spark.conf.set("spark.sql.catalog.gmvw.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val mv = s"mv_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gmvw.$mv")
    spark.sql(s"DROP TABLE IF EXISTS gmvw.$tbl")
    spark.sql(s"""CREATE TABLE gmvw.$tbl (
      o_orderkey BIGINT, o_orderstatus STRING,
      o_totalprice DECIMAL(18,2))""")
    val src = s"gmvw_src_$ident"
    t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
      .createOrReplaceTempView(src)
    spark.sql(
      s"INSERT INTO gmvw.$tbl SELECT * FROM $src WHERE o_orderkey % 3 <> 0")
    val c = spark.sql(s"CALL gmvw.system.create_mview(mview => '$mv', " +
      s"source => '$tbl', group_cols => 'o_orderstatus', " +
      "aggs => 'sum:o_totalprice,min:o_orderkey,max:o_orderkey')").head()
    require(c.getLong(0) >= 1L, "the view materializes at least one group")
    // append the held-back third, fold it from the feed
    spark.sql(
      s"INSERT INTO gmvw.$tbl SELECT * FROM $src WHERE o_orderkey % 3 = 0")
    val r1 = spark.sql(
      s"CALL gmvw.system.refresh_mview(mview => '$mv')").head()
    require(r1.getString(3) == "incremental" && r1.getLong(0) >= 1L,
      s"append must fold incrementally, got $r1")
    // CoW delete touching most groups' min keys. The COST-BASED
    // refresh picks its plan from metadata: a table-wide rewrite scope
    // recomputes (full-auto), a pruned one folds deltas — either way
    // the oracle must match. The forced-delta plan is value-pinned in
    // MaterializedViewSpec; the policy itself in its cost test.
    spark.sql(s"DELETE FROM gmvw.$tbl WHERE o_orderkey % 7 = 0")
    val r2 = spark.sql(
      s"CALL gmvw.system.refresh_mview(mview => '$mv')").head()
    require(Set("incremental", "full-auto")(r2.getString(3)),
      s"delete must fold (either plan), got $r2")
    val r3 = spark.sql(
      s"CALL gmvw.system.refresh_mview(mview => '$mv')").head()
    require(r3.getString(3) == "none", s"up-to-date view re-folds: $r3")
    spark.sql(s"""SELECT o_orderstatus, cnt,
      CAST(sum_o_totalprice AS DOUBLE) AS sum_price,
      min_o_orderkey AS min_key, max_o_orderkey AS max_key
      FROM gmvw.$mv ORDER BY o_orderstatus""")
  }

  private[ops] val tblMviewSql =
    """SELECT o_orderstatus, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM orders WHERE o_orderkey % 7 <> 0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** TRANSPARENT materialized-view consumption under the oracle: the
    * user's plain `GROUP BY` SQL — never naming the view — plans onto a
    * FRESH MV ([[graft.tables.MvRewriteRule]]) with ZERO source data
    * files read (require()d: no V2 source scan survives optimization;
    * the only file relation is the view's), a STALE view provably falls
    * back to the scan (require()d after the source moves ahead), and a
    * `CALL refresh_mview` re-arms the rewrite. The compared output runs
    * through the REWRITTEN plan, so the DuckDB oracle certifies the
    * served values — count, decimal-exact sum, IEEE-exact avg (exact
    * integer sum ÷ count, one double division in both engines), min and
    * max — not just the plan shape. At 100 TB this is the payoff of
    * maintaining the view: dashboards keep their SQL and stop paying
    * the source scan whenever the view is current. */
  private[ops] def tblMviewRewrite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    import org.apache.spark.sql.functions.col
    spark.conf.set("spark.sql.catalog.gmvr",
      classOf[graft.tables.GraftCatalog].getName)
    val root = Scratch.dir("tbl-mview-rewrite")
    spark.conf.set("spark.sql.catalog.gmvr.root", root)
    val ident = Scratch.tag(dir).replace('.', '_')
    val tbl = s"orders_$ident"
    val mv = s"mvr_$ident"
    spark.sql(s"DROP TABLE IF EXISTS gmvr.$mv")
    spark.sql(s"DROP TABLE IF EXISTS gmvr.$tbl")
    spark.sql(s"""CREATE TABLE gmvr.$tbl (
      o_orderkey BIGINT, o_orderstatus STRING,
      o_totalprice DECIMAL(18,2))""")
    val src = s"gmvr_src_$ident"
    t(spark, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
      .createOrReplaceTempView(src)
    spark.sql(
      s"INSERT INTO gmvr.$tbl SELECT * FROM $src WHERE o_orderkey % 3 <> 0")
    spark.sql(s"CALL gmvr.system.create_mview(mview => '$mv', " +
      s"source => '$tbl', group_cols => 'o_orderstatus', " +
      "aggs => 'sum:o_totalprice,avg:o_orderkey,min:o_orderkey," +
      "max:o_orderkey')")
    // avg over BIGINT spelled as exact-sum ÷ count: Spark's avg() on
    // integral input accumulates in DOUBLE, which the view's exact Long
    // sum is NOT guaranteed bit-equal to — the rule refuses that map
    // (avg serves only decimal inputs), and the explicit spelling both
    // engines compute identically ALSO exercises the generalized
    // scalar-over-aggregates matching (cast + divide re-applied over
    // the substituted view columns)
    val q = s"""SELECT o_orderstatus, count(*) AS cnt,
      CAST(sum(o_totalprice) AS DOUBLE) AS sum_price,
      CAST(sum(o_orderkey) AS DOUBLE) / count(o_orderkey) AS avg_key,
      min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
      FROM gmvr.$tbl GROUP BY o_orderstatus ORDER BY o_orderstatus"""
    def scansSource(df: DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectFirst {
        case s: DataSourceV2ScanRelation => s }.nonEmpty
    def requireServed(df: DataFrame): Unit = {
      require(!scansSource(df),
        "a FRESH view must serve the plain GROUP BY — no source scan")
      val roots = df.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      }.flatten
      require(roots.nonEmpty && roots.forall(_.contains(s"/$mv/")),
        s"the rewritten plan must read ONLY the view's files, got $roots")
    }
    requireServed(spark.sql(q))
    // the source moves ahead: the SAME SQL text must fall back to the
    // scan (and see the rows the view does not hold) — staleness can
    // never change results, only whether the shortcut applies
    spark.sql(
      s"INSERT INTO gmvr.$tbl SELECT * FROM $src WHERE o_orderkey % 3 = 0")
    val stale = spark.sql(q)
    require(scansSource(stale), "a STALE view must never serve the query")
    val r = spark.sql(
      s"CALL gmvr.system.refresh_mview(mview => '$mv')").head()
    require(r.getString(3) == "incremental" && r.getLong(0) >= 1L,
      s"the append folds incrementally, got $r")
    val served = spark.sql(q)
    requireServed(served)
    served
  }

  private[ops] val tblMviewRewriteSql =
    """SELECT o_orderstatus, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price,
      |  CAST(SUM(o_orderkey) AS DOUBLE) / COUNT(o_orderkey) AS avg_key,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM orders
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
}
