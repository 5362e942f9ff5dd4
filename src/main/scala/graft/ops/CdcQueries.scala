package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc._
import graft.tables.TableStore
import Tables.t

/** End-to-end CDC-apply exercised through the correctness gate: seed a
  * managed table from `customer`, apply a batch of OpenCDC records
  * (insert/update/delete + a late delete overriding an earlier update —
  * last-write-wins), read the table back. The oracle reproduces the net
  * effect in pure ANSI SQL, so the whole decode→net→atomic-commit path is
  * hash-checked against DuckDB.
  */
object CdcQueries {

  private def cdcApplyCustomer(spark: SparkSession, dir: String): DataFrame = {
    val store = new TableStore(spark, Scratch.dir("cdc-demo", Scratch.tag(dir)))
    val cust = t(spark, dir, "customer")
    store.create("customer", cust.schema, overwrite = true,
      zoneCols = Seq("c_custkey"))
    store.append("customer", cust)

    def key(id: Long) = Some(RawData(s"""{"c_custkey": $id}"""): CdcData)
    def row(id: Long, name: String, nat: Int, bal: Double, seg: String) =
      Some(RawData(
        s"""{"c_custkey": $id, "c_name": "$name", "c_nationkey": $nat,
           | "c_acctbal": $bal, "c_mktsegment": "$seg"}""".stripMargin): CdcData)

    val batch = Seq(
      // inserts (CREATE + SNAPSHOT routing, SparkDestinationStream.java:94-108)
      CdcRecord(Array(1), CdcOp.Create, key = key(900000001L),
        after = row(900000001L, "NEW#A", 3, 10.5, "MACHINERY")),
      CdcRecord(Array(2), CdcOp.Snapshot, key = key(900000002L),
        after = row(900000002L, "NEW#B", 4, -1.25, "HOUSEHOLD")),
      // update = new full row for an existing key
      CdcRecord(Array(3), CdcOp.Update, key = key(1L),
        after = row(1L, "UPDATED#1", 7, 999.99, "BUILDING")),
      // plain delete
      CdcRecord(Array(4), CdcOp.Delete, key = key(2L)),
      // update then delete on the same key — the delete must win
      CdcRecord(Array(5), CdcOp.Update, key = key(3L),
        after = row(3L, "SHOULD_NOT_SURVIVE", 1, 0.0, "BUILDING")),
      CdcRecord(Array(6), CdcOp.Delete, key = key(3L)))

    CdcApply(spark, store, CdcApply.CdcConfig("customer", Seq("c_custkey")), batch)
    store.read("customer").orderBy("c_custkey")
  }

  // every touched key is excluded from the base scan — inserts REPLACE any
  // pre-existing row with the same key (upsert semantics), which only shows
  // on corpora where the sentinel keys exist (e.g. MakeScale 10× data; on
  // the driver fixtures the two NEW keys are absent and NOT IN is a no-op)
  private val cdcApplyCustomerSql =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM (
      | SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      | FROM customer
      | WHERE c_custkey NOT IN (1, 2, 3, 900000001, 900000002)
      | UNION ALL SELECT CAST(1 AS BIGINT), 'UPDATED#1', CAST(7 AS INT), CAST(999.99 AS DOUBLE), 'BUILDING'
      | UNION ALL SELECT CAST(900000001 AS BIGINT), 'NEW#A', CAST(3 AS INT), CAST(10.5 AS DOUBLE), 'MACHINERY'
      | UNION ALL SELECT CAST(900000002 AS BIGINT), 'NEW#B', CAST(4 AS INT), CAST(-1.25 AS DOUBLE), 'HOUSEHOLD')
      |ORDER BY c_custkey""".stripMargin

  /** Bulk CDC throughput: thousands of updates + deletes derived
    * deterministically from `orders`, applied in ONE batch / ONE snapshot
    * commit. This is the headline ingest metric — the reference applies one
    * record per Spark job (SURVEY.md §6, implied 1–10 rec/s); this path is
    * records-per-batch bounded only by the distributed apply. The oracle
    * reproduces the net effect in pure SQL.
    */
  private def cdcBulkOrders(spark: SparkSession, dir: String): DataFrame = {
    val store = new TableStore(spark, Scratch.dir("cdc-bulk", Scratch.tag(dir)))
    val orders = t(spark, dir, "orders")
    store.create("orders", orders.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("orders", orders)

    CdcApply.applyEnvelopes(spark, store,
      CdcApply.CdcConfig("orders", Seq("o_orderkey")),
      orderEnvelopes(orders))
    store.read("orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .orderBy("o_orderkey")
  }

  /** The bulk-ingest workload, as a DataFrame of CDC envelopes — shared by
    * the batch gate (cdc_bulk_orders) and the streaming gate (st_cdc_apply),
    * so both resolve to [[cdcBulkOrdersSql]].
    *
    * updates: +1000.0 on totalprice for orderkey % 97 == 0
    * deletes: orderkey % 101 == 0 (overlap resolves to whichever is later
    * in the batch — deletes win, mirrored in the oracle).
    * Envelopes are BUILT distributively (to_json on executors) and applied
    * through the fully distributed applyEnvelopes path — no collect()
    * anywhere in the headline ingest gate. Sequence numbers order deletes
    * after updates per key (2k vs 2k+1), preserving last-write-wins. */
  private[ops] def orderEnvelopes(orders: DataFrame): DataFrame = {
    val updates = orders.filter(col("o_orderkey") % 97 === 0)
      .select(
        (col("o_orderkey") * 2).as("__seq"),
        lit("update").as("__op"),
        to_json(struct(col("o_orderkey"))).as("__key"),
        to_json(struct(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))).as("__payload"))
    val deletes = orders.filter(col("o_orderkey") % 101 === 0)
      .select(
        (col("o_orderkey") * 2 + 1).as("__seq"),
        lit("delete").as("__op"),
        to_json(struct(col("o_orderkey"))).as("__key"),
        lit(null).cast("string").as("__payload"))
    updates.unionByName(deletes)
  }

  private[ops] val cdcBulkOrdersSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      | CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000.0
      |      ELSE o_totalprice END AS o_totalprice,
      | o_orderpriority
      |FROM orders WHERE o_orderkey % 101 <> 0
      |ORDER BY o_orderkey""".stripMargin

  /** Out-of-order replay resolved by SOURCE TIME, not arrival order
    * (CdcConfig.orderCol — the opencdc.createdAt-shaped metadata the
    * reference ignores, opencdc.proto:12-25): for %103 keys the
    * later-ARRIVING update carries an OLDER source timestamp and must
    * lose; for %107 keys a delete with the newest source timestamp
    * arrives FIRST and must still win over a stale update delivered
    * after it. The oracle encodes the source-time winners. */
  private def cdcOutOfOrder(spark: SparkSession, dir: String): DataFrame = {
    val store = new TableStore(spark, Scratch.dir("cdc-ooo", Scratch.tag(dir)))
    val orders = t(spark, dir, "orders")
    store.create("orders", orders.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("orders", orders)
    def upd(mod: Int, extra: Double, seqOff: Int, ordOff: Int) =
      orders.filter(col("o_orderkey") % mod === 0).select(
        (col("o_orderkey") * 2 + seqOff).as("__seq"),
        lit("update").as("__op"),
        to_json(struct(col("o_orderkey"))).as("__key"),
        to_json(struct(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          (col("o_totalprice") + extra).as("o_totalprice"),
          col("o_orderdate"), col("o_orderpriority"))).as("__payload"),
        (col("o_orderkey") * 10 + ordOff).as("src_ts"))
    val staleLast = upd(103, 500.0, 0, 2)       // newer ts, arrives first → wins
      .unionByName(upd(103, 100.0, 1, 1))       // older ts, arrives last → loses
      .unionByName(orders.filter(col("o_orderkey") % 107 === 0).select(
        (col("o_orderkey") * 2).as("__seq"),
        lit("delete").as("__op"),
        to_json(struct(col("o_orderkey"))).as("__key"),
        lit(null).cast("string").as("__payload"),
        (col("o_orderkey") * 10 + 9).as("src_ts"))) // newest ts, earliest arrival
      .unionByName(upd(107, 999.0, 1, 1))       // stale update after the delete
    CdcApply.applyEnvelopes(spark, store,
      CdcApply.CdcConfig("orders", Seq("o_orderkey"), orderCol = Some("src_ts")),
      staleLast)
    store.read("orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      .orderBy("o_orderkey")
  }

  private val cdcOutOfOrderSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      | CASE WHEN o_orderkey % 103 = 0 THEN o_totalprice + 500.0
      |      ELSE o_totalprice END AS o_totalprice,
      | o_orderpriority
      |FROM orders WHERE o_orderkey % 107 <> 0
      |ORDER BY o_orderkey""".stripMargin

  /** CDC auto schema evolution under the oracle (`CdcConfig.autoEvolve`):
    * a batch whose payloads carry fields the table never had — the sink
    * adds them as columns BEFORE applying (metadata-only, inference-typed)
    * instead of silently dropping them like the reference
    * (SparkDestinationStream.java:216-227). Untouched rows read the new
    * columns back as null with zero rewrite; a same-batch record without
    * the new fields upserts null for them. */
  private def cdcAutoEvolve(spark: SparkSession, dir: String): DataFrame = {
    val store = new TableStore(spark, Scratch.dir("cdc-evolve", Scratch.tag(dir)))
    val cust = t(spark, dir, "customer")
    store.create("customer", cust.schema, overwrite = true,
      zoneCols = Seq("c_custkey"))
    store.append("customer", cust)
    def key(id: Long) = Some(RawData(s"""{"c_custkey": $id}"""): CdcData)
    val batch = Seq(
      CdcRecord(Array(1), CdcOp.Update, key = key(1L),
        after = Some(RawData(
          """{"c_custkey": 1, "c_name": "EVOLVED#1", "c_nationkey": 7,
            | "c_acctbal": 999.99, "c_mktsegment": "BUILDING",
            | "c_tier": "gold", "c_score": 1.5}""".stripMargin))),
      CdcRecord(Array(2), CdcOp.Create, key = key(900000101L),
        after = Some(RawData(
          """{"c_custkey": 900000101, "c_name": "NEW#E", "c_nationkey": 3,
            | "c_acctbal": 10.0, "c_mktsegment": "MACHINERY",
            | "c_tier": "silver", "c_score": 2.5}""".stripMargin))),
      // a record WITHOUT the new fields in the same batch: nulls, not a crash
      CdcRecord(Array(3), CdcOp.Update, key = key(4L),
        after = Some(RawData(
          """{"c_custkey": 4, "c_name": "PLAIN#4", "c_nationkey": 2,
            | "c_acctbal": 50.0, "c_mktsegment": "AUTOMOBILE"}""".stripMargin))),
      CdcRecord(Array(4), CdcOp.Delete, key = key(5L)))
    CdcApply(spark, store,
      CdcApply.CdcConfig("customer", Seq("c_custkey"), autoEvolve = true), batch)
    store.read("customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment", "c_tier", "c_score")
      .orderBy("c_custkey")
  }

  private val cdcAutoEvolveSql =
    """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      | c_tier, c_score FROM (
      | SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |  CAST(NULL AS VARCHAR) AS c_tier, CAST(NULL AS DOUBLE) AS c_score
      | FROM customer
      | WHERE c_custkey NOT IN (1, 4, 5, 900000101)
      | UNION ALL SELECT CAST(1 AS BIGINT), 'EVOLVED#1', CAST(7 AS INT),
      |  CAST(999.99 AS DOUBLE), 'BUILDING', 'gold', CAST(1.5 AS DOUBLE)
      | UNION ALL SELECT CAST(4 AS BIGINT), 'PLAIN#4', CAST(2 AS INT),
      |  CAST(50.0 AS DOUBLE), 'AUTOMOBILE', NULL, NULL
      | UNION ALL SELECT CAST(900000101 AS BIGINT), 'NEW#E', CAST(3 AS INT),
      |  CAST(10.0 AS DOUBLE), 'MACHINERY', 'silver', CAST(2.5 AS DOUBLE))
      |ORDER BY c_custkey""".stripMargin

  /** CDC apply in MERGE-ON-READ mode (`write.merge.mode=merge-on-read`):
    * the same bulk orders batch as cdc_bulk_orders, but the apply
    * commits an equality-delete sidecar + appended upserts in ONE
    * snapshot with ZERO data files rewritten (require()d in-gate) — the
    * CDC tombstone pattern a scattered-key batch needs at 100 TB. The
    * read that hash-matches DuckDB runs with the mask PENDING. */
  private def cdcMorApply(spark: SparkSession, dir: String): DataFrame = {
    val store = new TableStore(spark, Scratch.dir("cdc-mor", Scratch.tag(dir)))
    val orders = t(spark, dir, "orders")
    store.create("orders", orders.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"), bloomCols = Seq("o_orderkey"))
    store.setProperties("orders",
      Map("write.merge.mode" -> Some("merge-on-read")))
    store.append("orders", orders.repartitionByRange(8, col("o_orderkey")))
    val before = store.currentRelPaths("orders").toSet
    val env = orderEnvelopes(orders)
    CdcApply.applyEnvelopes(spark, store,
      CdcApply.CdcConfig("orders", Seq("o_orderkey")), env)
    val after = store.currentRelPaths("orders").toSet
    require(after.size > before.size, "MoR apply must append upsert files")
    require(before.subsetOf(after),
      "MoR apply must not rewrite the original data files")
    require(store.pendingDeletes("orders") == 1,
      s"expected 1 pending equality sidecar, got " +
        s"${store.pendingDeletes("orders")}")
    store.read("orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  private val cdcMorApplySql =
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      | CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000.0
      |      ELSE o_totalprice END AS o_totalprice
      |FROM orders WHERE o_orderkey % 101 <> 0
      |ORDER BY o_orderkey""".stripMargin

  /** Multi-collection CDC under the oracle ([[graft.api.MultiDestination]]):
    * ONE mixed batch carries records for `customer` AND `orders`, routed
    * by the standard `opencdc.collection` metadata key the reference
    * never reads (opencdc.proto:64-67; SparkDestinationStream.java uses
    * only the fixed configured table), and the whole batch publishes as
    * ONE transaction — neither table's half can be observed without the
    * other. The read-back aggregates both tables into one frame DuckDB
    * reproduces from the raw parquet; atomic-abort and routing negatives
    * are spec-pinned in MultiDestinationSpec. */
  private def cdcMulti(spark: SparkSession, dir: String): DataFrame = {
    val store = new TableStore(spark, Scratch.dir("cdc-multi", Scratch.tag(dir)))
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    store.create("customer", cust.schema, overwrite = true,
      zoneCols = Seq("c_custkey"))
    store.create("orders", ord.schema, overwrite = true,
      zoneCols = Seq("o_orderkey"))
    store.append("customer", cust)
    store.append("orders", ord)
    val stream = graft.api.MultiDestination.open(spark,
      graft.api.MultiDestination.Config(
        Scratch.dir("cdc-multi", Scratch.tag(dir)),
        keyColsByCollection = Map(
          "customer" -> Seq("c_custkey"), "orders" -> Seq("o_orderkey"))))
    def rec(coll: String, op: CdcOp, pos: Int, key: String,
        payload: String = null): CdcRecord =
      CdcRecord(Array(pos.toByte), op,
        metadata = Map("opencdc.collection" -> coll),
        key = Some(RawData(key)),
        after = Option(payload).map(RawData(_)))
    val res = stream.writeBatch(Seq(
      rec("customer", CdcOp.Update, 1, """{"c_custkey": 1}""",
        """{"c_custkey": 1, "c_name": "UPDATED#1", "c_nationkey": 7,
          | "c_acctbal": 999.99, "c_mktsegment": "BUILDING"}""".stripMargin),
      rec("orders", CdcOp.Delete, 2, """{"o_orderkey": 7}"""),
      rec("customer", CdcOp.Delete, 3, """{"c_custkey": 2}"""),
      rec("orders", CdcOp.Create, 4, """{"o_orderkey": 900000001}""",
        """{"o_orderkey": 900000001, "o_custkey": 5, "o_totalprice": 10.5}""")))
    require(res.isSuccess, s"multi-collection batch failed: $res")
    val c = store.read("customer").agg(
      count(lit(1)).as("cnt"),
      count(when(col("c_name") === "UPDATED#1", 1)).as("marker"),
      Dets.dsum(col("c_acctbal")).as("total"))
      .select(lit("customer").as("src"), col("cnt"), col("marker"),
        col("total"))
    val o = store.read("orders").agg(
      count(lit(1)).as("cnt"),
      count(when(col("o_orderkey") === 900000001L, 1)).as("marker"),
      Dets.dsum(col("o_totalprice")).as("total"))
      .select(lit("orders").as("src"), col("cnt"), col("marker"),
        col("total"))
    c.unionByName(o).orderBy("src")
  }

  private val cdcMultiSql =
    """SELECT src, cnt, marker, total FROM (
      | SELECT 'customer' AS src, count(*) AS cnt,
      |   count(CASE WHEN c_name = 'UPDATED#1' THEN 1 END) AS marker,
      |   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total
      | FROM (SELECT c_name, c_acctbal FROM customer
      |         WHERE c_custkey NOT IN (1, 2)
      |       UNION ALL SELECT 'UPDATED#1', CAST(999.99 AS DOUBLE))
      | UNION ALL
      | SELECT 'orders' AS src, count(*) AS cnt,
      |   count(CASE WHEN o_orderkey = 900000001 THEN 1 END) AS marker,
      |   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      | FROM (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_orderkey NOT IN (7, 900000001)
      |       UNION ALL SELECT CAST(900000001 AS BIGINT), CAST(10.5 AS DOUBLE))
      |) ORDER BY src""".stripMargin

  val all: Seq[Q] = Seq(
    Q("cdc_apply_customer", cdcApplyCustomer, Some(cdcApplyCustomerSql)),
    Q("cdc_multi", cdcMulti, Some(cdcMultiSql)),
    Q("cdc_bulk_orders", cdcBulkOrders, Some(cdcBulkOrdersSql)),
    Q("cdc_out_of_order", cdcOutOfOrder, Some(cdcOutOfOrderSql)),
    Q("cdc_auto_evolve", cdcAutoEvolve, Some(cdcAutoEvolveSql)),
    Q("cdc_mor_apply", cdcMorApply, Some(cdcMorApplySql)))
}
