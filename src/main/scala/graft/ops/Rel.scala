package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Tables.t
import Dets._

/** Relational operator inventory (SURVEY.md §2): scans, filter/project,
  * equi/broadcast/semi/anti joins, hash aggregates, rollup/cube, window
  * functions, sort/limit/top-k, set ops, scalar functions, dedup.
  *
  * Every query is fully deterministic (unique ORDER BY; exact decimal
  * arithmetic for aggregated doubles) so the DuckDB oracle hash-matches.
  * Scale notes per query: filters/projections push to the parquet scan;
  * small dimensions are broadcast explicitly; aggregates are partial
  * (map-side combine) by construction of groupBy.agg.
  */
object Rel {

  /** TPC-H Q1 shape: scan → filter → hash agg (map-side partials) → sort.
    * At 100 TB the only shuffle is the 4-row-group exchange — optimal. */
  private def q01(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= tsLit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dbl(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
          .as("sum_disc_price"),
        dbl(sum((dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .cast(D4) * dec(lit(1) + col("l_tax")))).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) * CAST(1 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
      | COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection + top-k. Catalyst pushes the shipdate filter and
    * the 4-column projection into the parquet scan; top-k is a
    * TakeOrderedAndProject (no global sort shuffle). */
  private def q02(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate").between(tsLit("1996-01-01"), tsLit("1996-12-31")))
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin

  /** TPC-H Q3 shape: 3-way join, two shuffles on the orderkey spine;
    * customer side is filtered before the join so the build side shrinks.
    * At scale: customer⋈orders shuffles on custkey, result⋈lineitem on
    * orderkey; AQE handles skew. */
  private def q03(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(spark, dir, "orders").filter(col("o_orderdate") < tsLit("1998-01-01"))
    val li = t(spark, dir, "lineitem").filter(col("l_shipdate") > tsLit("1998-01-01"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dbl(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(20)
  }

  private val q03Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      | AND o_orderdate < TIMESTAMP '1998-01-01'
      | AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 20""".stripMargin

  /** Broadcast join: part is a small dimension — explicit broadcast()
    * keeps the 100 TB fact table shuffle-free. */
  private def q04(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
    val li = t(spark, dir, "lineitem")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("p_brand")
  }

  private val q04Sql =
    """SELECT p_brand, COUNT(*) AS n_items,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** TPC-H Q5 shape: 6-table join. region/nation broadcast; the
    * customer⋈orders⋈lineitem⋈supplier spine shuffles on its keys. */
  private def q05(spark: SparkSession, dir: String): DataFrame = {
    val region = t(spark, dir, "region").filter(col("r_name") =!= "EUROPE")
    val nation = t(spark, dir, "nation")
    val cust = t(spark, dir, "customer")
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate").between(tsLit("1996-01-01"), tsLit("1997-12-31")))
    val li = t(spark, dir, "lineitem")
    val supp = t(spark, dir, "supplier")
    cust
      .join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey") &&
        cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("n_name")
      .agg(dbl(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q05Sql =
    """SELECT n_name,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM customer
      | JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON o_orderkey = l_orderkey
      | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      | JOIN nation ON s_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name <> 'EUROPE'
      | AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6 shape: pure scan+filter+global agg — no shuffle beyond the
    * single-row exchange; all three predicates push to parquet. */
  private def q06(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate").between(tsLit("1996-01-01"), tsLit("1996-12-31")) &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 25)
      .agg(dbl(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))))
        .as("revenue"), count(lit(1)).as("n_rows"))

  private val q06Sql =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      | AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25""".stripMargin

  /** Left-semi join (EXISTS): customers having at least one urgent order.
    * Semi join keeps only the probe side — no row multiplication. */
  private def q07(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val urgent = t(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")
  }

  private val q07Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer WHERE EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Left-anti join (NOT EXISTS): customers with no urgent orders. */
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val urgent = t(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    cust.join(urgent, cust("c_custkey") === urgent("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_nationkey")
  }

  private val q08Sql =
    """SELECT c_nationkey, COUNT(*) AS n_customers
      |FROM customer WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Window top-N per group: 3 largest orders per customer.
    * row_number over (custkey, totalprice desc) — single shuffle on
    * custkey; the rank filter prunes before any further stage. */
  private def q09(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  private val q09Sql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      | FROM orders) WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Running (cumulative) window aggregate per supplier, exact decimal. */
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "lineitem")
      .filter(col("l_suppkey") <= 10)
      .withColumn("running_qty", dbl(sum(dec(col("l_quantity"))).over(w)))
      .select("l_suppkey", "l_orderkey", "l_linenumber", "running_qty")
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  private val q10Sql =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |   PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem WHERE l_suppkey <= 10
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** Lag/lead window: gap in days between consecutive orders per customer. */
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), col("prev_date")).cast(LongType))
      .filter(col("gap_days").isNotNull)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_days")).as("total_gap_days"),
        max(col("gap_days")).as("max_gap_days"))
      .orderBy("o_custkey")
  }

  private val q11Sql =
    """SELECT o_custkey, COUNT(*) AS n_gaps,
      | CAST(SUM(gap_days) AS BIGINT) AS total_gap_days,
      | MAX(gap_days) AS max_gap_days
      |FROM (
      | SELECT o_custkey, CAST(DATEDIFF('day',
      |   LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |   o_orderdate) AS BIGINT) AS gap_days
      | FROM orders)
      |WHERE gap_days IS NOT NULL
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Set operations: INTERSECT and EXCEPT on key sets, union of both tags. */
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    val withOrders = t(spark, dir, "orders").select(col("o_custkey").as("custkey")).distinct()
    val positive = t(spark, dir, "customer")
      .filter(col("c_acctbal") > 0).select(col("c_custkey").as("custkey"))
    val both = withOrders.intersect(positive).withColumn("tag", lit("both"))
    val onlyOrders = withOrders.except(positive).withColumn("tag", lit("orders_only"))
    both.unionAll(onlyOrders)
      .groupBy("tag").agg(count(lit(1)).as("n"), min("custkey").as("min_key"),
        max("custkey").as("max_key"))
      .orderBy("tag")
  }

  private val q12Sql =
    """SELECT tag, COUNT(*) AS n, MIN(custkey) AS min_key, MAX(custkey) AS max_key
      |FROM (
      | SELECT custkey, 'both' AS tag FROM (
      |  SELECT DISTINCT o_custkey AS custkey FROM orders
      |  INTERSECT SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0)
      | UNION ALL
      | SELECT custkey, 'orders_only' AS tag FROM (
      |  SELECT DISTINCT o_custkey AS custkey FROM orders
      |  EXCEPT SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0))
      |GROUP BY tag ORDER BY tag""".stripMargin

  /** ROLLUP hierarchy totals (nulls ordered explicitly for parity). */
  private def q13(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q13Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** CUBE over two dimensions. */
  private def q14(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val q14Sql =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      | COUNT(*) AS n
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Conditional aggregation (TPC-H Q14 shape): promo revenue share.
    * CASE folds into the aggregate — one pass, broadcast dimension. */
  private def q15(spark: SparkSession, dir: String): DataFrame = {
    val part = t(spark, dir, "part")
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate").between(tsLit("1997-01-01"), tsLit("1997-12-31")))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .agg(
        dbl(sum(when(col("p_type").startsWith("PROMO"),
          dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))
          .otherwise(lit(0).cast(D4)))).as("promo_revenue"),
        dbl(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
          .as("total_revenue"))
  }

  private val q15Sql =
    """SELECT
      | CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      |   THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))
      |   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'""".stripMargin

  /** String scalar functions: substring/upper/length/replace + agg. */
  private def q16(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        upper(substring(col("p_name"), 1, 1)).as("initial"),
        length(col("p_name")).as("name_len"),
        length(regexp_replace(col("p_name"), "[aeiou]", "")).as("consonant_len"))
      .groupBy("initial")
      .agg(count(lit(1)).as("n"), sum("name_len").as("total_len"),
        sum("consonant_len").as("total_consonants"))
      .orderBy("initial")

  private val q16Sql =
    """SELECT UPPER(SUBSTRING(p_name, 1, 1)) AS initial, COUNT(*) AS n,
      | CAST(SUM(LENGTH(p_name)) AS BIGINT) AS total_len,
      | CAST(SUM(LENGTH(REGEXP_REPLACE(p_name, '[aeiou]', '', 'g'))) AS BIGINT) AS total_consonants
      |FROM part GROUP BY 1 ORDER BY 1""".stripMargin

  /** Date/time extraction and grouping. */
  private def q17(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("yr", "mo")

  private val q17Sql =
    """SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, CAST(MONTH(o_orderdate) AS INT) AS mo,
      | COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Math scalar functions over stable integer-ish inputs. */
  private def q18(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(
        (col("l_orderkey") % 7).as("bucket"),
        floor(col("l_quantity")).as("fq"),
        ceil(col("l_quantity")).as("cq"),
        abs(col("l_quantity") - 25).cast(D2).as("dev"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("fq").as("sum_floor"), sum("cq").as("sum_ceil"),
        dbl(sum(col("dev"))).as("sum_dev"))
      .orderBy("bucket")

  private val q18Sql =
    """SELECT l_orderkey % 7 AS bucket, COUNT(*) AS n,
      | CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_floor,
      | CAST(SUM(CAST(CEIL(l_quantity) AS BIGINT)) AS BIGINT) AS sum_ceil,
      | CAST(SUM(CAST(ABS(l_quantity - 25) AS DECIMAL(18,2))) AS DOUBLE) AS sum_dev
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Correlated aggregate via window: customers above their nation's mean
    * balance — window sum/count avoids a self-join + shuffle reuse. */
  private def q19(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
    t(spark, dir, "customer")
      .withColumn("nation_avg",
        dbl(sum(dec(col("c_acctbal"))).over(w)) / count(lit(1)).over(w))
      .filter(col("c_acctbal") > col("nation_avg"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_above"))
      .orderBy("c_nationkey")
  }

  private val q19Sql =
    """SELECT c_nationkey, COUNT(*) AS n_above FROM (
      | SELECT c_nationkey, c_acctbal,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY c_nationkey) AS DOUBLE)
      |   / COUNT(*) OVER (PARTITION BY c_nationkey) AS nation_avg
      | FROM customer)
      |WHERE c_acctbal > nation_avg
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** NTILE bucketing over a unique ordering — built-in `ntile` over an
    * unpartitioned window collapses to ONE partition, so this uses the
    * scale-correct two-pass implementation (ScaleOps.distributedNtile)
    * with identical SQL semantics, hash-checked against DuckDB's NTILE. */
  private def q20(spark: SparkSession, dir: String): DataFrame = {
    ScaleOps.distributedNtile(t(spark, dir, "customer"), 4,
      Seq(col("c_acctbal"), col("c_custkey")), "quartile")
      .groupBy("quartile")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"),
        min("c_custkey").as("min_key"))
      .orderBy("quartile")
  }

  private val q20Sql =
    """SELECT quartile, COUNT(*) AS n,
      | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
      | MIN(c_custkey) AS min_key
      |FROM (SELECT c_custkey, c_acctbal,
      |  NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile FROM customer)
      |GROUP BY quartile ORDER BY quartile""".stripMargin

  /** Distinct aggregation: exact count-distinct per group. */
  private def q21(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  private val q21Sql =
    """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
      | COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Multi-key join + grouped having-style filter (post-agg predicate). */
  private def q22(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderkey", "o_orderstatus")
      .agg(dsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_lines"))
      .filter(col("total_qty") > 150)
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  private val q22Sql =
    """SELECT o_orderkey, o_orderstatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
      | COUNT(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderkey, o_orderstatus
      |HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150
      |ORDER BY total_qty DESC, o_orderkey LIMIT 50""".stripMargin

  /** Skew-safe aggregation: deterministic salted two-phase sum/count over
    * the 3-value returnflag key (a worst-case hot-key distribution), with
    * exact decimal arithmetic so it still hash-matches the plain GROUP BY
    * oracle. */
  private def q23(spark: SparkSession, dir: String): DataFrame =
    ScaleOps.saltedSumCount(
      t(spark, dir, "lineitem"),
      Seq("l_returnflag"), col("l_orderkey"), 32,
      dec(col("l_quantity")), "sum_qty_dec")
      .select(col("l_returnflag"), dbl(col("sum_qty_dec")).as("sum_qty"),
        col("n_rows"))
      .orderBy("l_returnflag")

  private val q23Sql =
    """SELECT l_returnflag,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | COUNT(*) AS n_rows
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Sketch aggregates with a FULL oracle: the exact distinct count next
    * to a KMV (k-minimum-values) estimate computed over the portable
    * md5-derived 60-bit hash — every arithmetic step (k-th smallest
    * distinct hash, one exact double product, one correctly-rounded
    * division, floor) is reproduced verbatim in DuckDB, so unlike HLL
    * the sketch ESTIMATE itself hash-matches across engines.
    * approx_count_distinct (HLL++, engine-specific bytes) stays
    * exercised in-gate: its 2% sketch's error contract is require()d
    * here against the exact branch (and pinned again in RelSpec), but
    * its estimates stay out of the compared output.
    *
    * Scale shape: the KMV candidate set reduces through a SALTED
    * row_number window (sort-based and spillable — per-task memory is
    * bounded however large a salt bucket grows, unlike a collect_list
    * whose aggregation buffer holds the whole bucket) keeping k minima
    * per (group, salt); the second level then merges ≤ 64·k survivors
    * per group. The exact branch is a plain two-level distinct agg; HLL
    * builds one sketch per group (kept OUT of the exact agg: mixing
    * them triggers Spark's single-distinct rewrite, one ~3 KB sketch
    * per distinct PAIR instead of per group). The in-gate require()s
    * run over PERSISTED frames so the gate's pipeline executes once,
    * not once per check plus once for the caller. */
  private def q24(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val k = 256
    // examined for a single-pass exact+HLL aggregate (one scan, no
    // join): measured SLOWER — mixing distinct and non-distinct
    // aggregates plans an Expand that doubles the rows through the
    // first exchange, costing more than the second scan saves
    // (3.4 s → 5.4 s at sf0.1) — so the two-scan shape stays
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts")).persist()
    val chk = exact.join(
      li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("a")),
      Seq("l_returnflag")).collect()
    chk.foreach { r =>
      val ex = r.getAs[Long]("exact_parts").toDouble
      val a = r.getAs[Long]("a").toDouble
      require(ex == 0 || math.abs(a - ex) / ex < 0.1,
        s"HLL estimate $a outside its error bound of exact $ex")
    }
    // distinct portable hashes; nulls out (Spark sorts them first,
    // DuckDB last — and no engine's distinct-count includes them)
    val hashes = li.filter(col("l_partkey").isNotNull)
      .select(col("l_returnflag"),
        PortableHash.h60(col("l_partkey").cast("string")).as("h"))
      .distinct()
    val nd = hashes.groupBy("l_returnflag").agg(count(lit(1)).as("nd"))
    val w = Window
      .partitionBy(col("l_returnflag"), pmod(col("h"), lit(64L)))
      .orderBy("h")
    val localMins = hashes.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
    val merged = localMins.groupBy("l_returnflag")
      .agg(slice(sort_array(collect_list(col("h"))), 1, k).as("mins"))
      .join(nd, Seq("l_returnflag"))
    // (k-1) * 2^60 is an EXACT double (small integer × power of two);
    // the division and floor are single correctly-rounded IEEE ops —
    // identical in any engine, which is what makes the estimate oracled
    val kmv = merged.select(col("l_returnflag"),
      when(col("nd") >= k,
        floor(lit((k - 1).toDouble * 1152921504606846976.0d) /
          element_at(col("mins"), k).cast("double")))
        .otherwise(col("nd")).as("kmv_parts"))
    val out = exact.join(kmv, Seq("l_returnflag")).orderBy("l_returnflag")
      .persist()
    out.collect().foreach { r =>
      val ex = r.getAs[Long]("exact_parts").toDouble
      if (ex >= k)
        require(math.abs(r.getAs[Long]("kmv_parts") - ex) / ex < 0.25,
          s"KMV estimate ${r.getAs[Long]("kmv_parts")} outside 4-sigma " +
            s"of exact $ex at k=$k")
    }
    // both caches release here: holding `out` for the caller would leak
    // one cached frame per invocation (the bench resamples gates up to
    // 6×) — re-executing the 3-row plan costs less than a session-long
    // cache entry
    exact.unpersist()
    out.unpersist()
    out
  }

  private val q24Sql = {
    val h = PortableHash.h60Sql("CAST(l_partkey AS VARCHAR)")
    s"""WITH d AS (
      |  SELECT DISTINCT l_returnflag, $h AS h
      |  FROM lineitem WHERE l_partkey IS NOT NULL),
      |r AS (
      |  SELECT l_returnflag, h,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS nd
      |  FROM d),
      |e AS (
      |  SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts
      |  FROM lineitem GROUP BY 1)
      |SELECT e.l_returnflag AS l_returnflag, e.exact_parts AS exact_parts,
      |  CASE WHEN r.nd >= 256
      |    THEN CAST(FLOOR(255.0 * 1152921504606846976.0
      |      / CAST(r.h AS DOUBLE)) AS BIGINT)
      |    ELSE r.nd END AS kmv_parts
      |FROM e JOIN r ON e.l_returnflag = r.l_returnflag
      |  AND r.rn = LEAST(256, r.nd)
      |ORDER BY e.l_returnflag""".stripMargin
  }

  /** The exact branch of q24 on its own — deterministic, so it gets a full
    * DuckDB oracle (the combined gate stays rows-only because HLL sketch
    * estimates are engine-specific). */
  private def q24e(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .orderBy("l_returnflag")

  private val q24eSql =
    """SELECT l_returnflag,
      | COUNT(DISTINCT l_partkey) AS exact_parts,
      | COUNT(DISTINCT l_orderkey) AS exact_orders
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Scalar-function breadth: string manipulation + IEEE-exact math inside
    * order-independent aggregates (min/max only — sums of irrational
    * doubles would be accumulation-order-dependent). */
  private def q25(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .groupBy("p_size")
      .agg(
        count(lit(1)).as("n"),
        min(reverse(col("p_name"))).as("min_rev_name"),
        max(translate(col("p_brand"), "#", "_")).as("max_brand_t"),
        min(sqrt(col("p_retailprice"))).as("min_sqrt_price"),
        max(lpad(col("p_brand"), 12, "*")).as("max_padded"),
        min(concat_ws("|", col("p_type"), col("p_brand"))).as("min_concat"))
      .orderBy("p_size")

  private val q25Sql =
    """SELECT p_size, COUNT(*) AS n,
      | MIN(REVERSE(p_name)) AS min_rev_name,
      | MAX(TRANSLATE(p_brand, '#', '_')) AS max_brand_t,
      | MIN(SQRT(p_retailprice)) AS min_sqrt_price,
      | MAX(LPAD(p_brand, 12, '*')) AS max_padded,
      | MIN(CONCAT_WS('|', p_type, p_brand)) AS min_concat
      |FROM part GROUP BY p_size ORDER BY p_size""".stripMargin

  /** Window-function breadth: rank family + value functions + frame-bounded
    * aggregates, all over a unique ordering within partitions. */
  private def q26(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    t(spark, dir, "supplier")
      .select(col("s_nationkey"), col("s_suppkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"),
        first(col("s_suppkey")).over(w).as("first_key"),
        lead(col("s_suppkey"), 1).over(w).as("next_key"),
        dbl(sum(dec(col("s_acctbal")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .as("running_bal"))
      .orderBy("s_nationkey", "rnk")
  }

  private val q26Sql =
    """SELECT s_nationkey, s_suppkey,
      | RANK() OVER w AS rnk,
      | DENSE_RANK() OVER w AS drnk,
      | PERCENT_RANK() OVER w AS prnk,
      | CUME_DIST() OVER w AS cdist,
      | FIRST_VALUE(s_suppkey) OVER w AS first_key,
      | LEAD(s_suppkey, 1) OVER w AS next_key,
      | CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) OVER (
      |   PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_bal
      |FROM supplier
      |WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
      |ORDER BY s_nationkey, rnk""".stripMargin

  /** Outer-join family: left/full outer with null handling via coalesce. */
  private def q27(spark: SparkSession, dir: String): DataFrame = {
    val nation = t(spark, dir, "nation")
    val bigCust = t(spark, dir, "customer").filter(col("c_acctbal") > 4500)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_rich"))
    nation.join(bigCust, nation("n_nationkey") === bigCust("c_nationkey"), "full_outer")
      .select(
        coalesce(col("n_nationkey"), col("c_nationkey")).as("nationkey"),
        coalesce(col("n_name"), lit("<none>")).as("nation_name"),
        coalesce(col("n_rich"), lit(0L)).as("n_rich"))
      .orderBy("nationkey")
  }

  private val q27Sql =
    """SELECT COALESCE(n_nationkey, c_nationkey) AS nationkey,
      | COALESCE(n_name, '<none>') AS nation_name,
      | COALESCE(n_rich, 0) AS n_rich
      |FROM nation FULL OUTER JOIN (
      | SELECT c_nationkey, COUNT(*) AS n_rich FROM customer
      | WHERE c_acctbal > 4500 GROUP BY c_nationkey) ON n_nationkey = c_nationkey
      |ORDER BY nationkey""".stripMargin

  /** Explicit GROUPING SETS with grouping_id, via the SQL surface. */
  private def q28(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        | CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |  (o_orderstatus, o_orderpriority))
        |ORDER BY g_status, g_prio,
        | o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  private val q28Sql =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      | CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
      | COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |  (o_orderstatus, o_orderpriority))
      |ORDER BY g_status, g_prio,
      | o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Array-function family over an array built from the name tokens:
    * containment, position, sorting, distinct — all with DuckDB list-fn
    * oracles. */
  private def q29(spark: SparkSession, dir: String): DataFrame = {
    val arr = split(col("p_name"), " ")
    t(spark, dir, "part")
      .select(col("p_partkey"), arr.as("words"))
      .select(
        col("p_partkey"),
        size(col("words")).as("n_words"),
        array_contains(col("words"), "green").as("has_green"),
        array_position(col("words"), "green").cast(LongType).as("green_pos"),
        element_at(array_sort(col("words")), 1).as("first_sorted"),
        size(array_distinct(col("words"))).as("n_distinct"))
      .orderBy("p_partkey")
  }

  private val q29Sql =
    """SELECT p_partkey,
      | CAST(LEN(STRING_SPLIT(p_name, ' ')) AS INT) AS n_words,
      | LIST_CONTAINS(STRING_SPLIT(p_name, ' '), 'green') AS has_green,
      | CAST(COALESCE(LIST_POSITION(STRING_SPLIT(p_name, ' '), 'green'), 0) AS BIGINT) AS green_pos,
      | LIST_SORT(STRING_SPLIT(p_name, ' '))[1] AS first_sorted,
      | CAST(LEN(LIST_DISTINCT(STRING_SPLIT(p_name, ' '))) AS INT) AS n_distinct
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Null-handling / conditional scalar family: NULLIF, COALESCE,
    * LEAST/GREATEST, and null-aware aggregation (COUNT skips nulls). */
  private def q30(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<redacted>"))
          .as("seg_filled"),
        least(col("c_acctbal"), lit(0.0)).as("neg_part"),
        greatest(col("c_acctbal"), lit(0.0)).as("pos_part"))
      .groupBy("seg_filled")
      .agg(count(lit(1)).as("n_rows"),
        count(col("seg_or_null")).as("n_nonnull"),
        dbl(sum(dec(col("neg_part")))).as("sum_neg"),
        dbl(sum(dec(col("pos_part")))).as("sum_pos"))
      .orderBy("seg_filled")

  private val q30Sql =
    """SELECT COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '<redacted>') AS seg_filled,
      | COUNT(*) AS n_rows,
      | COUNT(NULLIF(c_mktsegment, 'BUILDING')) AS n_nonnull,
      | CAST(SUM(CAST(LEAST(c_acctbal, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_neg,
      | CAST(SUM(CAST(GREATEST(c_acctbal, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS sum_pos
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  /** Non-equi (range) join: orders against an inline era dimension on
    * date containment — broadcast nested-loop on the tiny dimension, the
    * correct plan for a small range table against a large fact. */
  private def q31(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val eras = Seq(
      ("early", "1995-01-01", "1997-12-31"),
      ("late", "1998-01-01", "2001-12-31")).toDF("era", "start_d", "end_d")
      .select(col("era"), col("start_d").cast(TimestampType).as("start_ts"),
        col("end_d").cast(TimestampType).as("end_ts"))
    val ord = t(spark, dir, "orders")
    ord.join(broadcast(eras),
      ord("o_orderdate") >= eras("start_ts") && ord("o_orderdate") <= eras("end_ts"))
      .groupBy("era")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("era")
  }

  private val q31Sql =
    """SELECT era, COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN (VALUES
      |  ('early', TIMESTAMP '1995-01-01', TIMESTAMP '1997-12-31'),
      |  ('late',  TIMESTAMP '1998-01-01', TIMESTAMP '2001-12-31'))
      |  AS eras(era, start_ts, end_ts)
      | ON o_orderdate >= start_ts AND o_orderdate <= end_ts
      |GROUP BY era ORDER BY era""".stripMargin

  /** Exact positional quantiles (median + p90) — deterministic and fully
    * oracle-checkable, unlike interpolating percentile_cont (whose FP
    * interpolation differs across engines) or approx_percentile (engine-
    * specific sketch): the quantile is THE element at an integer rank
    * position under a total order with a unique tie-break, computed with
    * pure integer arithmetic (`div`), no floating point anywhere in the
    * position logic. */
  private def q32(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    val cw = Window.partitionBy("l_returnflag")
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .withColumn("n", count(lit(1)).over(cw))
      .withColumn("pos_med", expr("(n + 1) div 2"))
      .withColumn("pos_p90", greatest(lit(1L), expr("(9 * n) div 10")))
      .filter(col("rn") === col("pos_med") || col("rn") === col("pos_p90"))
      .groupBy("l_returnflag")
      .agg(
        min(when(col("rn") === col("pos_med"), col("l_quantity"))).as("median_qty"),
        min(when(col("rn") === col("pos_p90"), col("l_quantity"))).as("p90_qty"),
        max("n").as("n_rows"))
      .orderBy("l_returnflag")
  }

  private val q32Sql =
    """SELECT l_returnflag,
      | MIN(CASE WHEN rn = (n + 1) // 2 THEN l_quantity END) AS median_qty,
      | MIN(CASE WHEN rn = GREATEST(1, (9 * n) // 10) THEN l_quantity END) AS p90_qty,
      | CAST(MAX(n) AS BIGINT) AS n_rows
      |FROM (
      | SELECT l_returnflag, l_quantity,
      |  ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |    ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
      |  COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      | FROM lineitem)
      |WHERE rn = (n + 1) // 2 OR rn = GREATEST(1, (9 * n) // 10)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pearson correlation from EXACT decimal sums: built-in corr() folds
    * doubles in partition order (not reproducible, not oracle-able); here
    * every sufficient statistic (Σx, Σy, Σxy, Σx², Σy², n) is an exact
    * DECIMAL sum, and only the final closed-form combination runs in
    * IEEE double — identical on any engine and any partitioning. */
  private def q33(spark: SparkSession, dir: String): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dbl(sum(x)).as("sx"), dbl(sum(y)).as("sy"),
        dbl(sum(x * y)).as("sxy"),
        dbl(sum(x * x)).as("sxx"), dbl(sum(y * y)).as("syy"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy")))).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  private val q33Sql =
    """SELECT l_returnflag, n,
      | (n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))
      |   AS corr_qty_price
      |FROM (
      | SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |  CAST(SUM(x * y) AS DOUBLE) AS sxy,
      |  CAST(SUM(x * x) AS DOUBLE) AS sxx, CAST(SUM(y * y) AS DOUBLE) AS syy
      | FROM (SELECT l_returnflag,
      |        CAST(l_quantity AS DECIMAL(18,2)) AS x,
      |        CAST(l_extendedprice AS DECIMAL(18,2)) AS y
      |       FROM lineitem)
      | GROUP BY 1)
      |ORDER BY 1""".stripMargin

  /** Fixed-width histogram with pure integer bucket arithmetic (cents
    * `div` bucket-width-in-cents — no floating-point boundary ambiguity),
    * capped into a final overflow bucket. */
  private def q34(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("bucket",
        least(lit(9L), expr(
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) div 6000000")))
      .groupBy("o_orderpriority", "bucket")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority", "bucket")

  private val q34Sql =
    """SELECT o_orderpriority,
      | LEAST(9, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 6000000) AS bucket,
      | COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Skew-safe salted JOIN ([[ScaleOps.saltedJoin]]): lineitem joined to
    * orders on orderkey with the orders side replicated over 8 salts, then
    * revenue per orderpriority. Results are EXACTLY the plain join's (the
    * oracle is the unsalted SQL), which is the point: the salt only
    * reshapes the shuffle so a hot orderkey spreads over 8 reducers. */
  private def q35(spark: SparkSession, dir: String): DataFrame =
    ScaleOps.saltedJoin(
      t(spark, dir, "lineitem")
        .select(col("l_orderkey").as("okey"), col("l_extendedprice"),
          col("l_linenumber")),
      t(spark, dir, "orders")
        .select(col("o_orderkey").as("okey"), col("o_orderpriority")),
      "okey", saltFrom = col("l_linenumber"), salt = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority")

  private val q35Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The textual-SQL surface through the driver gate (the T rows of
    * SURVEY §2 are otherwise ScalaTest-only): a correlated EXISTS
    * subquery — TPC-H Q4's shape on this schema — submitted as ONE
    * spark.sql() string over temp views. Catalyst rewrites the EXISTS to
    * a left-semi hash join on l_orderkey with the date predicate pushed
    * into the join condition; the oracle is the IDENTICAL ANSI text, so
    * the gate also proves the SQL dialect surface agrees, not just the
    * DataFrame plans. */
  private def q36(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").createOrReplaceTempView("q36_orders")
    t(spark, dir, "lineitem").createOrReplaceTempView("q36_lineitem")
    spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS late_orders
        |FROM q36_orders
        |WHERE EXISTS (SELECT 1 FROM q36_lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  private val q36Sql =
    """SELECT o_orderpriority, COUNT(*) AS late_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Multiset (ALL) set operations — the bag semantics q12's distinct
    * INTERSECT/EXCEPT don't cover: per-customer order multiplicities in
    * 1995 vs 1996. Spark compiles intersectAll/exceptAll to a
    * count-and-replay plan (tag both sides, aggregate counts per key,
    * regenerate min/diff copies) — one shuffle per side, no row-by-row
    * anti-join cascade, so bag semantics cost the same as distinct ones
    * at 100 TB. */
  private def q37(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    def keys(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey").as("custkey"))
    val both = keys(1995).intersectAll(keys(1996))
      .withColumn("tag", lit("both_all"))
    val only95 = keys(1995).exceptAll(keys(1996))
      .withColumn("tag", lit("only95_all"))
    both.unionAll(only95)
      .groupBy("tag")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("custkey")).as("n_keys"),
        min("custkey").as("min_key"), max("custkey").as("max_key"))
      .orderBy("tag")
  }

  private val q37Sql =
    """SELECT tag, COUNT(*) AS n, COUNT(DISTINCT custkey) AS n_keys,
      | MIN(custkey) AS min_key, MAX(custkey) AS max_key
      |FROM (
      | SELECT custkey, 'both_all' AS tag FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE YEAR(o_orderdate) = 1995
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996)
      | UNION ALL
      | SELECT custkey, 'only95_all' AS tag FROM (
      |  SELECT o_custkey AS custkey FROM orders WHERE YEAR(o_orderdate) = 1995
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE YEAR(o_orderdate) = 1996))
      |GROUP BY tag ORDER BY tag""".stripMargin

  /** Wide→long reshape (melt): conditional per-linestatus sums computed
    * wide in one scan (partial aggs combine map-side), then
    * `Dataset.unpivot` back to long — the inverse of ev_pivot. unpivot is
    * an Expand over the already-tiny agg output: zero extra shuffle.
    * Absent (flag,status) combinations stay NULL in both engines (melt
    * keeps nulls; the UNION-ALL oracle reproduces them). */
  private def q38(spark: SparkSession, dir: String): DataFrame = {
    val wide = t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        dbl(sum(when(col("l_linestatus") === "O", dec(col("l_quantity")))))
          .as("qty_O"),
        dbl(sum(when(col("l_linestatus") === "F", dec(col("l_quantity")))))
          .as("qty_F"))
    wide.unpivot(Array(col("l_returnflag")),
        Array(col("qty_O"), col("qty_F")), "linestatus", "sum_qty")
      .withColumn("linestatus", substring(col("linestatus"), 5, 1))
      .orderBy("l_returnflag", "linestatus")
  }

  private val q38Sql =
    """WITH w AS (SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN l_linestatus = 'O'
      |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
      |  CAST(SUM(CASE WHEN l_linestatus = 'F'
      |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
      | FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, 'F' AS linestatus, qty_F AS sum_qty FROM w
      |UNION ALL
      |SELECT l_returnflag, 'O' AS linestatus, qty_O AS sum_qty FROM w
      |ORDER BY l_returnflag, linestatus""".stripMargin

  /** Several DISTINCT aggregates (one under a conditional scope) plus a
    * plain count in ONE aggregation — exercises Catalyst's Expand-based
    * multi-distinct rewrite: each distinct set gets its own projection,
    * partials still combine map-side, instead of N self-joined
    * single-distinct aggregations. */
  private def q39(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(when(col("l_quantity") > 25, col("l_orderkey")))
          .as("n_big_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  private val q39Sql =
    """SELECT l_returnflag,
      | COUNT(DISTINCT l_partkey) AS n_parts,
      | COUNT(DISTINCT l_suppkey) AS n_supps,
      | COUNT(DISTINCT CASE WHEN l_quantity > 25 THEN l_orderkey END)
      |   AS n_big_orders,
      | COUNT(*) AS n_rows
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Bloom semi-join reduction ([[ScaleOps.bloomJoin]]): the urgent-order
    * key set (one fifth of orders — too many rows to broadcast
    * comfortably at scale, but a ~1 MB key sketch) prunes lineitem
    * MAP-SIDE before the shuffle join. The oracle is the PLAIN join SQL:
    * Bloom false positives are removed by the exact join, so the result
    * must be bit-identical — that equivalence is the gate. */
  private def q40(spark: SparkSession, dir: String): DataFrame = {
    val urgent = t(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    ScaleOps.bloomJoin(li, urgent, "o_orderkey")
      .groupBy((col("o_custkey") % 100).as("cust_bucket"))
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("cust_bucket")
  }

  private val q40Sql =
    """SELECT o_custkey % 100 AS cust_bucket, COUNT(*) AS n_items,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Map-typed column family (the one scalar family q29's arrays don't
    * cover): build a per-flag linestatus→quantity map from aggregated
    * arrays, then read it back via element_at / map_keys / size /
    * map_filter. The map stays INTERNAL plumbing — the gate outputs only
    * scalars derived from it, because map iteration order is not part of
    * either engine's contract; the oracle computes the same scalars with
    * conditional aggregation. */
  private def q41(spark: SparkSession, dir: String): DataFrame = {
    val wide = t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(dbl(sum(dec(col("l_quantity")))).as("qty"))
      .groupBy("l_returnflag")
      .agg(map_from_arrays(collect_list(col("l_linestatus")),
        collect_list(col("qty"))).as("m"))
    wide.select(col("l_returnflag"),
        size(col("m")).as("n_statuses"),
        element_at(col("m"), "O").as("qty_O"),
        element_at(col("m"), "F").as("qty_F"),
        size(map_filter(col("m"), (_, v) => v > 100.0)).as("n_big"),
        array_join(array_sort(map_keys(col("m"))), ",").as("statuses"))
      .orderBy("l_returnflag")
  }

  private val q41Sql =
    """SELECT l_returnflag,
      | CAST(COUNT(*) AS INT) AS n_statuses,
      | MAX(CASE WHEN l_linestatus = 'O' THEN qty END) AS qty_O,
      | MAX(CASE WHEN l_linestatus = 'F' THEN qty END) AS qty_F,
      | CAST(SUM(CASE WHEN qty > 100.0 THEN 1 ELSE 0 END) AS INT) AS n_big,
      | STRING_AGG(l_linestatus, ',' ORDER BY l_linestatus) AS statuses
      |FROM (SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |      FROM lineitem GROUP BY 1, 2)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Bucketed interval join ([[ScaleOps.intervalJoin]]): events as time
    * points against 120 generated 2-hour maintenance windows (every 6
    * hours over the data's month). q31 broadcasts its 2-row era table;
    * this is the general form — an EQUI join on time buckets plus a
    * residual range filter, so the plan stays a hash join however many
    * windows exist (a bare range predicate would nested-loop). Window
    * spine is generated distributively (spark.range / generate_series)
    * in both engines. */
  private def q42(spark: SparkSession, dir: String): DataFrame = {
    val pts = Events.ev(spark, dir)
      .select(col("user_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("s"))
    val windows = spark.range(0, 120)
      .select(col("id").as("w_id"),
        (lit(1704067200L) + col("id") * 21600L).as("ws"))
      .withColumn("we", col("ws") + 7200L)
    ScaleOps.intervalJoin(pts, "s", windows, "ws", "we", 7200L)
      .groupBy("w_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("w_id")
  }

  private val q42Sql =
    """WITH w AS (SELECT i AS w_id, 1704067200 + i * 21600 AS ws,
      |            1704067200 + i * 21600 + 7200 AS we
      |           FROM GENERATE_SERIES(0, 119) t(i)),
      |e AS (SELECT user_id,
      |       CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS s
      |      FROM events)
      |SELECT w_id, COUNT(*) AS n_events,
      | COUNT(DISTINCT user_id) AS n_users
      |FROM w JOIN e ON s >= ws AND s < we
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Recursive CTE (Spark 4's WITH RECURSIVE): every customer key walks
    * its binary-heap ancestor chain (node → node div 2) to the root — a
    * variable-depth traversal no fixed-length join chain can express.
    * Each recursion level executes as a distributed step over the
    * previous level's frame; depth is bounded by log2(max key), rows by
    * keys × chain length. Aggregated per depth for a compact oracle. */
  private def q43(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "customer").createOrReplaceTempView("q43_customer")
    spark.sql(
      """WITH RECURSIVE anc(custkey, node, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM q43_customer
        |  UNION ALL
        |  SELECT custkey, node DIV 2, depth + 1 FROM anc WHERE node > 1)
        |SELECT depth, COUNT(*) AS n_nodes,
        | COUNT(DISTINCT custkey) AS n_keys,
        | CAST(SUM(node) AS BIGINT) AS sum_node
        |FROM anc GROUP BY depth ORDER BY depth""".stripMargin)
  }

  private val q43Sql =
    """WITH RECURSIVE anc(custkey, node, depth) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer
      |  UNION ALL
      |  SELECT custkey, node // 2, depth + 1 FROM anc WHERE node > 1)
      |SELECT depth, COUNT(*) AS n_nodes,
      | COUNT(DISTINCT custkey) AS n_keys,
      | CAST(SUM(node) AS BIGINT) AS sum_node
      |FROM anc GROUP BY depth ORDER BY depth""".stripMargin

  /** OLS regression (slope + intercept) from EXACT sufficient statistics
    * — q33's determinism argument extended: decimal sums are exact, every
    * derived op (product, difference, division) is a correctly-rounded
    * IEEE step applied in the same order by both engines, so the fitted
    * line is bit-identical cross-engine where the builtin regr_slope's
    * streaming accumulation would be order-dependent. */
  private def q44(spark: SparkSession, dir: String): DataFrame = {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_extendedprice"))
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        dbl(sum(x)).as("sx"), dbl(sum(y)).as("sy"),
        dbl(sum(x * y)).as("sxy"), dbl(sum(x * x)).as("sxx"))
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx")) / col("n"))
      .select("l_returnflag", "n", "slope", "intercept")
      .orderBy("l_returnflag")
  }

  private val q44Sql =
    """SELECT l_returnflag, n, slope, (sy - slope * sx) / n AS intercept
      |FROM (
      | SELECT l_returnflag, n, sx, sy,
      |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
      | FROM (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |   CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |   CAST(SUM(x * y) AS DOUBLE) AS sxy,
      |   CAST(SUM(x * x) AS DOUBLE) AS sxx
      |  FROM (SELECT l_returnflag,
      |         CAST(l_quantity AS DECIMAL(18,2)) AS x,
      |         CAST(l_extendedprice AS DECIMAL(18,2)) AS y
      |        FROM lineitem)
      |  GROUP BY 1))
      |ORDER BY 1""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01, Some(q01Sql)),
    Q("q02_filter_topk", q02, Some(q02Sql)),
    Q("q03_shipping_priority", q03, Some(q03Sql)),
    Q("q04_broadcast_brand", q04, Some(q04Sql)),
    Q("q05_regional_revenue", q05, Some(q05Sql)),
    Q("q06_forecast_revenue", q06, Some(q06Sql)),
    Q("q07_semi_join_exists", q07, Some(q07Sql)),
    Q("q08_anti_join_not_exists", q08, Some(q08Sql)),
    Q("q09_window_topn", q09, Some(q09Sql)),
    Q("q10_window_running_sum", q10, Some(q10Sql)),
    Q("q11_window_lag_gaps", q11, Some(q11Sql)),
    Q("q12_set_ops", q12, Some(q12Sql)),
    Q("q13_rollup", q13, Some(q13Sql)),
    Q("q14_cube", q14, Some(q14Sql)),
    Q("q15_conditional_agg", q15, Some(q15Sql)),
    Q("q16_string_funcs", q16, Some(q16Sql)),
    Q("q17_date_parts", q17, Some(q17Sql)),
    Q("q18_math_funcs", q18, Some(q18Sql)),
    Q("q19_window_vs_mean", q19, Some(q19Sql)),
    Q("q20_ntile", q20, Some(q20Sql)),
    Q("q21_count_distinct", q21, Some(q21Sql)),
    Q("q22_having_topk", q22, Some(q22Sql)),
    Q("q23_salted_agg", q23, Some(q23Sql)),
    Q("q24_approx_distinct", q24, Some(q24Sql)),
    Q("q24_exact_distinct", q24e, Some(q24eSql)),
    Q("q25_scalar_breadth", q25, Some(q25Sql)),
    Q("q26_window_breadth", q26, Some(q26Sql)),
    Q("q27_outer_join", q27, Some(q27Sql)),
    Q("q28_grouping_sets", q28, Some(q28Sql)),
    Q("q29_array_funcs", q29, Some(q29Sql)),
    Q("q30_null_funcs", q30, Some(q30Sql)),
    Q("q31_range_join", q31, Some(q31Sql)),
    Q("q32_exact_quantiles", q32, Some(q32Sql)),
    Q("q33_exact_corr", q33, Some(q33Sql)),
    Q("q34_histogram", q34, Some(q34Sql)),
    Q("q35_salted_join", q35, Some(q35Sql)),
    Q("q36_sql_exists", q36, Some(q36Sql)),
    Q("q37_multiset_ops", q37, Some(q37Sql)),
    Q("q38_unpivot", q38, Some(q38Sql)),
    Q("q39_multi_distinct", q39, Some(q39Sql)),
    Q("q40_bloom_join", q40, Some(q40Sql)),
    Q("q41_map_funcs", q41, Some(q41Sql)),
    Q("q42_interval_join", q42, Some(q42Sql)),
    Q("q43_recursive_cte", q43, Some(q43Sql)),
    Q("q44_regression", q44, Some(q44Sql)),
  )
}
