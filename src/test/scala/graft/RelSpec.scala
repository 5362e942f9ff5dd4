package graft

import org.apache.spark.sql.functions._
import graft.ops.{Rel, ScaleOps, Tables}

class RelSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("every registered query returns rows on sf0.001") {
    val skipEmpty = Set[String]() // all queries must be non-trivial
    SparkEntry.registry.foreach { q =>
      val n = q.fn(spark, dir).count()
      assert(n > 0 || skipEmpty(q.name), s"${q.name} returned 0 rows")
    }
  }

  test("salted two-phase aggregation equals the plain groupBy") {
    val li = Tables.t(spark, dir, "lineitem")
    val salted = ScaleOps.saltedSumCount(li, Seq("l_returnflag"),
      col("l_orderkey"), 16, col("l_quantity").cast("decimal(18,2)"), "s")
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2)))
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2)))
    assert(salted.map(t => (t._1, t._2.doubleValue, t._3)).toSeq
      === plain.map(t => (t._1, t._2.doubleValue, t._3)).toSeq)
  }

  test("approx_count_distinct is within its error bound of exact") {
    val got = SparkEntry.queries("q24_approx_distinct")(spark, dir).collect()
    got.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val approx = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx $approx too far from exact $exact")
    }
  }

  /** The reference IT's SQL surface (T1–T6): INSERT INTO … VALUES with
    * array/map/timestamp literals, read back sorted
    * (SparkDestinationStreamIT.java:343-352,381-383). */
  test("SQL literal surface: insert with array/map/timestamp literals") {
    spark.sql("DROP TABLE IF EXISTS sql_surface")
    spark.sql(
      """CREATE TABLE sql_surface (
        | s STRING, ts TIMESTAMP, arr ARRAY<STRING>, i INT, f FLOAT,
        | m MAP<STRING, STRING>) USING parquet""".stripMargin)
    try {
      spark.sql(
        """INSERT INTO sql_surface VALUES
          | ('trace 2', timestamp '2024-05-01 10:00:00', array('trace 2'),
          |  2, 2.5, map('baz', 'foo')),
          | ('trace 1', timestamp '2024-05-01 09:00:00', array('a', 'b'),
          |  1, 1.5, map('k', 'v'))""".stripMargin)
      val rows = spark.table("sql_surface").orderBy("i").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[String]("s") === "trace 1")
      assert(rows(1).getSeq[String](2) === Seq("trace 2"))
      assert(rows(1).getAs[Map[String, String]]("m") === Map("baz" -> "foo"))
      assert(rows(1).getAs[Float]("f") === 2.5f)
    } finally spark.sql("DROP TABLE IF EXISTS sql_surface")
  }
}
