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

  test("intervalJoin equals the naive range join; half-open bounds; bad intervals dropped") {
    val rnd = new scala.util.Random(9)
    // negative and positive points: bucket arithmetic must stay
    // consistent across zero (exact floor division via pmod)
    val points = (1 to 500).map(i => (i.toLong, (rnd.nextInt(2000) - 1000).toLong))
      .toDF("pid", "p")
    // interval lengths straddle the bucket width (some span many buckets),
    // plus an inverted and an empty interval that must match nothing
    val intervals = ((1 to 60).map { i =>
      val s = (rnd.nextInt(1900) - 1000).toLong
      (i.toLong, s, s + 1 + rnd.nextInt(200))
    } ++ Seq((900L, 500L, 500L), (901L, 600L, 400L)))
      .toDF("iid", "s", "e")
    val bucketed = ScaleOps.intervalJoin(points, "p", intervals, "s", "e", 64L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("s") && col("p") < col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(!bucketed.exists(_._2 >= 900L)) // empty/inverted never match
    // boundary semantics: start inclusive, end exclusive
    val bp = Seq((1L, 10L), (2L, 19L), (3L, 20L)).toDF("pid", "p")
    val bi = Seq((7L, 10L, 20L)).toDF("iid", "s", "e")
    val hits = ScaleOps.intervalJoin(bp, "p", bi, "s", "e", 8L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(hits === Set(1L, 2L))
    // shared non-reserved column names are refused up front (they would
    // otherwise die later as an ambiguous-reference AnalysisException)
    val clash = Seq((1L, 5L)).toDF("iid", "p")
    val exc = intercept[IllegalArgumentException] {
      ScaleOps.intervalJoin(clash, "p", bi, "iid", "e", 8L)
    }
    assert(exc.getMessage.contains("disjoint"))
  }

  test("q24 exact gate agrees with the combined gate's exact branch") {
    val exact = SparkEntry.queries("q24_exact_distinct")(spark, dir)
      .select("l_returnflag", "exact_parts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val combined = SparkEntry.queries("q24_approx_distinct")(spark, dir)
      .select("l_returnflag", "exact_parts").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact === combined)
  }

  test("bloomJoin equals the plain join, including keys absent from the build side") {
    // fact keys 1..2000, build keys only the multiples of 7 — the bloom
    // must never drop a true match (no false negatives), and the exact
    // join must erase any false positives the sketch lets through
    val fact = (1 to 2000).map(i => (i.toLong, i * 10L)).toDF("k", "v")
    val build = (1 to 2000).filter(_ % 7 == 0)
      .map(i => (i.toLong, s"b$i")).toDF("k", "name")
    val viaBloom = ScaleOps.bloomJoin(fact, build, "k", expectedKeys = 1000)
      .select("k", "v", "name").orderBy("k").collect()
    val plain = fact.join(build, Seq("k"))
      .select("k", "v", "name").orderBy("k").collect()
    assert(viaBloom.toSeq === plain.toSeq)
    assert(plain.length === 2000 / 7)
  }

  test("saltedJoin equals the plain join on a skewed key") {
    // every 10th fact row collapses onto key 1 — a hot key
    val fact = (1 to 1000)
      .map(i => (if (i % 10 == 0) 1L else i.toLong, i.toLong))
      .toDF("k", "id")
    val dim = (1 to 1000).map(i => (i.toLong, s"d$i")).toDF("k", "name")
    val salted = ScaleOps.saltedJoin(fact, dim, "k", col("id"), 8)
      .select("k", "id", "name").orderBy("k", "id").collect()
    val plain = fact.join(dim, Seq("k"))
      .select("k", "id", "name").orderBy("k", "id").collect()
    assert(salted.toSeq === plain.toSeq)
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

  test("exact positional quantiles match a driver-side sort on sf0.001") {
    val li = Tables.t(spark, dir, "lineitem")
    val rows = SparkEntry.queries("q32_exact_quantiles")(spark, dir).collect()
    rows.foreach { r =>
      val flag = r.getString(0)
      val sorted = li.filter(col("l_returnflag") === flag)
        .select(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
        .collect()
        .sortBy(x => (x.getDouble(0), x.getLong(1), x.getInt(2)))
        .map(_.getDouble(0))
      val n = sorted.length
      assert(r.getLong(3) === n.toLong)
      assert(r.getDouble(1) === sorted((n + 1) / 2 - 1), s"median $flag")
      assert(r.getDouble(2) === sorted(math.max(1, 9 * n / 10) - 1), s"p90 $flag")
    }
  }

  test("exact-decimal corr agrees with built-in corr to FP tolerance; =1 on linear data") {
    val got = SparkEntry.queries("q33_exact_corr")(spark, dir).collect()
    val builtin = Tables.t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.foreach { r =>
      assert(math.abs(r.getDouble(2) - builtin(r.getString(0))) < 1e-9)
    }
    // perfectly linear relation → corr 1 (sanity of the closed form)
    val lin = (1 to 100).map(i => ("k", i.toDouble, 3.0 * i + 7)).toDF("g", "x", "y")
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(18,2)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(18,2)")).cast("double").as("sy"),
        sum((col("x") * col("y")).cast("decimal(18,2)")).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast("decimal(18,2)")).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast("decimal(18,2)")).cast("double").as("syy"))
      .select(((col("n") * col("sxy") - col("sx") * col("sy")) /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy")))).as("c"))
      .collect()(0).getDouble(0)
    assert(math.abs(lin - 1.0) < 1e-12)
  }

  test("histogram buckets partition all rows and cap at the overflow bucket") {
    val got = SparkEntry.queries("q34_histogram")(spark, dir).collect()
    val total = got.map(_.getLong(2)).sum
    assert(total === Tables.t(spark, dir, "orders").count())
    assert(got.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 9))
  }

  test("approx_count_distinct is within its error bound of exact") {
    // direct HLL pin (the gate's output is now fully deterministic —
    // exact + KMV — so the engine-specific HLL estimate lives here and
    // in the gate's own require(), not in the compared output)
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct, col}
    val li = Tables.t(spark, dir, "lineitem")
    val got = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact_parts"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val approx = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx $approx too far from exact $exact")
    }
  }

  test("KMV distinct sketch: estimator branches and determinism") {
    val got = SparkEntry.queries("q24_approx_distinct")(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val kmv = r.getAs[Long]("kmv_parts").toDouble
      // below k=256 distinct values KMV is EXACT by construction (the
      // sketch holds every distinct hash); at or above, the estimator
      // must land within ~4 sigma. sf0.001 exercises the exact branch
      // here; sf0.01 Verify and the 10x sweep exercise the estimator.
      if (exact < 256) assert(kmv === exact,
        s"KMV must be exact below k: $kmv vs $exact")
      else assert(math.abs(kmv - exact) / exact < 0.25,
        s"KMV $kmv too far from exact $exact")
    }
    // determinism: a second evaluation is bit-identical (no RNG, no
    // accumulation-order dependence anywhere in the estimator)
    val again = SparkEntry.queries("q24_approx_distinct")(spark, dir).collect()
    assert(got.map(_.toString).toSeq === again.map(_.toString).toSeq)
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
