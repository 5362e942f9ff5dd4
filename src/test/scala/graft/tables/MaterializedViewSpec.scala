package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Incremental materialized aggregate views: delta refresh from the
  * change feed must equal a from-scratch recompute after EVERY kind of
  * source mutation, including the IVM corner cases (group death,
  * all-null sums, min/max under deletes). */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("mv-")
  spark.conf.set("spark.sql.catalog.gmv", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmv.root", root)
  private def store = new TableStore(spark, root)

  private def recompute(src: String): DataFrame =
    store.read(src).groupBy("g")
      .agg(count(lit(1)).as("cnt"),
        sum(col("x")).as("sum_x"), count(col("x")).as("cnt_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))

  private def assertMatches(mv: String, src: String): Unit = {
    val got = store.read(mv)
      .select("g", "cnt", "sum_x", "cnt_x", "min_y", "max_y")
      .collect().map(_.toString).sorted.toSeq
    val want = recompute(src).collect().map(_.toString).sorted.toSeq
    assert(got === want)
  }

  test("delta refresh equals recompute through every mutation kind (auto off)") {
    // auto=false pins the DELTA algebra itself on every mutation kind;
    // the cost-based policy that may choose recompute is pinned below
    def refresh() = MaterializedView.refresh(store, "mv", auto = false)
    val rows = Seq[(String, java.lang.Long, java.lang.Long)](
      ("a", 1L, 10L), ("a", 2L, 20L), ("b", 5L, 5L), ("b", null, 7L))
    store.create("src", rows.toDF("g", "x", "y").schema)
    store.append("src", rows.toDF("g", "x", "y"))
    val groups = MaterializedView.create(store, "mv", "src",
      Seq("g"), Seq("sum:x", "min:y", "max:y"))
    assert(groups === 2L)
    assertMatches("mv", "src")
    // no changes → none, nothing committed
    val v0 = store.currentVersion("mv")
    assert(refresh() === ((0L, 2, 2, "none")))
    assert(store.currentVersion("mv") === v0)
    // pure append: existing group grows, a NEW group is born
    store.append("src", Seq[(String, java.lang.Long, java.lang.Long)](
      ("a", 4L, 5L), ("c", 9L, 9L)).toDF("g", "x", "y"))
    val (n1, _, _, m1) = refresh()
    assert(n1 === 2L && m1 === "incremental")
    assertMatches("mv", "src")
    // CoW delete killing group c entirely AND removing group a's min y —
    // the dirty-group repair path for min/max
    store.delete("src", col("g") === "c" ||
      (col("g") === "a" && col("y") === 5L))
    val (n2, _, _, _) = refresh()
    assert(n2 === 2L)
    assertMatches("mv", "src")
    assert(store.read("mv").filter(col("g") === "c").count() === 0L,
      "a dead group leaves the view")
    // merge-on-read tombstone (pending at refresh time)
    store.deleteMoR("src", Seq(2L).toDF("x"), Seq("x"))
    refresh()
    assertMatches("mv", "src")
    // sum null semantics: group b loses its only non-null x — the sum
    // must go NULL (not 0), which the non-null companion count carries
    store.delete("src", col("g") === "b" && col("x") === 5L)
    refresh()
    assertMatches("mv", "src")
    val bRow = store.read("mv").filter(col("g") === "b").head()
    assert(bRow.isNullAt(bRow.fieldIndex("sum_x")),
      "an all-null group sums to NULL, never 0")
    // idempotent afterwards
    assert(refresh()._4 === "none")
  }

  test("clean min/max merge stays incremental when no delete touched them") {
    val rows = Seq(("a", 1L, 10L), ("b", 2L, 20L))
    store.create("src2", rows.toDF("g", "x", "y").schema)
    store.append("src2", rows.toDF("g", "x", "y"))
    MaterializedView.create(store, "mv2", "src2",
      Seq("g"), Seq("sum:x", "min:y", "max:y"))
    // inserts only: least/greatest fold without touching the source
    store.append("src2", Seq(("a", 7L, 3L), ("b", 1L, 99L))
      .toDF("g", "x", "y"))
    val (n, _, _, mode) = MaterializedView.refresh(store, "mv2")
    assert(n === 2L && mode === "incremental")
    val a = store.read("mv2").filter(col("g") === "a").head()
    assert(a.getAs[Long]("min_y") === 3L && a.getAs[Long]("max_y") === 10L)
    val b = store.read("mv2").filter(col("g") === "b").head()
    assert(b.getAs[Long]("min_y") === 20L && b.getAs[Long]("max_y") === 99L)
  }

  test("null group keys refuse loudly; stale incarnation needs full") {
    val rows = Seq(("a", 1L, 1L)).toDF("g", "x", "y")
    store.create("src3", rows.schema)
    store.append("src3", rows)
    MaterializedView.create(store, "mv3", "src3", Seq("g"), Seq("sum:x"))
    store.append("src3",
      Seq[(String, java.lang.Long, java.lang.Long)]((null, 2L, 2L))
        .toDF("g", "x", "y"))
    val e = intercept[IllegalArgumentException](
      MaterializedView.refresh(store, "mv3", auto = false))
    assert(e.getMessage.contains("NULL group-key"))
    // even after the source is fixed, the FEED INTERVAL still carries
    // the null-group rows — incremental stays refused; full refresh
    // (which aggregates the current snapshot, not the feed) recovers
    store.delete("src3", col("g").isNull)
    val e1b = intercept[IllegalArgumentException](
      MaterializedView.refresh(store, "mv3", auto = false))
    assert(e1b.getMessage.contains("NULL group-key"))
    assert(MaterializedView.refresh(store, "mv3", full = true)._4 === "full")
    store.drop("src3", force = true)
    store.create("src3", rows.schema)
    store.append("src3", Seq(("z", 42L, 1L)).toDF("g", "x", "y"))
    val e2 = intercept[RuntimeException](
      MaterializedView.refresh(store, "mv3"))
    assert(e2.getMessage.contains("re-created"))
    val (_, _, _, mode) = MaterializedView.refresh(store, "mv3", full = true)
    assert(mode === "full")
    val got = store.read("mv3").select("g", "cnt", "sum_x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("z", 1L, 42L)))
  }

  test("cost-based refresh: big mutations recompute, small appends fold") {
    val rows = (0L until 2000L).map(i => (s"g${i % 10}", i, i))
      .toDF("g", "x", "y")
    store.create("src5", rows.schema)
    store.append("src5", rows)
    MaterializedView.create(store, "mv5", "src5",
      Seq("g"), Seq("sum:x", "min:y"))
    // a one-row append: feed scope ≪ table → the delta plan folds
    store.append("src5", Seq(("g1", 1L, 1L)).toDF("g", "x", "y"))
    assert(MaterializedView.refresh(store, "mv5")._4 === "incremental")
    // a table-wide CoW delete: metadata says the delta would read the
    // rewrite scope twice PLUS a min/max repair pass — more than one
    // table scan, so the refresh recomputes instead (mode full-auto)
    store.delete("src5", col("x") % 2L === 0L)
    val (_, _, _, mode) = MaterializedView.refresh(store, "mv5")
    assert(mode === "full-auto",
      "a change scope above one table scan must pick recompute")
    // either plan lands on the same values: x and g share parity, so
    // even groups die entirely and odd groups keep all 200 rows
    // (g1 also has the folded append row)
    val got = store.read("mv5").select("g", "cnt").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got("g1") === 201L && got("g3") === 200L && !got.contains("g0"),
      s"recompute path values wrong: $got")
    // quiet again afterwards
    assert(MaterializedView.refresh(store, "mv5")._4 === "none")
  }

  test("a snapshot-cloned view refuses delta refresh until re-baselined") {
    // table PROPERTIES carry through CALL snapshot but commit META does
    // not: the clone has no applied-version tag, and guessing one (the
    // old getOrElse(0)) would re-fold the whole source history onto
    // already-full contents — silently doubling every count and sum
    val rows = Seq(("a", 1L, 1L), ("b", 2L, 2L)).toDF("g", "x", "y")
    store.create("src6", rows.schema)
    store.append("src6", rows)
    MaterializedView.create(store, "mv6", "src6", Seq("g"), Seq("sum:x"))
    store.snapshotTable("mv6", "mv6c")
    val e = intercept[RuntimeException](
      MaterializedView.refresh(store, "mv6c"))
    assert(e.getMessage.contains("re-baselines"))
    // full refresh re-baselines the clone against the live source
    store.append("src6", Seq(("a", 10L, 3L)).toDF("g", "x", "y"))
    assert(MaterializedView.refresh(store, "mv6c", full = true)._4 === "full")
    val got = store.read("mv6c").select("g", "cnt", "sum_x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got === Seq(("a", 2L, 11L), ("b", 1L, 2L)))
    // and from then on it folds deltas like any view
    store.append("src6", Seq(("b", 5L, 4L)).toDF("g", "x", "y"))
    assert(MaterializedView.refresh(store, "mv6c")._4 === "incremental")
    assert(store.read("mv6c").filter(col("g") === "b").head()
      .getAs[Long]("sum_x") === 7L)
  }

  // ---- transparent rewrite -----------------------------------------------

  private def scansV2(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => s
    }.nonEmpty

  private def v1ScanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten

  test("transparent rewrite: plain GROUP BY plans onto a FRESH view, zero source reads") {
    spark.sql("CREATE TABLE gmv.rw (g STRING, x BIGINT, d DECIMAL(12,2))")
    spark.sql("INSERT INTO gmv.rw VALUES ('a', 1, 1.50), ('a', 2, 2.25), " +
      "('b', 3, 10.00), ('b', null, 4.75)")
    spark.sql("CALL gmv.system.create_mview(mview => 'rwmv', " +
      "source => 'rw', group_cols => 'g', " +
      "aggs => 'sum:x,avg:d,min:x,max:x')")
    val q = "SELECT g, count(*) AS cnt, count(x) AS cx, sum(x) AS sx, " +
      "avg(d) AS ad, min(x) AS mn, max(x) AS mx " +
      "FROM gmv.rw GROUP BY g ORDER BY g"
    val df = spark.sql(q)
    // the plan READS THE VIEW: no V2 source scan survives, and the only
    // file relation is the view's
    assert(!scansV2(df), df.queryExecution.optimizedPlan.toString)
    val roots = v1ScanRoots(df)
    assert(roots.nonEmpty && roots.forall(_.contains("/rwmv/")),
      s"expected only view files, got $roots")
    // …and produces EXACTLY the values the scan would (avg included:
    // decimal divide + cast replicate Spark's Average lowering)
    val got = df.collect().toSeq
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    val want = try {
      val w = spark.sql(q)
      assert(scansV2(w), "disabled rewrite must keep the source scan")
      w.collect().toSeq
    } finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
    assert(got === want)
    // a query the view cannot answer keeps the scan: WHERE over rows
    assert(scansV2(spark.sql(
      "SELECT g, count(*) AS c FROM gmv.rw WHERE x > 1 GROUP BY g")))
    // DISTINCT aggregates keep the scan
    assert(scansV2(spark.sql(
      "SELECT g, count(DISTINCT x) AS c FROM gmv.rw GROUP BY g")))
    // different grouping keeps the scan
    assert(scansV2(spark.sql(
      "SELECT x, count(*) AS c FROM gmv.rw GROUP BY x")))
  }

  test("transparent rewrite: stale view falls back, refresh re-arms it") {
    spark.sql("CREATE TABLE gmv.rw2 (g STRING, x BIGINT)")
    spark.sql("INSERT INTO gmv.rw2 VALUES ('a', 1), ('b', 2)")
    spark.sql("CALL gmv.system.create_mview(mview => 'rw2mv', " +
      "source => 'rw2', group_cols => 'g', aggs => 'sum:x')")
    val q = "SELECT g, sum(x) AS sx FROM gmv.rw2 GROUP BY g ORDER BY g"
    assert(!scansV2(spark.sql(q)), "fresh view serves the query")
    // source moves ahead → the view is STALE → the query must scan (and
    // see the new row the view does not hold)
    spark.sql("INSERT INTO gmv.rw2 VALUES ('c', 9)")
    val stale = spark.sql(q)
    assert(scansV2(stale), "a stale view must never serve the query")
    assert(stale.collect().map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    // refresh re-arms the rewrite, values carry the fold
    spark.sql("CALL gmv.system.refresh_mview(mview => 'rw2mv')")
    val df = spark.sql(q)
    assert(!scansV2(df), "a refreshed view serves again")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 1L), ("b", 2L), ("c", 9L)))
  }

  test("rollup rewrite: a SUBSET of the view's keys (and the global aggregate) re-aggregate the view") {
    spark.sql("CREATE TABLE gmv.rw3 (g STRING, h STRING, x BIGINT, " +
      "d DECIMAL(12,2))")
    spark.sql("INSERT INTO gmv.rw3 VALUES " +
      "('a','p',1,1.10), ('a','q',2,2.20), ('b','p',3,3.30), " +
      "('b','q',4,4.40), ('b','q',null,5.50)")
    spark.sql("CALL gmv.system.create_mview(mview => 'rw3mv', " +
      "source => 'rw3', group_cols => 'g,h', " +
      "aggs => 'sum:x,avg:d,min:x,max:x')")
    def check(q: String): Unit = {
      val df = spark.sql(q)
      assert(!scansV2(df), s"must rewrite: $q\n" +
        df.queryExecution.optimizedPlan.toString)
      val got = df.collect().toSeq
      spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
      val want = try spark.sql(q).collect().toSeq
        finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
      assert(got === want, s"rollup values diverge for: $q")
    }
    // exact grouping (both keys, any order)
    check("SELECT h, g, count(*) AS c, sum(x) AS sx FROM gmv.rw3 " +
      "GROUP BY h, g ORDER BY h, g")
    // subset grouping: re-aggregates the view (count=sum cnt, sum of
    // sums, min of mins, avg from the re-summed decimal pair)
    check("SELECT g, count(*) AS c, count(x) AS cx, sum(x) AS sx, " +
      "avg(d) AS ad, min(x) AS mn, max(x) AS mx FROM gmv.rw3 " +
      "GROUP BY g ORDER BY g")
    // keys-only subset (SELECT DISTINCT shape)
    check("SELECT g FROM gmv.rw3 GROUP BY g ORDER BY g")
    // arbitrary SCALAR structure over mapped aggregates re-applies
    // verbatim over the substituted view columns (ratio + cast + key
    // arithmetic in one output)
    check("SELECT g, CAST(sum(x) AS DOUBLE) / count(x) AS r, " +
      "concat(g, '!') AS gx FROM gmv.rw3 GROUP BY g ORDER BY g")
    // GLOBAL aggregate: empty grouping re-aggregates everything
    check("SELECT count(*) AS c, sum(x) AS sx, avg(d) AS ad, " +
      "min(x) AS mn FROM gmv.rw3")
    // empty-source semantics: global over an empty table is ONE row of
    // zero/nulls — through the view too
    spark.sql("CREATE TABLE gmv.rw4 (g STRING, x BIGINT)")
    spark.sql("CALL gmv.system.create_mview(mview => 'rw4mv', " +
      "source => 'rw4', group_cols => 'g', aggs => 'sum:x')")
    check("SELECT count(*) AS c, sum(x) AS sx FROM gmv.rw4")
    // a non-subset grouping keeps the scan
    assert(scansV2(spark.sql(
      "SELECT x, count(*) AS c FROM gmv.rw3 GROUP BY x")))
  }

  test("transparent rewrite covers the programmatic read path too") {
    // decimal(12,2): ABOVE Spark's DecimalAggregates threshold — small
    // precisions get pre-lowered to avg(UnscaledValue(d)) in the main
    // optimizer (double-accumulated), which the rule refuses by the
    // same exactness policy as integral avg (boundary pinned below)
    val rows = Seq(("a", 1L, "1.50"), ("a", 2L, "2.50"), ("b", 5L, "9.00"))
      .toDF("g", "x", "d0")
      .withColumn("d", col("d0").cast("decimal(12,2)")).drop("d0")
    store.create("src8", rows.schema)
    store.append("src8", rows)
    MaterializedView.create(store, "mv8", "src8", Seq("g"),
      Seq("sum:x", "avg:d"))
    val df = store.read("src8").groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("x")).as("sx"),
        avg(col("d")).as("ad"))
      .orderBy("g")
    assert(df.inputFiles.nonEmpty &&
      df.inputFiles.forall(_.contains("/mv8/")),
      s"V1 path must rewrite too: ${df.inputFiles.mkString(",")}")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getDecimal(3).toPlainString)).toSeq ===
      Seq(("a", 2L, 3L, "2.000000"), ("b", 1L, 5L, "9.000000")))
    // avg:d stored the sum/cnt PAIR (no separate state)
    val sch = store.schema("mv8").fieldNames.toSeq
    assert(sch.contains("sum_d") && sch.contains("cnt_d"))
    // avg over an INTEGRAL column must KEEP the scan: Spark's Average
    // accumulates non-decimal input in DOUBLE — the view's exact Long
    // sum is not guaranteed bit-equal (ulps past 2^53, wrap on
    // overflow), and freshness must never change results
    val keep = store.read("src8").groupBy("g").agg(avg(col("x")).as("ax"))
    assert(keep.inputFiles.exists(_.contains("/src8/")),
      "integral avg is excluded from the rewrite by policy")
    // SMALL-precision decimal avg gets DecimalAggregates-lowered to a
    // double-accumulated avg(UnscaledValue(d)) before our batch — the
    // same policy refuses it (the child is no longer a bare column)
    val rows2 = Seq(("a", "1.50"), ("a", "2.25"), ("b", "4.00"))
      .toDF("g", "d0")
      .withColumn("ds", col("d0").cast("decimal(8,2)")).drop("d0")
    store.create("src8s", rows2.schema)
    store.append("src8s", rows2)
    MaterializedView.create(store, "mv8s", "src8s", Seq("g"), Seq("avg:ds"))
    val keep2 = store.read("src8s").groupBy("g").agg(avg(col("ds")).as("ad"))
    assert(keep2.inputFiles.exists(_.contains("/src8s/")),
      "DecimalAggregates-lowered avg keeps the scan by policy")
    // …but the lowered SUM shape (MakeDecimal over an unscaled-long
    // fold — exact modular arithmetic) DOES map, via the stored sum's
    // unscaled value; rollup to the global aggregate included
    val low = store.read("src8s").groupBy("g").agg(sum(col("ds")).as("sd"))
      .orderBy("g")
    assert(low.inputFiles.nonEmpty &&
      low.inputFiles.forall(_.contains("/mv8s/")),
      s"lowered decimal sum must serve: ${low.inputFiles.mkString(",")}")
    assert(low.collect().map(r => (r.getString(0),
      r.getDecimal(1).toPlainString)).toSeq ===
      Seq(("a", "3.75"), ("b", "4.00")))
    val lowG = store.read("src8s").agg(sum(col("ds")).as("sd"))
    assert(lowG.inputFiles.forall(_.contains("/mv8s/")),
      "global rollup of the lowered sum serves too")
    assert(lowG.head().getDecimal(0).toPlainString === "7.75")
  }

  test("filtered view: WHERE folds symmetrically; never serves unfiltered queries") {
    val rows = Seq(("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L))
      .toDF("g", "x")
    store.create("src9", rows.schema)
    store.append("src9", rows)
    MaterializedView.create(store, "mv9", "src9", Seq("g"),
      Seq("sum:x", "min:x"), where = Some("x % 2 = 0"))
    def want: Seq[String] = store.read("src9").filter(expr("x % 2 = 0"))
      .groupBy("g").agg(count(lit(1)).as("cnt"), sum(col("x")).as("sum_x"),
        count(col("x")).as("cnt_x"), min(col("x")).as("min_x"))
      .collect().map(_.toString).sorted.toSeq
    def got: Seq[String] = store.read("mv9")
      .select("g", "cnt", "sum_x", "cnt_x", "min_x")
      .collect().map(_.toString).sorted.toSeq
    assert(got === want)
    // append odd+even rows: only qualifying CHANGES fold
    store.append("src9", Seq(("a", 7L), ("a", 8L), ("c", 6L)).toDF("g", "x"))
    assert(MaterializedView.refresh(store, "mv9", auto = false)._4
      === "incremental")
    assert(got === want)
    // delete an even row (dirty min repair under the filter)
    store.delete("src9", col("x") === 4L)
    MaterializedView.refresh(store, "mv9", auto = false)
    assert(got === want)
    // delete of filter-EXCLUDED rows only: nothing qualifies, no commit
    store.delete("src9", col("x") === 7L)
    assert(MaterializedView.refresh(store, "mv9", auto = false)._4 === "none")
    // a filtered view must never serve the plain (unfiltered) GROUP BY
    val plain = store.read("src9").groupBy("g")
      .agg(sum(col("x")).as("sum_x"))
    assert(plain.inputFiles.exists(_.contains("/src9/")),
      "filtered views are maintenance-only — no transparent rewrite")
  }

  test("dirty-group repair FILE-PRUNES on a hidden-partitioned (bucketed) source") {
    // SCALE claim pinned: the min/max repair re-aggregates exactly the
    // dirty groups from the pinned snapshot, and on a source laid out
    // bucket(8, g) the small-dirty-set IN filter reaches the scan as a
    // bucket-arithmetic probe — whole directories of clean groups are
    // never read. Functional equality on the hidden-partitioned source
    // plus a scan-count pin of the exact filter shape the repair issues.
    val rows = (0L until 4000L).map(i => (s"g${i % 40}", i, i))
      .toDF("g", "x", "y")
    store.create("srcB", rows.schema, partitionBy = Seq("bucket(8,g)"))
    store.append("srcB", rows)
    MaterializedView.create(store, "mvB", "srcB",
      Seq("g"), Seq("sum:x", "min:y"))
    // delete ONE group's minimum rows → the dirty set is {g7} and the
    // repair path must fire (min broke monotonicity)
    store.delete("srcB", col("g") === "g7" && col("y") < 500L)
    assert(MaterializedView.refresh(store, "mvB", auto = false)._4
      === "incremental")
    val got = store.read("mvB").select("g", "cnt", "sum_x", "min_y")
      .collect().map(_.toString).sorted.toSeq
    val want = store.read("srcB").groupBy("g")
      .agg(count(lit(1)).as("cnt"), sum(col("x")).as("sum_x"),
        min(col("y")).as("min_y"))
      .collect().map(_.toString).sorted.toSeq
    assert(got === want,
      "repair on a bucketed source must equal recompute")
    // the repair's scan shape: single-group IN filter over the bucketed
    // layout — bucket arithmetic prunes the other buckets' files
    val shape = store.read("srcB").filter(col("g").isin("g7"))
    shape.count()
    val counts = shape.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.asInstanceOf[ZoneMapFileIndex]
    }.flatMap(_.lastScanCounts)
    val (cand, surv) = (counts.map(_._1).sum, counts.map(_._2).sum)
    assert(cand >= 8, s"bucketed layout should hold >=8 files, got $cand")
    assert(surv * 4 <= cand,
      s"the dirty-group probe must file-prune: $surv of $cand files read")
  }

  test("unsupported aggregate specs refuse loudly") {
    val rows = Seq(("a", 1L)).toDF("g", "x")
    store.create("srcA", rows.schema)
    store.append("srcA", rows)
    val e = intercept[IllegalArgumentException](MaterializedView.create(
      store, "mvA", "srcA", Seq("g"), Seq("median:x")))
    assert(e.getMessage.contains("unknown aggregate spec"))
    val e2 = intercept[IllegalArgumentException](MaterializedView.create(
      store, "mvA", "srcA", Seq("g"), Seq("sum:x"), where = Some("  ")))
    assert(e2.getMessage.contains("empty WHERE"))
  }

  test("SQL faces: CALL create_mview / refresh_mview") {
    spark.sql("CREATE TABLE gmv.src4 (g STRING, x BIGINT, y BIGINT)")
    spark.sql("INSERT INTO gmv.src4 VALUES ('a', 1, 1), ('a', 2, 2), ('b', 3, 3)")
    val c = spark.sql("CALL gmv.system.create_mview(mview => 'mv4', " +
      "source => 'src4', group_cols => 'g', aggs => 'sum:x')").head()
    assert(c.getLong(0) === 2L)
    spark.sql("INSERT INTO gmv.src4 VALUES ('b', 10, 4)")
    val r = spark.sql("CALL gmv.system.refresh_mview(mview => 'mv4')").head()
    assert(r.getLong(0) === 1L && r.getString(3) === "incremental")
    assert(spark.sql("SELECT sum_x FROM gmv.mv4 WHERE g = 'b'")
      .head().getLong(0) === 13L)
    // the MV is an ordinary queryable table with history
    assert(spark.sql("SELECT count(*) FROM gmv.mv4").head().getLong(0) === 2L)
  }
}
