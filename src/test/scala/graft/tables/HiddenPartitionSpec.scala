package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hidden-partitioning transforms (`days(ts)`, `bucket(n,key)`,
  * `truncate(w,col)`, `months`/`years`/`hours`) — the Iceberg partition
  * model the reference inherits (SparkUtils.java:46). The defining
  * property under test: queries filter on the SOURCE column only, and
  * the store prunes partition DIRECTORIES by mapping the predicate
  * through the transform — the user never names the derived column. */
class HiddenPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): TableStore = new TableStore(spark, tmpDir("hidp-"))

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def indexesOf(df: org.apache.spark.sql.DataFrame): Seq[ZoneMapFileIndex] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[HadoopFsRelation]
          .location.asInstanceOf[ZoneMapFileIndex]
    }

  private def scanned(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    df.collect()
    val counts = indexesOf(df).flatMap(_.lastScanCounts)
    (counts.map(_._1).sum, counts.map(_._2).sum)
  }

  private val eventsDf = Seq(
    (1L, ts("2024-01-01 08:30:00"), 10L, 1.0),
    (2L, ts("2024-01-01 17:10:00"), 11L, 2.0),
    (3L, ts("2024-01-02 09:00:00"), 12L, 3.0),
    (4L, ts("2024-01-03 23:59:59"), 10L, 4.0),
    (5L, ts("2024-02-15 00:00:00"), 13L, 5.0),
    (6L, ts("2024-03-20 12:00:00"), 14L, 6.0)
  ).toDF("id", "ts", "user", "v").coalesce(1)

  test("days transform: dirs derive, source column stays data") {
    val st = newStore()
    st.create("t", eventsDf.schema, partitionBy = Seq("days(ts)"))
    st.append("t", eventsDf)
    // layout: ts_day=YYYY-MM-DD directories
    val rels = st.currentRelPaths("t")
    assert(rels.nonEmpty)
    assert(rels.forall(_.matches("""ts_day=\d{4}-\d{2}-\d{2}/.*\.parquet""")),
      rels.mkString(", "))
    assert(rels.map(_.split('/').head).distinct.size === 5) // 5 distinct days
    // read-back is the full table, ts itself intact (it lives in files)
    val back = st.read("t").orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq === (1L to 6L))
    assert(back.map(_.getTimestamp(1)) === eventsDf.orderBy("id")
      .collect().map(_.getTimestamp(1)))
  }

  test("ts-range predicate on the source column prunes day directories") {
    val st = newStore()
    st.create("t", eventsDf.schema, partitionBy = Seq("days(ts)"))
    st.append("t", eventsDf)
    val q = st.read("t").filter(col("ts") >= lit(ts("2024-01-02 00:00:00")) &&
      col("ts") < lit(ts("2024-01-04 00:00:00")))
    val (total, kept) = scanned(q)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    assert(total === 5, "one file per day directory")
    assert(kept === 2, s"expected 2 surviving day dirs, kept $kept of $total")
    // point lookup: one day survives
    val p = st.read("t").filter(col("ts") === lit(ts("2024-02-15 00:00:00")))
    assert(scanned(p) === ((5, 1)))
    assert(p.count() === 1L)
  }

  test("bucket transform: equality on the source prunes to one bucket") {
    val st = newStore()
    val df = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 3).as("v")).coalesce(1)
    st.create("t", df.schema, partitionBy = Seq("bucket(8:k)"))
    st.append("t", df)
    val rels = st.currentRelPaths("t")
    val bucketsOnDisk = rels.map(_.split('/').head).distinct
    assert(bucketsOnDisk.forall(_.matches("""k_bucket=\d""")))
    assert(bucketsOnDisk.size === 8)
    val q = st.read("t").filter(col("k") === 437L)
    val (total, kept) = scanned(q)
    assert(q.collect().map(_.getLong(1)).toSeq === Seq(437L * 3))
    assert(total === 8 && kept === 1,
      s"bucket equality must prune to one directory, kept $kept of $total")
    // IN list: at most |values| buckets survive
    val in = st.read("t").filter(col("k").isin(1L, 2L, 3L))
    val (t2, k2) = scanned(in)
    assert(in.count() === 3L)
    assert(k2 <= 3, s"3-value IN kept $k2 of $t2 buckets")
  }

  test("days + bucket compose; CDC key batches prune via bucket dirs") {
    val st = newStore()
    st.create("t", eventsDf.schema,
      partitionBy = Seq("days(ts)", "bucket(4:user)"))
    st.append("t", eventsDf)
    // composed predicate: day range AND user equality
    val q = st.read("t")
      .filter(col("ts") >= lit(ts("2024-01-01 00:00:00")) &&
        col("ts") < lit(ts("2024-01-02 00:00:00")) && col("user") === 10L)
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(1L))
    val (total, kept) = scanned(q)
    assert(kept < total, s"composed pruning kept $kept of $total")
    // mutation-path candidates: a single-user key batch cannot touch
    // other buckets' files
    val cands = st.candidateFilesForKeys("t", Seq(10L).toDF("user"), Seq("user"))
    val allRels = st.currentRelPaths("t")
    assert(cands.size < allRels.size,
      s"bucket-dir candidate pruning kept ${cands.size} of ${allRels.size}")
    val wantBucket = cands.map(_.split('/')(1)).distinct
    assert(wantBucket.size === 1, s"one user = one bucket, got $wantBucket")
    // and the CoW upsert over those candidates stays correct
    st.upsert("t", Seq((1L, ts("2024-01-01 08:30:00"), 10L, 99.0))
      .toDF("id", "ts", "user", "v"), Seq("id"))
    assert(st.read("t").filter(col("id") === 1L).head().getDouble(3) === 99.0)
    assert(st.read("t").count() === 6L)
  }

  test("truncate transform on strings: prefix dirs, range pruning") {
    val st = newStore()
    val df = Seq(("alpha", 1L), ("alloy", 2L), ("beta", 3L), ("bravo", 4L),
      ("gamma", 5L)).toDF("s", "n").coalesce(1)
    st.create("t", df.schema, partitionBy = Seq("truncate(2:s)"))
    st.append("t", df)
    assert(st.currentRelPaths("t").map(_.split('/').head).distinct.sorted ===
      Seq("s_trunc=al", "s_trunc=be", "s_trunc=br", "s_trunc=ga"))
    val q = st.read("t").filter(col("s").startsWith("b"))
    assert(q.collect().map(_.getLong(1)).sorted.toSeq === Seq(3L, 4L))
    val (total, kept) = scanned(q)
    assert(total === 4 && kept === 2, s"prefix kept $kept of $total")
    // equality prunes to one prefix dir
    val e = st.read("t").filter(col("s") === "gamma")
    assert(e.count() === 1L)
    assert(scanned(e)._2 === 1)
  }

  test("truncate transform on longs floors to width multiples") {
    val st = newStore()
    val df = spark.range(0, 100).select(col("id").as("k")).coalesce(1)
    st.create("t", df.schema, partitionBy = Seq("truncate(25:k)"))
    st.append("t", df)
    assert(st.currentRelPaths("t").map(_.split('/').head).distinct.sorted ===
      Seq("k_trunc=0", "k_trunc=25", "k_trunc=50", "k_trunc=75"))
    val q = st.read("t").filter(col("k") >= 30L && col("k") < 45L)
    assert(q.count() === 15L)
    assert(scanned(q) === ((4, 1)))
  }

  test("months and years transforms bucket time coarsely") {
    val st = newStore()
    st.create("tm", eventsDf.schema, partitionBy = Seq("months(ts)"))
    st.append("tm", eventsDf)
    // 2024-01 = month 648 since 1970-01
    assert(st.currentRelPaths("tm").map(_.split('/').head).distinct.sorted ===
      Seq("ts_month=648", "ts_month=649", "ts_month=650"))
    val q = st.read("tm").filter(col("ts") >= lit(ts("2024-02-01 00:00:00")) &&
      col("ts") < lit(ts("2024-03-01 00:00:00")))
    assert(q.count() === 1L)
    // strict < widens to <= at file granularity, so the boundary-adjacent
    // March directory may survive — conservative, never more
    val (mt, mk) = scanned(q)
    assert(mt === 3 && mk <= 2, s"kept $mk of $mt month dirs")

    st.create("ty", eventsDf.schema, partitionBy = Seq("years(ts)"))
    st.append("ty", eventsDf)
    assert(st.currentRelPaths("ty").map(_.split('/').head).distinct ===
      Seq("ts_year=54"))
  }

  test("delete and compact on a hidden-partitioned table") {
    val st = newStore()
    st.create("t", eventsDf.schema, partitionBy = Seq("days(ts)"))
    st.append("t", eventsDf)
    st.delete("t", col("user") === 10L)
    assert(st.read("t").orderBy("id").collect().map(_.getLong(0)).toSeq ===
      Seq(2L, 3L, 5L, 6L))
    // compact keeps the layout (rewrite goes through writeDataFiles)
    st.compact("t")
    assert(st.currentRelPaths("t").forall(_.startsWith("ts_day=")))
    assert(st.read("t").count() === 4L)
  }

  test("create-time validation: types, collisions, widths") {
    val st = newStore()
    val sch = eventsDf.schema
    intercept[IllegalArgumentException] {
      st.create("x1", sch, partitionBy = Seq("days(v)")) // double, not time
    }
    intercept[IllegalArgumentException] {
      st.create("x2", sch, partitionBy = Seq("bucket(1:user)")) // width 1
    }
    intercept[IllegalArgumentException] {
      st.create("x3", sch, partitionBy = Seq("days(nope)")) // no such col
    }
    intercept[IllegalArgumentException] {
      // derived dir name collides with a schema column
      val s2 = Seq((1L, ts("2024-01-01 00:00:00"), 1L, 1.0, "x"))
        .toDF("id", "ts", "user", "v", "ts_day").schema
      st.create("x4", s2, partitionBy = Seq("days(ts)"))
    }
    // bloom on a hidden-transform source is FINE (values stay in files)
    st.create("ok", sch, partitionBy = Seq("bucket(4:user)"),
      bloomCols = Seq("user"))
    st.append("ok", eventsDf)
    assert(st.read("ok").filter(col("user") === 10L).count() === 2L)
  }

  test("partition-spec evolution into a hidden spec") {
    val st = newStore()
    st.create("t", eventsDf.schema) // unpartitioned
    st.append("t", eventsDf.filter(col("id") <= 3L))
    st.repartitionSpec("t", Seq("days(ts)"))
    st.append("t", eventsDf.filter(col("id") > 3L))
    // generation 1 lays out under spec-1/ts_day=...
    assert(st.currentRelPaths("t").exists(_.startsWith("spec-1/ts_day=")))
    val q = st.read("t").filter(col("ts") >= lit(ts("2024-02-01 00:00:00")))
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 6L))
    assert(st.read("t").count() === 6L)
  }

  test("SQL DDL: PARTITIONED BY (days(ts), bucket(n, key)) end to end") {
    val root = tmpDir("hidp-sql-")
    spark.conf.set("spark.sql.catalog.ghp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ghp.root", root)
    val st = new TableStore(spark, root)
    spark.sql("""CREATE TABLE ghp.ev (id BIGINT, ts TIMESTAMP_NTZ,
      user BIGINT, v DOUBLE) PARTITIONED BY (days(ts), bucket(4, user))""")
    assert(st.partitionCols("ev") === Seq("days(ts)", "bucket(4:user)"))
    eventsDf.createOrReplaceTempView("hidp_src")
    spark.sql("INSERT INTO ghp.ev SELECT * FROM hidp_src")
    assert(spark.sql("SELECT count(*) FROM ghp.ev").head().getLong(0) === 6L)
    // source-column filters through SQL
    val r = spark.sql("""SELECT id FROM ghp.ev
      WHERE ts >= TIMESTAMP_NTZ'2024-01-02 00:00:00'
        AND ts < TIMESTAMP_NTZ'2024-01-04 00:00:00' ORDER BY id""")
    assert(r.collect().map(_.getLong(0)).toSeq === Seq(3L, 4L))
    // row-level SQL UPDATE exercises the distributed writer's
    // transform-aware partition projection
    spark.sql("UPDATE ghp.ev SET v = v * 10 WHERE user = 10")
    assert(spark.sql("SELECT sum(v) FROM ghp.ev").head().getDouble(0) ===
      (1.0 * 10 + 2.0 + 3.0 + 4.0 * 10 + 5.0 + 6.0))
    // updated rows landed back under the same derived layout
    assert(st.currentRelPaths("ev").forall(r =>
      r.matches("""ts_day=\d{4}-\d{2}-\d{2}/user_bucket=\d/.*\.parquet""")),
      st.currentRelPaths("ev").mkString(", "))
    // SHOW-able partitioning survives the round trip
    val parts = spark.sql("DESCRIBE TABLE EXTENDED ghp.ev").collect()
      .map(_.mkString(" ")).mkString("\n")
    assert(parts.contains("days(ts)") || parts.contains("Part 0"))
    spark.sql("DROP TABLE ghp.ev")
  }
}
