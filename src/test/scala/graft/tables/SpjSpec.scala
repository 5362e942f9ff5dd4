package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Storage-partitioned joins: two tables bucketed the same way on the
  * join key must join with ZERO exchanges on either side — the scan
  * reports its bucket layout as KeyGroupedPartitioning and Spark zips
  * matching buckets ([[GraftBatchScan]]). Also pins the fallback matrix:
  * every table state the raw V2 reader cannot serve must quietly take
  * the V1 path and stay correct. */
class SpjSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("spj-")
  spark.conf.set("spark.sql.catalog.spj", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.spj.root", root)
  private val store = new TableStore(spark, root)

  private def fact: DataFrame =
    (0L until 400L).map(i => (i % 100, i.toDouble, s"f$i"))
      .toDF("k", "v", "tag").repartition(4)
  private def dim: DataFrame =
    (0L until 50L).map(i => (i, s"d$i")).toDF("k", "name").repartition(2)

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  private def withSpj[A](body: => A): A = {
    val pairs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucket-bucket equi-join plans with zero exchanges and matches") {
    spark.sql("CREATE TABLE spj.f (k BIGINT, v DOUBLE, tag STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql("CREATE TABLE spj.d (k BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(8, k))")
    fact.writeTo("spj.f").append()
    dim.writeTo("spj.d").append()
    withSpj {
      val joined = spark.sql(
        """SELECT f.k, f.v, d.name FROM spj.f f JOIN spj.d d ON f.k = d.k""")
      val plan = finalPlan(joined)
      assert(plan.contains("BatchScan"), plan)
      assert(!plan.contains("Exchange"), plan)
      val expected = fact.join(dim, "k").select($"k", $"v", $"name")
      assert(joined.orderBy("k", "v").collect().toSeq ===
        expected.orderBy("k", "v").collect().toSeq)
    }
  }

  test("aggregation over the bucket key also avoids the shuffle") {
    withSpj {
      val agg = spark.sql(
        "SELECT k, count(*) AS c, sum(v) AS s FROM spj.f GROUP BY k")
      val plan = finalPlan(agg)
      assert(plan.contains("BatchScan"), plan)
      assert(!plan.contains("Exchange"), plan)
      val expected = fact.groupBy("k")
        .agg(count(lit(1)).as("c"), sum("v").as("s"))
      assert(agg.orderBy("k").collect().toSeq ===
        expected.orderBy("k").collect().toSeq)
    }
  }

  test("filters stay EXACT on the V2 path (residual re-application)") {
    withSpj {
      // k = 7 prunes to one bucket dir; v > 200 is sub-file-granular —
      // only residual evaluation can produce the exact answer
      val q = spark.sql("SELECT k, v FROM spj.f WHERE k = 7 AND v > 200.0")
      val rows = q.collect()
      val expected = fact.filter($"k" === 7 && $"v" > 200.0)
        .select("k", "v").collect()
      assert(rows.sortBy(_.getDouble(1)).toSeq ===
        expected.sortBy(_.getDouble(1)).toSeq)
      assert(finalPlan(q).contains("BatchScan"))
    }
  }

  test("bucket equality prunes input partitions on the V2 scan") {
    // partitions are PER FILE (partial-clustering granularity; Spark
    // groups them by key for SPJ) — the pruning pin counts KEY GROUPS
    def groups(ps: Array[org.apache.spark.sql.connector.read.InputPartition]) =
      ps.map(_.asInstanceOf[GraftInputPartition].keyVals.toSeq).distinct
    val p = store.spjPlan("f").get
    val all = new GraftBatchScan(store, "f", p, Array.empty,
      store.schema("f")).planInputPartitions()
    assert(groups(all).length === 8,
      s"expected 8 bucket groups, got ${groups(all).length}")
    // k = 7 → exactly one surviving bucket group, planned from the SAME
    // pruning path the SQL scan uses
    val one = new GraftBatchScan(store, "f", p,
      Array(org.apache.spark.sql.sources.EqualTo("k", 7L)),
      store.schema("f")).planInputPartitions()
    assert(groups(one).length === 1,
      s"expected 1 surviving bucket, got ${groups(one).length}")
    withSpj {
      val q = spark.sql("SELECT count(*) AS c FROM spj.f WHERE k = 7")
      assert(q.collect().head.getLong(0) === 4L) // k=7 appears 4× in 0..399
    }
  }

  test("SPJ survives a schema ADD COLUMNS (old files null-backfill)") {
    spark.sql("ALTER TABLE spj.d ADD COLUMNS (extra INT)")
    withSpj {
      val q = spark.sql("SELECT k, name, extra FROM spj.d WHERE k < 5")
      val rows = q.orderBy("k").collect()
      assert(rows.map(_.getLong(0)).toSeq === (0L until 5L))
      assert(rows.forall(_.isNullAt(2)))
      assert(finalPlan(q).contains("BatchScan"))
    }
  }

  test("fallback matrix: states the raw reader cannot serve take V1") {
    // (a) pending MoR deletes NO LONGER fall back — they mask on the V2
    // path (the CDC-busy merge-on-read table is exactly where SPJ
    // matters most); the dedicated tests below pin the masking semantics
    spark.sql("CREATE TABLE spj.m (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k)) TBLPROPERTIES " +
      "('write.delete.mode'='merge-on-read')")
    (0L until 40L).map(i => (i % 10, i.toDouble)).toDF("k", "v")
      .writeTo("spj.m").append()
    spark.sql("DELETE FROM spj.m WHERE k = 3")
    assert(store.pendingDeletes("m") > 0)
    assert(store.spjPlan("m").exists(_.mask.isDefined))
    withSpj {
      val rows = spark.sql("SELECT DISTINCT k FROM spj.m").collect()
      assert(rows.map(_.getLong(0)).toSet === (0L until 10L).toSet - 3L)
      assert(finalPlan(spark.sql("SELECT * FROM spj.m"))
        .contains("BatchScan"))
    }
    // (b) renamed column → physical/logical drift. The rename runs
    // through SQL (the catalog's own store stays cache-coherent — the
    // single-writer session model); eligibility is probed on a FRESH
    // store so it reads the post-rename field catalog from disk.
    spark.sql("CREATE TABLE spj.r (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    Seq((1L, 1.0)).toDF("k", "v").writeTo("spj.r").append()
    assert(new TableStore(spark, root).spjPlan("r").isDefined)
    spark.sql("ALTER TABLE spj.r RENAME COLUMN v TO w")
    assert(new TableStore(spark, root).spjPlan("r").isEmpty)
    withSpj {
      assert(spark.sql("SELECT w FROM spj.r").collect().head.getDouble(0) === 1.0)
    }
    // (c) identity partitioning is now SERVED (dir values re-attach as
    // the parquet partition-values row) — dedicated tests below
    spark.sql("CREATE TABLE spj.i (k BIGINT, p STRING) PARTITIONED BY (p)")
    Seq((1L, "a"), (2L, "b")).toDF("k", "p").writeTo("spj.i").append()
    assert(store.spjPlan("i").isDefined)
    withSpj {
      val q = spark.sql("SELECT k, p FROM spj.i ORDER BY k")
      assert(q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
        Seq((1L, "a"), (2L, "b")))
      assert(finalPlan(q).contains("BatchScan"))
    }
    // (d) time travel stays V1 (versionAt bypasses spjPlan entirely)
    withSpj {
      val v = store.currentVersion("f")
      val tt = spark.sql(s"SELECT * FROM spj.f VERSION AS OF $v")
      assert(tt.count() === 400L)
      assert(!finalPlan(tt).contains("BatchScan"))
    }
  }

  test("SPJ masks pending equality AND position deletes, zero exchanges") {
    spark.sql("CREATE TABLE spj.mf (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE spj.md (k BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    val mfData = (0L until 400L).map(i => (i % 20, i.toDouble)).toDF("k", "v")
    val mdData = (0L until 20L).map(i => (i, s"d$i")).toDF("k", "name")
    mfData.writeTo("spj.mf").append()
    mdData.writeTo("spj.md").append()
    // one equality sidecar (CDC tombstone shape) + one position sidecar
    store.deleteMoR("mf", Seq(3L, 5L).toDF("k"), Seq("k"))
    store.deletePos("mf", $"v" > 350.0)
    assert(store.pendingDeletes("mf") === 2)
    // position tombstones ship as DELETION VECTORS (round 9) — the
    // pair-file list stays empty for freshly-written sidecars
    assert(store.spjPlan("mf").exists(m =>
      m.mask.exists(x =>
        x.eq.size == 1 && x.dvFiles.nonEmpty && x.posFiles.isEmpty)))
    val expected = mfData
      .filter($"k" =!= 3L && $"k" =!= 5L && $"v" <= 350.0)
    withSpj {
      val j = spark.sql(
        "SELECT f.k, f.v, d.name FROM spj.mf f JOIN spj.md d ON f.k = d.k")
      val plan = finalPlan(j)
      assert(plan.contains("BatchScan"), plan)
      assert(!plan.contains("Exchange"), plan)
      val exp = expected.join(mdData, "k").select($"k", $"v", $"name")
      assert(j.orderBy("k", "v").collect().toSeq ===
        exp.orderBy("k", "v").collect().toSeq)
      // eq key column projected away → the reader widens, masks, drops
      val s = spark.sql("SELECT CAST(SUM(v) AS DOUBLE) AS s FROM spj.mf")
      assert(s.head().getDouble(0) ===
        expected.agg(sum("v")).head().getDouble(0))
    }
    // sequence rule THROUGH the V2 reader: a later append re-inserts a
    // tombstoned key — its file's sequence is above the delete's, so the
    // new row must show while the old ones stay masked
    Seq((3L, 999.0)).toDF("k", "v").writeTo("spj.mf").append()
    withSpj {
      val k3 = spark.sql("SELECT v FROM spj.mf WHERE k = 3")
      assert(finalPlan(k3).contains("BatchScan"))
      assert(k3.collect().map(_.getDouble(0)).toSeq === Seq(999.0))
    }
  }

  test("identity layout: co-partitioned join is shuffle-free, values exact") {
    spark.sql("CREATE TABLE spj.if1 (k BIGINT, v DOUBLE, region STRING) " +
      "PARTITIONED BY (region)")
    spark.sql("CREATE TABLE spj.if2 (w DOUBLE, region STRING) " +
      "PARTITIONED BY (region)")
    val regions = Seq("emea", "apac", "amer")
    val d1 = (0L until 90L).map(i => (i, i.toDouble, regions((i % 3).toInt)))
      .toDF("k", "v", "region")
    val d2 = (0L until 30L).map(i => (i * 2.0, regions((i % 3).toInt)))
      .toDF("w", "region")
    d1.writeTo("spj.if1").append()
    d2.writeTo("spj.if2").append()
    assert(store.spjPlan("if1").exists(_.fields.exists(_.isIdentity)))
    withSpj {
      val j = spark.sql(
        """SELECT a.k, a.v, a.region, b.w FROM spj.if1 a
          |JOIN spj.if2 b ON a.region = b.region""".stripMargin)
      val plan = finalPlan(j)
      assert(plan.contains("BatchScan"), plan)
      assert(!plan.contains("Exchange"), plan)
      val expected = d1.join(d2, "region").select($"k", $"v", $"region", $"w")
      assert(j.count() === expected.count())
      assert(j.agg(sum($"v" + $"w")).head().getDouble(0) ===
        expected.agg(sum($"v" + $"w")).head().getDouble(0))
      // identity values are exact per row (re-attached, not nulled)
      val perRegion = j.groupBy("region").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perRegion === expected.groupBy("region").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap)
      // filter ON the identity column prunes directories and stays exact
      val f = spark.sql(
        "SELECT k FROM spj.if1 WHERE region = 'emea' AND v < 10.0")
      assert(f.collect().map(_.getLong(0)).sorted.toSeq ===
        d1.filter($"region" === "emea" && $"v" < 10.0)
          .select("k").collect().map(_.getLong(0)).sorted.toSeq)
    }
    // masking interplay: an equality tombstone keyed on a DATA column
    // masks rows under the identity layout too
    store.deleteMoR("if1", Seq(5L, 6L).toDF("k"), Seq("k"))
    withSpj {
      val q = spark.sql("SELECT k FROM spj.if1 ORDER BY k")
      assert(finalPlan(q).contains("BatchScan"))
      assert(q.collect().map(_.getLong(0)).toSeq ===
        (0L until 90L).filterNot(Set(5L, 6L)))
    }
  }

  test("partially-clustered SPJ: a hot bucket splits across tasks") {
    // fact: heavily skewed into bucket(4) of one key (many files for the
    // hot bucket); dim: one row per key. With partiallyClustered
    // distribution, Spark keeps the fact side's PER-FILE splits for the
    // hot group and replicates the dim group across them — the hot
    // bucket no longer serializes the join, and there is STILL no
    // Exchange. Results stay exact.
    spark.sql("CREATE TABLE spj.skf (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE spj.skd (k BIGINT, name STRING) " +
      "PARTITIONED BY (bucket(4, k))")
    // hot key 0: 4 separate appends → >=4 files in its bucket
    (0 until 4).foreach { i =>
      (0L until 500L).map(j => (0L, (i * 500 + j).toDouble)).toDF("k", "v")
        .coalesce(1).writeTo("spj.skf").append()
    }
    (1L until 8L).map(k => (k, k.toDouble)).toDF("k", "v")
      .coalesce(1).writeTo("spj.skf").append()
    (0L until 8L).map(k => (k, s"d$k")).toDF("k", "name")
      .coalesce(1).writeTo("spj.skd").append()
    val factDf = spark.table("spj.skf")
    val dimDf = spark.table("spj.skd")
    val extras = Seq(
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"
        -> "true",
      // splits bin-pack to maxPartitionBytes; the test files are tiny,
      // so force a small cap to make the hot bucket actually split
      "spark.sql.files.maxPartitionBytes" -> "4096")
    val saved = extras.map { case (c, _) => c -> spark.conf.getOption(c) }
    extras.foreach { case (c, v) => spark.conf.set(c, v) }
    try withSpj {
      val j = spark.sql(
        "SELECT f.k, f.v, d.name FROM spj.skf f JOIN spj.skd d ON f.k = d.k")
      val rows = j.collect()
      val plan = finalPlan(j)
      assert(plan.contains("BatchScan"), plan)
      assert(!plan.contains("Exchange"), plan)
      val exp = factDf.join(dimDf, "k").select($"k", $"v", $"name").collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .sorted.toSeq ===
        exp.map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
          .sorted.toSeq)
      // the fact scan ran MORE tasks than key groups — the hot bucket's
      // files were not merged into one serializing task
      // AQE wraps stages in QueryStageExec whose plan is NOT a child —
      // unwrap recursively to reach the scans
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
        p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            scans(q.plan)
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            Seq(b)
          case other => other.children.flatMap(scans)
        }
      val scanParts = scans(j.queryExecution.executedPlan)
        .filter(_.output.exists(_.name == "v"))
        .map(_.inputRDD.getNumPartitions)
      val keyGroups = 1 + (1L until 8L).map(k =>
        graft.tables.PartitionField.catalystExpr(
          PartitionField.PBucket(4, "k"),
          org.apache.spark.sql.catalyst.expressions.Literal(k),
          org.apache.spark.sql.types.LongType,
          spark.sessionState.conf.sessionLocalTimeZone)
          .eval(null).asInstanceOf[Int]).distinct.size
      assert(scanParts.nonEmpty &&
        scanParts.head > keyGroups,
        s"hot bucket must split: fact scan ran ${scanParts.headOption} " +
          s"tasks over $keyGroups key groups")
      // pending tombstones no longer forfeit fine splits: the mask
      // builds once per executor per group (SpjMaskCache), so the
      // masked join keeps zero exchanges AND the hot bucket's split
      // fan-out, with exact results
      store.deleteMoR("skf", Seq(0L, 5L).toDF("k"), Seq("k"))
      val jm = spark.sql(
        "SELECT f.k, f.v, d.name FROM spj.skf f JOIN spj.skd d ON f.k = d.k")
      val rowsM = jm.collect()
      assert(!finalPlan(jm).contains("Exchange"), finalPlan(jm))
      val expM = factDf.filter(!$"k".isin(0L, 5L)).join(dimDf, "k")
        .select($"k", $"v", $"name").collect()
      assert(rowsM.map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .sorted.toSeq ===
        expM.map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
          .sorted.toSeq)
      val scanPartsM = scans(jm.queryExecution.executedPlan)
        .filter(_.output.exists(_.name == "v"))
        .map(_.inputRDD.getNumPartitions)
      assert(scanPartsM.nonEmpty && scanPartsM.head > keyGroups,
        s"masked fact scan must keep split fan-out: ${scanPartsM.headOption}")
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }

  test("mask scoping: a task retains only its key group's tombstones") {
    // 8 buckets, 64 deleted keys spread across them, plus position
    // tombstones in a handful of files. WITHOUT scoping every task
    // holds every tombstone (sum across tasks = keys × tasks); WITH
    // key-group scoping each equality key lands in exactly the ONE
    // task whose bucket it hashes to, and each position bitmap only in
    // the task owning its file — the 1/buckets shrink of VERDICT r8 #2.
    spark.sql("CREATE TABLE spj.sc (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, k))")
    val data = (0L until 4000L).map(i => (i % 500, i.toDouble)).toDF("k", "v")
    data.writeTo("spj.sc").append()
    val delKeys = (0L until 64L).map(_ * 7L)
    store.deleteMoR("sc", delKeys.toDF("k"), Seq("k"))
    store.deletePos("sc", $"v" >= 3990.0) // 10 position tombstones
    val expected = data.filter(!$"k".isin(delKeys: _*) && $"v" < 3990.0)
    SpjMaskCache.reset() // records happen on BUILD (cache miss)
    SpjMaskStats.reset()
    SpjMaskStats.enabled.set(true)
    try withSpj {
      val q = spark.sql("SELECT k, v FROM spj.sc")
      // ONE execution (no orderBy — its range-partitioner sampling pass
      // would run the scan a second time and double the counters)
      val rows = q.collect()
      val (sumEq, sumPos, maxEq, tasks) = SpjMaskStats.snapshot()
      assert(finalPlan(q).contains("BatchScan"))
      assert(rows.map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq ===
        expected.collect().map(r => (r.getLong(0), r.getDouble(1)))
          .sorted.toSeq)
      assert(tasks >= 4, s"want several key-group tasks, got $tasks")
      // every key retained exactly once across all tasks — not per task
      assert(sumEq === delKeys.size.toLong,
        s"keys retained across tasks: $sumEq (unscoped would be " +
          s"${delKeys.size * tasks})")
      assert(maxEq < delKeys.size,
        s"one task held ALL keys ($maxEq) — scoping not applied")
      // position tombstones: 10 rows deleted, each bitmap held only by
      // the task owning its file
      assert(sumPos === 10L, s"position tombstones retained: $sumPos")
    } finally SpjMaskStats.enabled.set(false)
  }

  test("layout-clustered sidecars: file skip bounds per-task sidecar bytes") {
    // BUCKET layout on the delete key — the CDC-canonical case where
    // key ORDER cannot scope anything (hash order): the sidecar is
    // clustered by the derived bucket id with per-file derived ranges,
    // so each key-group task SKIPS every sidecar file but its own
    // bucket slice. Without the skip each of the 8 key groups reads
    // the whole pile (8 × total bytes across builds); with it the max
    // single build reads ~1/8.
    spark.sql("CREATE TABLE spj.rs (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, k))")
    val data = (0L until 4000L).map(i => (i % 1000, i.toDouble))
      .toDF("k", "v")
    data.writeTo("spj.rs").append()
    val delKeys = (0L until 500L)
    // a test-sized pile coalesces to one file under AQE and sits below
    // the small-batch clustering floor (fine — nothing to skip in one
    // file); force the at-scale multi-slice shape
    val coalesce = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesce, "false")
    spark.conf.set("graft.eq.clusterFloorRows", "0")
    try store.deleteMoR("rs", delKeys.toDF("k"), Seq("k"))
    finally {
      spark.conf.unset(coalesce)
      spark.conf.unset("graft.eq.clusterFloorRows")
    }
    val m = store.spjPlan("rs").flatMap(_.mask).get
    val e = m.eq.head
    assert(e.files.size > 1, "need a multi-file sidecar to skip within")
    assert(e.ranges.nonEmpty,
      "layout-clustered sidecar must record per-file ranges")
    val totalSidecarBytes = e.files.map(_._2).sum
    // the per-task budget charge is the worst single bucket, not the
    // pile — ranges key by the parameter-qualified render
    val pt = TableStore.maxPointBytes(e.files, e.ranges, "bucket(8:k)")
    assert(pt.exists(_ < totalSidecarBytes),
      s"point bytes $pt vs total $totalSidecarBytes")
    SpjMaskCache.reset()
    SpjMaskStats.reset()
    SpjMaskStats.enabled.set(true)
    try withSpj {
      val q = spark.sql("SELECT k, v FROM spj.rs")
      val rows = q.collect()
      assert(finalPlan(q).contains("BatchScan"))
      assert(rows.map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq ===
        data.filter(!$"k".isin(delKeys: _*)).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq)
      val (sumEq, _, _, tasks) = SpjMaskStats.snapshot()
      val (sumB, maxB) = SpjMaskStats.eqBytesRead()
      assert(tasks >= 4, s"want several key-group builds, got $tasks")
      assert(sumEq === delKeys.size.toLong, s"keys retained once: $sumEq")
      // unskipped builds would read tasks × totalSidecarBytes in sum;
      // file skipping holds the SUM near ONE pass over the pile and
      // each single build well under it
      assert(sumB < tasks * totalSidecarBytes,
        s"no file was ever skipped: sum=$sumB tasks=$tasks " +
          s"total=$totalSidecarBytes")
      assert(maxB < totalSidecarBytes,
        s"one build read the whole pile: max=$maxB total=$totalSidecarBytes")
    } finally SpjMaskStats.enabled.set(false)
  }

  test("sidecar ranges survive a respec: parameter-qualified keys fail open") {
    // bucket(8,k) data, then repartitionSpec to bucket(16,k) BEFORE the
    // delete: the sidecar clusters/records in the bucket-16 domain while
    // the data (still spec-0) reads under bucket-8 key groups. A
    // dirName-keyed range ('k_bucket') would compare bucket-16 values
    // against bucket-8 task ids and wrongly skip applicable tombstone
    // files — resurrecting deleted rows; render-keyed ranges
    // ('bucket(16:k)') just miss the lookup and every file is read.
    spark.sql("CREATE TABLE spj.rsp (k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, k))")
    val data = (0L until 2000L).map(i => (i % 500, i.toDouble))
      .toDF("k", "v")
    data.writeTo("spj.rsp").append()
    store.repartitionSpec("rsp", Seq("bucket(16:k)"))
    val delKeys = (0L until 120L)
    val coalesce = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesce, "false")
    spark.conf.set("graft.eq.clusterFloorRows", "0")
    try store.deleteMoR("rsp", delKeys.toDF("k"), Seq("k"))
    finally {
      spark.conf.unset(coalesce)
      spark.conf.unset("graft.eq.clusterFloorRows")
    }
    val m = store.spjPlan("rsp").flatMap(_.mask).get
    assert(m.eq.head.files.size > 1, "need a multi-file sidecar")
    SpjMaskCache.reset()
    withSpj {
      val q = spark.sql("SELECT k, v FROM spj.rsp")
      val rows = q.collect()
      assert(finalPlan(q).contains("BatchScan"))
      assert(rows.map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq ===
        data.filter(!$"k".isin(delKeys: _*)).collect()
          .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq,
        "a cross-domain range lookup must fail open, never resurrect rows")
    }
  }

  test("null key group: tombstone entries skip whole, rows stay exact") {
    // identity layout with NULL partition values: the null group's rows
    // all carry a null key there, which no (non-null) equality key can
    // match — the build skips the ENTIRE entry for that task (zero
    // bytes), which is also what keeps the per-task mask budget sound.
    spark.sql("CREATE TABLE spj.ng (k BIGINT, region STRING, v DOUBLE) " +
      "PARTITIONED BY (region)")
    val regions = Seq("emea", "apac", null)
    val data = (0L until 90L).map(i =>
      (i, regions((i % 3).toInt), i.toDouble)).toDF("k", "region", "v")
    data.writeTo("spj.ng").append()
    store.deleteMoR("ng", Seq("emea").toDF("region"), Seq("region"))
    SpjMaskCache.reset()
    SpjMaskStats.reset()
    SpjMaskStats.enabled.set(true)
    try withSpj {
      val q = spark.sql("SELECT k, v FROM spj.ng")
      val rows = q.collect()
      assert(finalPlan(q).contains("BatchScan"))
      // emea rows masked; apac AND null-region rows survive
      assert(rows.map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq ===
        data.filter($"region".isNull || $"region" =!= "emea").collect()
          .map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq)
      val (sumEq, _, _, _) = SpjMaskStats.snapshot()
      val (sumB, _) = SpjMaskStats.eqBytesRead()
      // the null group's build reads ZERO sidecar bytes and retains
      // nothing (3 groups; only emea+apac read the single-file sidecar,
      // and only emea retains its key)
      assert(sumEq === 1L, s"retained keys: $sumEq")
      assert(sumB <= 2 * m0TotalBytes(store, "ng"),
        s"null group must not read the pile: $sumB")
    } finally SpjMaskStats.enabled.set(false)
  }

  private def m0TotalBytes(st: TableStore, t: String): Long =
    st.spjPlan(t).flatMap(_.mask).map(_.eq.flatMap(_.files).map(_._2).sum)
      .getOrElse(0L)

  test("maxPointBytes: stabbing-weight arithmetic for the per-task budget") {
    val files = Seq(("d/a.parquet", 100L), ("d/b.parquet", 200L),
      ("d/c.parquet", 400L))
    def rng(a: Long, b: Long) = Map("k" -> ((a: Any, b: Any)))
    // disjoint slices: one point stabs one file → max single file
    assert(TableStore.maxPointBytes(files, Map(
      "a.parquet" -> rng(0L, 9L), "b.parquet" -> rng(10L, 19L),
      "c.parquet" -> rng(20L, 29L)), "k") === Some(400L))
    // boundary overlap: a point can stab two adjacent files
    assert(TableStore.maxPointBytes(files, Map(
      "a.parquet" -> rng(0L, 9L), "b.parquet" -> rng(10L, 20L),
      "c.parquet" -> rng(20L, 29L)), "k") === Some(600L))
    // fully overlapping (unsorted legacy shape): every point stabs all
    assert(TableStore.maxPointBytes(files, Map(
      "a.parquet" -> rng(0L, 29L), "b.parquet" -> rng(0L, 29L),
      "c.parquet" -> rng(0L, 29L)), "k") === Some(700L))
    // a file without a range → no refinement (fail open to full bytes)
    assert(TableStore.maxPointBytes(files, Map(
      "a.parquet" -> rng(0L, 9L), "b.parquet" -> rng(10L, 19L)), "k")
      === None)
    // non-comparable pair → no refinement
    assert(TableStore.maxPointBytes(files, Map(
      "a.parquet" -> rng(0L, 9L), "b.parquet" -> Map("k" -> (("x": Any),
        ("y": Any))), "c.parquet" -> rng(20L, 29L)), "k") === None)
    // MIXED numeric types (Long vs Double, e.g. stats across a type
    // widening) → conservative fallback: a lossy cross-type order is
    // intransitive, so the sweep must refuse rather than mis-sort or
    // crash the planner
    assert(TableStore.maxPointBytes(files, Map(
      "a.parquet" -> rng(0L, 9L),
      "b.parquet" -> Map("k" -> ((10.0: Any), (19.0: Any))),
      "c.parquet" -> rng(20L, 29L)), "k") === None)
  }

  test("zone-shifted read keeps applicable time-layout tombstones") {
    // days(ts) over a ZONED timestamp derives through a session-zone
    // cast: a reader in a different zone computes a DIFFERENT calendar
    // day for the same tombstone key. Key-group scoping must therefore
    // SKIP zone-dependent layout fields (fail open) — treating the
    // mismatch as non-applicability would drop every one of these
    // tombstones and resurrect the deleted rows.
    spark.sql("CREATE TABLE spj.tz (ts TIMESTAMP, v DOUBLE) " +
      "PARTITIONED BY (days(ts))")
    // 03:00 UTC — still the PREVIOUS day in America/Los_Angeles, so the
    // write-zone (UTC) and read-zone derivations disagree for every key
    val base = java.time.Instant.parse("2024-03-10T03:00:00Z")
    val rows = (0 until 20).map(i =>
      (java.sql.Timestamp.from(base.plusSeconds(i * 86400L)), i.toDouble))
      .toDF("ts", "v")
    rows.writeTo("spj.tz").append()
    store.deleteMoR("tz", rows.filter($"v" < 5.0).select("ts"), Seq("ts"))
    val saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try withSpj {
      SpjMaskCache.reset()
      val q = spark.sql("SELECT v FROM spj.tz")
      val got = q.collect().map(_.getDouble(0)).sorted.toSeq
      assert(finalPlan(q).contains("BatchScan"), finalPlan(q))
      assert(got === (5 until 20).map(_.toDouble),
        "zone-shifted read resurrected deleted rows")
    } finally spark.conf.set("spark.sql.session.timeZone", saved)
  }

  test("oversized pending sidecars fall back to V1 (mask byte cap)") {
    // cap respected structurally: spjPlan declines when the sidecar
    // bytes exceed SpjMaskMaxBytes — probe the predicate, not 256 MB of
    // disk, by checking the plan's mask carries the real file lengths
    val m = store.spjPlan("mf").flatMap(_.mask).get
    val bytes =
      (m.eq.flatMap(_.files) ++ m.posFiles ++ m.dvFiles).map(_._2).sum
    assert(bytes > 0 && bytes <= TableStore.SpjMaskMaxBytes)
  }

  test("bound bucket function mirrors the write-side layout expression") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    val sch = StructType(Seq(StructField("n", IntegerType),
      StructField("c", LongType)))
    val f = GraftFunctions.load("bucket").get.bind(sch)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    val zone = spark.sessionState.conf.sessionLocalTimeZone
    for (v <- Seq(0L, 7L, -3L, 123456789L)) {
      val expect = PartitionField.catalystExpr(
        PartitionField.PBucket(8, "c"),
        org.apache.spark.sql.catalyst.expressions.Literal(v), LongType, zone)
        .eval(null).asInstanceOf[Int]
      assert(f.produceResult(InternalRow(8, v)) === expect, s"v=$v")
    }
    // canonical names embed the source type: int and long must differ
    val fi = GraftFunctions.load("bucket").get.bind(StructType(Seq(
      StructField("n", IntegerType), StructField("c", IntegerType))))
    assert(fi.canonicalName() !== f.canonicalName())
  }

  test("non-bucketed side shuffles INTO the table's layout (one exchange)") {
    // v2.bucketing.shuffle.enabled: Spark evaluates OUR bucket function
    // to route the small side's rows into the table's bucket layout —
    // the table side itself still never shuffles. This is the proof the
    // bound function's produceResult matches the physical layout: a
    // mismatch would silently join zero rows.
    withSpj {
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      try {
        val probe = (0L until 30L).map(i => (i, s"p$i")).toDF("k", "p")
        probe.createOrReplaceTempView("spj_probe")
        val q = spark.sql(
          "SELECT f.k, f.v, p.p FROM spj.f f JOIN spj_probe p ON f.k = p.k")
        val plan = finalPlan(q)
        assert(plan.contains("BatchScan"), plan)
        // exactly the probe side's exchange; the table side adds none
        assert(plan.split("Exchange").length - 1 === 1, plan)
        val expected = fact.join(probe, "k").select($"k", $"v", $"p")
        assert(q.orderBy("k", "v").collect().toSeq ===
          expected.orderBy("k", "v").collect().toSeq)
      } finally spark.conf
        .unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("runtime filter values prune bucket groups") {
    // direct unit probe of the runtime-filtering arithmetic
    val ids = Seq(1L, 2L, 3L).flatMap(v =>
      GraftBatchScan.bucketId(8, v, org.apache.spark.sql.types.LongType))
    assert(ids.size === 3)
    assert(ids.forall(i => i >= 0 && i < 8))
    // null value hashes to the bare seed, like Murmur3Hash over null
    assert(GraftBatchScan.bucketId(8, null,
      org.apache.spark.sql.types.LongType).contains(((42 % 8) + 8) % 8))
  }

  // ---- mixed hidden-transform layouts --------------------------------------

  private def tsOf(day: Int, hour: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-0$day%d $hour%02d:00:00")

  private def events(tag: String): DataFrame =
    (0L until 180L).map(i =>
      (tsOf(1 + (i % 3).toInt, (i % 9).toInt), i % 30, i.toDouble))
      .toDF("ts", "k", tag).repartition(3)

  test("days+bucket layout: co-partitioned join on (ts, k) is shuffle-free") {
    spark.sql("CREATE TABLE spj.e1 (ts TIMESTAMP, k BIGINT, v DOUBLE) " +
      "PARTITIONED BY (days(ts), bucket(4, k))")
    spark.sql("CREATE TABLE spj.e2 (ts TIMESTAMP, k BIGINT, w DOUBLE) " +
      "PARTITIONED BY (days(ts), bucket(4, k))")
    events("v").writeTo("spj.e1").append()
    events("w").writeTo("spj.e2").append()
    assert(store.spjPlan("e1").exists(_.fields.length == 2))
    withSpj {
      val j = spark.sql(
        """SELECT a.ts, a.k, a.v, b.w FROM spj.e1 a
          |JOIN spj.e2 b ON a.ts = b.ts AND a.k = b.k""".stripMargin)
      val plan = finalPlan(j)
      assert(plan.contains("BatchScan"), plan)
      assert(!plan.contains("Exchange"), plan)
      val expected = events("v").join(events("w"), Seq("ts", "k"))
      assert(j.count() === expected.count())
      assert(j.agg(sum($"v" + $"w")).head().getDouble(0) ===
        expected.agg(sum($"v" + $"w")).head().getDouble(0))
    }
  }

  test("join on the bucket key alone SPJs under subset-of-keys") {
    withSpj {
      // subset grouping additionally needs pushPartValues (SPARK-44647)
      // and co-partition matching relaxed to subsets — the same trio the
      // Iceberg SPJ docs prescribe
      val extras = Seq(
        "spark.sql.sources.v2.bucketing" +
          ".allowJoinKeysSubsetOfPartitionKeys.enabled" -> "true",
        "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
        "spark.sql.requireAllClusterKeysForCoPartition" -> "false")
      extras.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // both sides must still PROJECT ts: Spark resolves the reported
        // days(ts) transform against the scan's pruned output, so a
        // query reading only k gets no key-grouped partitioning at all
        // (same constraint Iceberg's SPJ has)
        val j = spark.sql(
          "SELECT a.ts, a.k, a.v, b.ts AS ts2, b.w FROM spj.e1 a " +
            "JOIN spj.e2 b ON a.k = b.k")
        val plan = finalPlan(j)
        assert(plan.contains("BatchScan"), plan)
        assert(!plan.contains("Exchange"), plan)
        val expected = events("v").as("a")
          .join(events("w").as("b"), $"a.k" === $"b.k")
          .select($"a.ts", $"a.k", $"a.v", $"b.ts".as("ts2"), $"b.w")
        assert(j.count() === expected.count())
        assert(j.agg(sum($"v" + $"w")).head().getDouble(0) ===
          expected.agg(sum($"v" + $"w")).head().getDouble(0))
      } finally extras.foreach { case (k, _) => spark.conf.unset(k) }
    }
  }

  test("truncate layout: co-partitioned string-prefix join is shuffle-free") {
    spark.sql("CREATE TABLE spj.t1 (s STRING, v DOUBLE) " +
      "PARTITIONED BY (truncate(2, s))")
    spark.sql("CREATE TABLE spj.t2 (s STRING, w DOUBLE) " +
      "PARTITIONED BY (truncate(2, s))")
    val d1 = (0L until 120L).map(i => (f"k${i % 12}%02d-${i}", i.toDouble))
      .toDF("s", "v").repartition(3)
    val d2 = (0L until 120L).map(i => (f"k${i % 12}%02d-${i}", i * 2.0))
      .toDF("s", "w").repartition(2)
    d1.writeTo("spj.t1").append()
    d2.writeTo("spj.t2").append()
    withSpj {
      val j = spark.sql(
        "SELECT a.s, a.v, b.w FROM spj.t1 a JOIN spj.t2 b ON a.s = b.s")
      val plan = finalPlan(j)
      assert(plan.contains("BatchScan"), plan)
      assert(!plan.contains("Exchange"), plan)
      val expected = d1.join(d2, "s")
      assert(j.orderBy("s").collect().toSeq ===
        expected.orderBy("s").collect().toSeq)
    }
  }

  test("derivedOf mirrors the writer for every hidden transform") {
    import org.apache.spark.sql.types._
    val utc = "UTC"
    // days over micros: 2024-01-02T03:00Z → epochDay of 2024-01-02
    val micros = java.time.Instant.parse("2024-01-02T03:00:00Z")
      .getEpochSecond * 1000000L
    val wantDay = java.time.LocalDate.parse("2024-01-02").toEpochDay.toInt
    assert(GraftBatchScan.derivedOf(PartitionField.PDays("c"), micros,
      TimestampType, utc).contains(wantDay))
    assert(GraftBatchScan.derivedOf(PartitionField.PHours("c"), micros,
      TimestampType, utc).contains((micros / 3600000000L).toInt))
    assert(GraftBatchScan.derivedOf(PartitionField.PMonths("c"), micros,
      TimestampType, utc).contains(54 * 12)) // 2024-01 is 648 months post-1970
    assert(GraftBatchScan.derivedOf(PartitionField.PYears("c"), micros,
      TimestampType, utc).contains(54))
    assert(GraftBatchScan.derivedOf(PartitionField.PTruncate(10, "c"), 37L,
      LongType, utc).contains(30L))
    assert(GraftBatchScan.derivedOf(PartitionField.PTruncate(2, "c"),
      org.apache.spark.unsafe.types.UTF8String.fromString("abcd"),
      StringType, utc).exists(_.toString == "ab"))
    // out-of-domain value fails open
    assert(GraftBatchScan.derivedOf(PartitionField.PDays("c"),
      "nope", TimestampType, utc).isEmpty)
  }
}
