package graft.tables

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** `add_files` / `migrate` (the Iceberg migration surface): existing
  * parquet files are adopted into the table BY REFERENCE — absolute
  * manifest entries, zero copy, one metadata commit — and from then on
  * behave as first-class data files (stats, pruning, metadata
  * aggregates, time travel, CoW rewrites, expiry ownership). */
class AddFilesSpec extends SparkSpec {
  import spark.implicits._

  private val sch = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("v", StringType, nullable = true)))

  private def corpus(dir: String, lo: Long, hi: Long, parts: Int): Unit =
    spark.range(lo, hi).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(parts, col("k"))
      .write.mode("overwrite").parquet(dir)

  private def dataDirParquetCount(root: String, table: String): Long = {
    val d = Paths.get(root, table, "data")
    if (!Files.exists(d)) 0L
    else {
      val s = Files.walk(d)
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
  }

  test("add_files adopts by reference: zero copy, full read-back, stats") {
    val root = tmpDir("adf-")
    val src = tmpDir("adf-src-")
    corpus(src, 0, 1000, 4)
    val st = new TableStore(spark, root)
    st.create("t", sch, zoneCols = Seq("k"))
    val added = st.addFiles("t", src)
    assert(added.size === 4)
    assert(added.forall(_.startsWith("/")), "entries must be absolute")
    // ZERO COPY: nothing landed under the table's own data dir
    assert(dataDirParquetCount(root, "t") === 0L)
    assert(st.read("t").count() === 1000L)
    assert(st.read("t").agg(sum("k")).head().getLong(0) === 499500L)
    // stats flowed: metadata-only count and zone pruning over adopted files
    assert(st.rowCount("t") === Some(1000L))
    val pruned = st.read("t").filter(col("k") >= 900L)
    assert(pruned.count() === 100L)
    val counts = pruned.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[HadoopFsRelation]
          .location.asInstanceOf[ZoneMapFileIndex]
    }.flatMap(_.lastScanCounts)
    assert(counts.map(_._1).sum === 4 && counts.map(_._2).sum < 4,
      s"zone pruning must engage on adopted files: $counts")
  }

  test("adopted files are first-class: CoW rewrite and time travel") {
    val root = tmpDir("adf-")
    val src = tmpDir("adf-src-")
    corpus(src, 0, 400, 2)
    val st = new TableStore(spark, root)
    st.create("t", sch, zoneCols = Seq("k"))
    st.addFiles("t", src)
    val v1 = st.currentVersion("t")
    st.delete("t", col("k") % 2 === 0L) // CoW rewrite of adopted files
    assert(st.read("t").count() === 200L)
    assert(st.read("t").filter(col("k") % 2 === 0L).count() === 0L)
    // the rewrite wrote REAL files into data/ and dropped the adopted refs
    assert(dataDirParquetCount(root, "t") > 0L)
    assert(st.currentRelPaths("t").forall(!_.startsWith("/")))
    // time travel still reads the adopted snapshot
    assert(st.readVersion("t", v1).count() === 400L)
    // the source files themselves are untouched by the CoW commit
    assert(spark.read.parquet(src).count() === 400L)
  }

  test("append and add_files compose; change feed labels adopted inserts") {
    val root = tmpDir("adf-")
    val src = tmpDir("adf-src-")
    corpus(src, 100, 200, 1)
    val st = new TableStore(spark, root)
    st.create("t", sch, zoneCols = Seq("k"))
    st.append("t", Seq((1L, "a")).toDF("k", "v"))
    val v1 = st.currentVersion("t")
    st.addFiles("t", src)
    val v2 = st.currentVersion("t")
    assert(st.read("t").count() === 101L)
    val changes = st.changeFeed("t", v1, v2)
    assert(changes.count() === 100L)
    assert(changes.filter(col(TableStore.ChangeTypeCol) =!= "insert")
      .count() === 0L)
    // incremental read sees the adopted rows as appended
    assert(st.readAppendedSince("t", v1).count() === 100L)
  }

  private val psch = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("v", StringType, nullable = true),
    StructField("region", StringType, nullable = true)))

  private def hiveCorpus(dir: String): Unit =
    spark.range(0, 600).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"),
      element_at(typedLit(Seq("emea", "apac", "amer")),
        (col("id") % 3 + 1).cast("int")).as("region"))
      .repartition(2, col("region"))
      .write.mode("overwrite").partitionBy("region").parquet(dir)

  test("partitioned add_files: hive corpus adopts by reference, prunes") {
    val root = tmpDir("adfp-")
    val src = tmpDir("adfp-src-")
    hiveCorpus(src)
    val st = new TableStore(spark, root)
    st.create("t", psch, partitionBy = Seq("region"), zoneCols = Seq("k"))
    val added = st.addFiles("t", src)
    assert(added.nonEmpty && added.forall(_.startsWith("/")))
    assert(added.forall(_.contains("region=")),
      "entries must carry their hive tails")
    assert(dataDirParquetCount(root, "t") === 0L, "zero copy")
    // full read-back with the partition column re-attached per directory
    assert(st.read("t").count() === 600L)
    val byRegion = st.read("t").groupBy("region").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byRegion === Map("emea" -> 200L, "apac" -> 200L, "amer" -> 200L))
    // DIRECTORY PRUNING works on adopted files: a partition-key
    // equality scans only that directory's files
    val q = st.read("t").filter(col("region") === "emea")
    assert(q.count() === 200L)
    val counts = q.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[HadoopFsRelation]
          .location.asInstanceOf[ZoneMapFileIndex]
    }.flatMap(_.lastScanCounts)
    assert(counts.map(_._2).sum < counts.map(_._1).sum,
      s"partition pruning must drop sibling dirs' files: $counts")
    // native appends coexist with adopted files in the same partitions
    st.append("t", Seq((9000L, "x", "emea")).toDF("k", "v", "region"))
    assert(st.read("t").filter(col("region") === "emea").count() === 201L)
    // CoW delete rewrites only touched files — adopted siblings survive
    st.delete("t", col("k") === 3L)
    assert(st.read("t").count() === 600L)
    assert(st.read("t").filter(col("k") === 3L).count() === 0L)
  }

  test("partitioned add_files: partition_filter adopts a directory subset") {
    val root = tmpDir("adfp-")
    val src = tmpDir("adfp-src-")
    hiveCorpus(src)
    val st = new TableStore(spark, root)
    st.create("t", psch, partitionBy = Seq("region"))
    val added = st.addFiles("t", src, Map("region" -> "apac"))
    assert(added.nonEmpty && added.forall(_.contains("region=apac")))
    assert(st.read("t").count() === 200L)
    // a second filtered adopt tails another partition in
    st.addFiles("t", src, Map("region" -> "emea"))
    assert(st.read("t").count() === 400L)
    assert(st.read("t").select("region").distinct().collect()
      .map(_.getString(0)).sorted.toSeq === Seq("apac", "emea"))
    // unknown filter column is loud
    val e = intercept[IllegalArgumentException](
      st.addFiles("t", src, Map("nope" -> "x")))
    assert(e.getMessage.contains("not a partition column"))
  }

  test("partitioned add_files via the SQL CALL face with partition_filter") {
    val root = tmpDir("adfp-")
    val src = tmpDir("adfp-src-")
    hiveCorpus(src)
    spark.conf.set("spark.sql.catalog.adfp",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.adfp.root", root)
    new TableStore(spark, root).create("t", psch, partitionBy = Seq("region"))
    val res = spark.sql(s"CALL adfp.system.add_files(`table` => 't', " +
      s"source_dir => '$src', partition_filter => 'region=amer')").head()
    assert(res.getLong(0) >= 1L)
    assert(spark.sql("SELECT count(*) AS n FROM adfp.t").head().getLong(0)
      === 200L)
    assert(spark.sql("SELECT DISTINCT region FROM adfp.t").head().getString(0)
      === "amer")
  }

  test("snapshot: zero-copy clone, independent mutation, source untouched") {
    val root = tmpDir("snap-")
    val st = new TableStore(spark, root)
    st.create("srct", sch, zoneCols = Seq("k"))
    st.append("srct", (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, col("k")))
    val srcRels = st.currentRelPaths("srct").toSet
    val refs = st.snapshotTable("srct", "clone")
    assert(refs.size === 4 && refs.forall(_.startsWith("/")))
    assert(dataDirParquetCount(root, "clone") === 0L, "zero copy")
    assert(st.read("clone").count() === 1000L)
    // stats sidecars were COPIED — metadata-only count and zone pruning
    // work without any stats job over the data
    assert(st.rowCount("clone") === Some(1000L))
    val pruned = st.read("clone").filter(col("k") >= 900L)
    assert(pruned.count() === 100L)
    assert(ZoneMapFileIndex.lastCountsOf(
      st.read("clone").filter(col("k") >= 900L))._2 < 4)
    // the clone mutates independently: CoW delete rewrites into ITS OWN
    // data dir; the source's files and contents stay untouched
    st.delete("clone", col("k") < 100L)
    assert(st.read("clone").count() === 900L)
    assert(st.read("srct").count() === 1000L)
    assert(st.currentRelPaths("srct").toSet === srcRels)
    assert(dataDirParquetCount(root, "clone") >= 1L,
      "the clone's rewrite lands in its own tree")
    // the source mutates independently too
    st.append("srct", Seq((5000L, "x")).toDF("k", "v"))
    assert(st.read("srct").count() === 1001L)
    assert(st.read("clone").count() === 900L)
    // clone expiry/drop never deletes the source's files
    st.expireSnapshots("clone", 1)
    st.drop("clone")
    assert(st.read("srct").count() === 1001L)
  }

  test("snapshot: partitioned/bucketed source, MoR-pending refusal, SQL CALL") {
    val root = tmpDir("snap-")
    val st = new TableStore(spark, root)
    val sch2 = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    st.create("bsrc", sch2, partitionBy = Seq("bucket(4:k)"))
    st.append("bsrc", (0L until 400L).map(i => (i, s"v$i")).toDF("k", "v"))
    spark.conf.set("spark.sql.catalog.snp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.snp.root", root)
    val r = spark.sql(
      "CALL snp.system.snapshot(source => 'bsrc', dest => 'bclone')").head()
    assert(r.getLong(0) >= 1L)
    assert(st.read("bclone").count() === 400L)
    // the clone keeps the bucket layout: partition-key equality prunes
    assert(st.read("bclone").filter(col("k") === 7L).count() === 1L)
    // pending MoR deletes refuse loudly (masks would be left behind)
    st.deleteMoR("bsrc", Seq(3L).toDF("k"), Seq("k"))
    val e = intercept[IllegalArgumentException](
      st.snapshotTable("bsrc", "b2"))
    assert(e.getMessage.contains("materialize_deletes"))
    st.materializeDeletes("bsrc")
    st.snapshotTable("bsrc", "b2")
    assert(st.read("b2").count() === 399L)
  }

  test("snapshot carries table properties: clone writes keep the contract") {
    val root = tmpDir("snap-")
    val st = new TableStore(spark, root)
    st.create("psrc", sch)
    st.setProperties("psrc", Map(
      "write.merge.mode" -> Some("merge-on-read"),
      "write.sort-order" -> Some("k")))
    st.append("psrc", (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    st.snapshotTable("psrc", "pclone")
    val props = st.properties("pclone")
    assert(props.get("write.merge.mode") === Some("merge-on-read"))
    assert(props.get("write.sort-order") === Some("k"))
    // the carried merge mode actually governs the clone's writes: an
    // applyNet commits a tombstone + append, rewriting nothing
    val before = st.currentRelPaths("pclone").toSet
    st.applyNet("pclone", keys = Seq(3L).toDF("k"),
      newRows = Seq((3L, "upd")).toDF("k", "v"), keyCols = Seq("k"))
    assert(before.subsetOf(st.currentRelPaths("pclone").toSet),
      "merge-on-read mode must carry to the clone")
    assert(st.pendingDeletes("pclone") === 1)
    assert(st.read("pclone").filter(col("k") === 3L).select("v")
      .head().getString(0) === "upd")
  }

  test("snapshot of a row-lineage source: ids carry, stable post-divergence") {
    val root = tmpDir("snap-lin-")
    val st = new TableStore(spark, root)
    st.create("lsrc", sch)
    st.setProperties("lsrc", Map("row-lineage" -> Some("true")))
    st.append("lsrc", (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    st.append("lsrc", (10L until 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    def ids(t: String): Map[Long, Long] =
      st.readLineage(t).select("k", TableStore.RowIdCol).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val srcIds = ids("lsrc")
    assert(srcIds.values.toSeq.sorted === (0L until 20L),
      "source assigns dense ids across two commits")
    st.snapshotTable("lsrc", "lclone")
    assert(st.rowLineage("lclone"), "the clone tracks lineage")
    assert(ids("lclone") === srcIds,
      "every adopted row keeps its source _row_id")
    // divergence: a CoW delete rewrites the touched files into the
    // clone's own tree — surviving rows keep their ids (materialized
    // through the rewrite), deleted ones vanish
    st.delete("lclone", col("k") < 5L)
    assert(ids("lclone") === srcIds.filter(_._1 >= 5L))
    // fresh appends on the clone continue the CARRIED counter — a new
    // row never re-issues an id the source already assigned
    st.append("lclone", Seq((100L, "x")).toDF("k", "v"))
    assert(ids("lclone")(100L) >= 20L)
    // the source is untouched by all of it
    assert(ids("lsrc") === srcIds)
    // an EMPTY source snapshot still carries #next: a clone of a
    // deleted-out table must not restart ids at 0 (re-issuing ids the
    // source's history already assigned)
    st.delete("lsrc", lit(true))
    assert(st.read("lsrc").count() === 0L)
    st.snapshotTable("lsrc", "lclone2")
    st.append("lclone2", Seq((500L, "y")).toDF("k", "v"))
    assert(ids("lclone2")(500L) >= 20L,
      "empty-source clone must continue the carried counter")
  }

  test("source maintenance never breaks a clone: expiry, orphans, drop") {
    val root = tmpDir("snap-guard-")
    val st = new TableStore(spark, root)
    st.create("xsrc", sch, zoneCols = Seq("k"))
    st.append("xsrc", (0L until 1000L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, col("k")))
    st.snapshotTable("xsrc", "xclone")
    // the source rewrites every adopted file (CoW delete), then expires
    // its history: without the foreignReferenced guard this physically
    // deleted the clone's files — the round-11 data-loss hazard
    st.delete("xsrc", col("k") % 2L === 0L)
    st.expireSnapshots("xsrc", 1)
    assert(st.read("xclone").count() === 1000L,
      "clone reads green after source expiry")
    // orphan cleanup with a zero age guard must skip them too
    st.removeOrphans("xsrc", 0L)
    assert(st.read("xclone").count() === 1000L,
      "clone reads green after source orphan cleanup")
    // dropping the source refuses while a clone still references it —
    // and so do rename / overwrite-create, which dangle the clone's
    // absolute references just as surely as a delete
    val e = intercept[IllegalArgumentException](st.drop("xsrc"))
    assert(e.getMessage.contains("referenced"))
    val er = intercept[IllegalArgumentException](
      st.renameTable("xsrc", "xsrc2"))
    assert(er.getMessage.contains("referenced"))
    val eo = intercept[IllegalArgumentException](
      st.create("xsrc", sch, overwrite = true))
    assert(eo.getMessage.contains("referenced"))
    assert(st.read("xclone").count() === 1000L)
    // compaction rewrites the clone into files it owns — but its
    // HISTORY still references the source (time travel to pre-compact
    // snapshots must keep working), so the source stays held until the
    // clone expires that history
    st.compact("xclone")
    val e2 = intercept[IllegalArgumentException](st.drop("xsrc"))
    assert(e2.getMessage.contains("referenced"))
    st.expireSnapshots("xclone", 1)
    st.drop("xsrc")
    assert(st.read("xclone").count() === 1000L,
      "a compacted clone survives its source's drop")
  }

  test("cascade namespace drop orders clones before their sources") {
    val root = tmpDir("snap-ns-")
    val st = new TableStore(spark, root)
    st.create("a.src", sch)
    st.append("a.src", (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v"))
    st.snapshotTable("a.src", "a.clone")
    // naive order would try a.clone's SOURCE first and refuse; the
    // fixpoint drops the clone, then the freed source
    assert(st.dropNamespace(Seq("a"), cascade = true))
    assert(!st.exists("a.src") && !st.exists("a.clone"))
    // an OUTSIDE holder refuses the cascade BEFORE anything drops — a
    // refusal must leave the namespace fully intact, never half-gone
    st.create("b.src", sch)
    st.append("b.src", (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v"))
    st.create("b.other", sch)
    st.append("b.other", Seq((1L, "x")).toDF("k", "v"))
    st.snapshotTable("b.src", "zclone")
    val e = intercept[IllegalArgumentException](
      st.dropNamespace(Seq("b"), cascade = true))
    assert(e.getMessage.contains("outside the namespace"))
    assert(st.exists("b.src") && st.exists("b.other"),
      "a refused cascade drops NOTHING")
    assert(st.read("zclone").count() === 50L)
  }

  test("cascade refuses an in-namespace reference CYCLE before anything drops") {
    val root = tmpDir("snap-cyc-")
    val st = new TableStore(spark, root)
    st.create("cyc.t1", sch)
    st.append("cyc.t1", (0L until 40L).map(i => (i, s"v$i")).toDF("k", "v"))
    // t2 references t1 (snapshot adoption) …
    st.snapshotTable("cyc.t1", "cyc.t2")
    st.append("cyc.t2", Seq((100L, "own")).toDF("k", "v"))
    // … and t1 references t2 (cross-table add_files of t2's OWN files):
    // a cycle no clones-before-sources ordering can resolve
    st.addFiles("cyc.t1", Paths.get(root, "cyc.t2", "data").toString)
    st.createView("cyc.v", "SELECT 1 AS one")
    val e = intercept[IllegalArgumentException](
      st.dropNamespace(Seq("cyc"), cascade = true))
    assert(e.getMessage.contains("cycle"), e.getMessage)
    // the refusal fired during the DRY RUN — tables AND views intact
    assert(st.exists("cyc.t1") && st.exists("cyc.t2"))
    assert(st.viewExists("cyc.v"), "views must survive a refused cascade")
    assert(st.read("cyc.t1").count() === 41L)
    // breaking the cycle (compact t1 into its own files + expire the
    // adopting history) lets the cascade order and complete
    st.compact("cyc.t1")
    st.expireSnapshots("cyc.t1", 1)
    assert(st.dropNamespace(Seq("cyc"), cascade = true))
    assert(!st.exists("cyc.t1") && !st.exists("cyc.t2") &&
      !st.viewExists("cyc.v"))
  }

  test("referenced-by markers: O(1) guard fast path, adoption writes, drop retracts") {
    val root = tmpDir("refby-")
    val st = new TableStore(spark, root)
    st.create("plain", sch)
    st.append("plain", Seq((1L, "a")).toDF("k", "v"))
    def markers(t: String): Seq[String] = {
      val d = Paths.get(root, t)
      val s = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("_refby_")).toSeq
      } finally s.close()
    }
    // never-adopted table: no marker — the reachability guards answer
    // from ONE listing (the at-scale point: drop/rename on a 10k-table
    // catalog without 10k manifest sweeps)
    assert(markers("plain").isEmpty)
    st.create("src2", sch)
    st.append("src2", (0L until 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    st.snapshotTable("src2", "clone2")
    assert(markers("src2") === Seq("_refby_clone2"),
      "adoption records itself under the SOURCE")
    assert(markers("plain").isEmpty, "unrelated tables stay unmarked")
    intercept[IllegalArgumentException](st.drop("src2"))
    // dropping the holder retracts its marker; the source is free again
    st.drop("clone2")
    assert(markers("src2").isEmpty, "drop retracts the holder's marker")
    st.drop("src2")
    assert(!st.exists("src2"))
    // LEGACY catalogs never fast-path: a root without the capability
    // stamp may hold pre-marker adoptions, so the guards always sweep
    // there — simulate by removing the stamp AND the adoption's marker
    st.create("src3", sch)
    st.append("src3", Seq((1L, "a")).toDF("k", "v"))
    st.snapshotTable("src3", "clone3")
    assert(Files.deleteIfExists(Paths.get(root, "src3", "_refby_clone3")))
    assert(Files.deleteIfExists(Paths.get(root, "_refby_capable")))
    val e3 = intercept[IllegalArgumentException](st.drop("src3"))
    assert(e3.getMessage.contains("referenced"),
      "an unstamped (legacy) root must keep the authoritative sweep")
  }

  test("refusals: schema mismatch, rename, partitioned, collision") {
    val root = tmpDir("adf-")
    val src = tmpDir("adf-src-")
    corpus(src, 0, 10, 1)
    val st = new TableStore(spark, root)

    st.create("bad", StructType(Seq(
      StructField("k", LongType), StructField("other", DoubleType))))
    val e1 = intercept[IllegalArgumentException](st.addFiles("bad", src))
    assert(e1.getMessage.contains("does not match"))

    st.create("ren", sch)
    st.renameColumn("ren", "v", "w")
    val e2 = intercept[IllegalArgumentException](st.addFiles("ren", src))
    assert(e2.getMessage.contains("rename"))

    // hidden-transform layouts refuse (identity layouts adopt — see the
    // partitioned-adoption tests); so does a flat source into an
    // identity layout (not partition-directories deep)
    st.create("part", sch, partitionBy = Seq("bucket(4, k)"))
    val e3 = intercept[IllegalArgumentException](st.addFiles("part", src))
    assert(e3.getMessage.contains("identity"))
    st.create("partid", StructType(sch.fields :+
      StructField("p", StringType)), partitionBy = Seq("p"))
    val e3b = intercept[IllegalArgumentException](st.addFiles("partid", src))
    assert(e3b.getMessage.contains("partition"))

    st.create("coll", sch)
    st.addFiles("coll", src)
    val e4 = intercept[IllegalArgumentException](st.addFiles("coll", src))
    assert(e4.getMessage.contains("basenames"))
  }

  test("migrate: create-from-dir + adopt, via the SQL CALL face") {
    val root = tmpDir("adf-")
    val src = tmpDir("adf-src-")
    corpus(src, 0, 500, 3)
    spark.conf.set("spark.sql.catalog.adfc",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.adfc.root", root)
    val res = spark.sql(
      s"CALL adfc.system.migrate('m', '$src', 'k')").head()
    assert(res.getLong(0) === 3L)
    assert(dataDirParquetCount(root, "m") === 0L)
    assert(spark.sql("SELECT count(*) AS n FROM adfc.m").head().getLong(0)
      === 500L)
    // add_files CALL tails more data into the migrated table
    val src2 = tmpDir("adf-src2-")
    corpus(src2, 500, 600, 1)
    val res2 = spark.sql(
      s"CALL adfc.system.add_files('m', '$src2')").head()
    assert(res2.getLong(0) === 1L)
    assert(spark.sql("SELECT sum(k) AS s FROM adfc.m").head().getLong(0)
      === (0L until 600L).sum)
  }
}
