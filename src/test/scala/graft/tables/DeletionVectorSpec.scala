package graft.tables

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.roaringbitmap.longlong.Roaring64Bitmap
import graft.SparkSpec

/** Deletion vectors: positional tombstones as per-file roaring bitmaps
  * ([[DeletionVectors]]) — sidecar bytes and reader mask memory scale
  * with COMPRESSED bitmap size, not tombstone count. Covers the bitmap
  * round-trip, the compression pin, both masking plans (broadcast
  * map-side probe and the anti-join fallback shape), the legacy pair
  * format's read + upgrade path, and DV flow through SQL MERGE/DELETE
  * (the delta writer). */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): TableStore = new TableStore(spark, tmpDir("dv-"))

  test("bitmap round-trip: serialize/deserialize/merge exact") {
    val a = new Roaring64Bitmap
    Seq(0L, 1L, 7L, 1L << 33, Long.MaxValue - 1).foreach(a.addLong)
    val b = DeletionVectors.deserialize(DeletionVectors.serialize(a))
    assert(b.getLongCardinality === a.getLongCardinality)
    Seq(0L, 1L, 7L, 1L << 33, Long.MaxValue - 1).foreach(v =>
      assert(b.contains(v), s"missing $v"))
    assert(!b.contains(2L) && !b.contains(Long.MaxValue))
  }

  test("mask memory pin: contiguous tombstone runs compress to O(1) bytes") {
    // 200k contiguous ordinals: the pair format costs >= 8 bytes each in
    // memory and ~that on disk; a run-optimized bitmap is a few dozen
    // bytes — the pin that distinguishes the formats at 100 TB tombstone
    // volume (SCALE.md round 9)
    val bm = new Roaring64Bitmap
    bm.addRange(0L, 200000L)
    val bytes = DeletionVectors.serialize(bm)
    assert(bytes.length < 1024,
      s"run-compressed DV should be tiny, was ${bytes.length} bytes")
    val back = DeletionVectors.deserialize(bytes)
    assert(back.getLongCardinality === 200000L)
  }

  test("deletePos writes a DV sidecar whose size tracks files, not rows") {
    val st = newStore()
    val df = spark.range(0, 200000).select(col("id").as("k"))
    st.create("t", df.schema)
    st.append("t", df.coalesce(2))
    // delete a dense 75% range: 150k tombstones
    st.deletePos("t", col("k") < 150000L)
    assert(st.pendingDeletes("t") === 1)
    assert(st.read("t").count() === 50000L)
    // sidecar on disk: 2 rows (one per data file), bitmap-compressed.
    // The pair format would be >= 1.2 MB of parquet; DV stays tiny.
    val root = new HPath(st.tableDir("t"), "deletes")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sidecarBytes = {
      val it = fs.listFiles(root, true)
      var sum = 0L
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) sum += f.getLen
      }
      sum
    }
    assert(sidecarBytes > 0 && sidecarBytes < 64 * 1024,
      s"DV sidecar should be KBs for 150k contiguous tombstones, " +
        s"was $sidecarBytes bytes")
  }

  test("broadcast DV mask is map-side: no join in the masked read plan") {
    val st = newStore()
    val df = spark.range(0, 1000).select(col("id").as("k"))
    st.create("t", df.schema)
    st.append("t", df.coalesce(1))
    st.deletePos("t", col("k") % 2 === 0)
    val masked = st.read("t")
    assert(masked.count() === 500L)
    val plan = masked.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"DV masking must be a map-side filter, plan was:\n$plan")
    assert(plan.contains("DvProbe") || plan.contains("dvprobe") ||
      plan.toLowerCase.contains("filter"), plan)
  }

  test("explodePairs inverts fromPairs (the anti-join fallback shape)") {
    val pairs = Seq(("f1", 0L), ("f1", 5L), ("f2", 3L), ("f1", 5L))
      .toDF(TableStore.PosFileCol, TableStore.PosIdxCol)
    val dv = DeletionVectors.fromPairs(pairs)
    assert(dv.count() === 2) // one row per file
    val back = DeletionVectors.explodePairs(dv)
      .as[(String, Long)].collect().sorted.toSeq
    assert(back === Seq(("f1", 0L), ("f1", 5L), ("f2", 3L)))
    // mergeDvs ORs multi-row files
    val dup = dv.union(DeletionVectors.fromPairs(
      Seq(("f1", 9L)).toDF(TableStore.PosFileCol, TableStore.PosIdxCol)))
    val merged = DeletionVectors.mergeDvs(dup)
    assert(merged.count() === 2)
    val f1 = merged.filter(col(TableStore.PosFileCol) === "f1")
      .select(DeletionVectors.DvCol).head().getAs[Array[Byte]](0)
    val bm = DeletionVectors.deserialize(f1)
    assert(bm.getLongCardinality === 3 && bm.contains(9L))
  }

  test("fromPairsLocal: per-task fold, no shuffle, consumers OR the rows") {
    // duplicates across partitions — each task folds what it sees
    val pairs = Seq(("f1", 0L), ("f1", 5L), ("f2", 3L), ("f1", 5L))
      .toDF(TableStore.PosFileCol, TableStore.PosIdxCol).repartition(3)
    val dv = DeletionVectors.fromPairsLocal(pairs)
    val back = DeletionVectors.explodePairs(dv).distinct()
      .as[(String, Long)].collect().sorted.toSeq
    assert(back === Seq(("f1", 0L), ("f1", 5L), ("f2", 3L)))
    assert(DeletionVectors.mergeDvs(dv).count() === 2)
    // the small-commit point: the fold itself plans with NO Exchange
    val flat = DeletionVectors.fromPairsLocal(Seq(("f", 1L))
      .toDF(TableStore.PosFileCol, TableStore.PosIdxCol))
    assert(!flat.queryExecution.executedPlan.toString.contains("Exchange"),
      flat.queryExecution.executedPlan.toString)
  }

  test("adaptive DV write compacts only materially duplicated sidecars") {
    val root = tmpDir("dvw-")
    val st = new TableStore(spark, root)
    def sidecar(rel: String): String =
      new HPath(new HPath(new HPath(root, "t"), "deletes"), rel).toString
    val df = spark.range(0, 10).select(col("id").as("k"))
    st.create("t", df.schema)
    st.append("t", df)
    // 100 files × 4 task-level duplicates = 400 written rows > threshold
    // AND > 1.5× the 100 distinct files → one bitmap-level merge pass
    val pairs = spark.range(0, 400).select(
      concat(lit("file-"), col("id") % 100).as(TableStore.PosFileCol),
      (col("id") % 7).as(TableStore.PosIdxCol)).repartition(4)
    assert(st.writeDvSidecar("t", "dv-test-dup", pairs))
    val dupOut = spark.read.schema(DeletionVectors.dvSchema)
      .parquet(sidecar("dv-test-dup"))
    assert(dupOut.count() === 100L, "duplicated sidecar must compact")
    // duplicate-free wide sidecar: over the row threshold but at one row
    // per file — a compaction pass would gain nothing, so none runs
    // (pinned as: the written rows stay exactly tasks-distinct = 200)
    val wide = spark.range(0, 200).select(
      concat(lit("w-"), col("id")).as(TableStore.PosFileCol),
      lit(0L).as(TableStore.PosIdxCol)).repartition(4)
    assert(st.writeDvSidecar("t", "dv-test-wide", wide))
    val wideOut = spark.read.schema(DeletionVectors.dvSchema)
      .parquet(sidecar("dv-test-wide"))
    assert(wideOut.count() === 200L)
    // nothing matched → no sidecar directory left behind
    val empty = spark.range(0, 0).select(
      lit("x").as(TableStore.PosFileCol), col("id").as(TableStore.PosIdxCol))
    assert(!st.writeDvSidecar("t", "dv-test-empty", empty))
  }

  test("legacy pair sidecars read exactly and upgrade to DV on rewrite") {
    val st = newStore()
    val df = spark.range(0, 100).select(col("id").as("k"))
    st.create("t", df.schema)
    st.append("t", df.coalesce(2))
    // a sidecar in the PRE-round-9 pair format
    st.deletePosLegacyPairs("t", col("k") < 10L)
    // plus a fresh DV sidecar — mixed formats must compose in one read
    st.deletePos("t", col("k") >= 95L)
    assert(st.pendingDeletes("t") === 2)
    assert(st.read("t").select("k").collect().map(_.getLong(0)).sorted.toSeq
      === (10L until 95L))
    // rewrite_deletes merges BOTH into one DV entry (the format upgrade)
    val (before, after) = st.rewriteDeletes("t")
    assert(before === 2 && after === 1)
    assert(st.read("t").count() === 85L)
    // a LONE legacy entry also upgrades (rewrite is the migration point)
    val st2 = newStore()
    st2.create("u", df.schema)
    st2.append("u", df.coalesce(1))
    st2.deletePosLegacyPairs("u", col("k") === 0L)
    val (b2, a2) = st2.rewriteDeletes("u")
    assert(b2 === 1 && a2 === 1)
    assert(st2.read("u").count() === 99L)
    // ...and the upgraded sidecar is idempotent under a second rewrite
    assert(st2.rewriteDeletes("u") === ((1, 1)))
  }

  test("t.deletes inspection surface reports pending sidecars by kind") {
    val root = tmpDir("dvmeta-")
    spark.conf.set("spark.sql.catalog.gdv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdv.root", root)
    val st = new TableStore(spark, root)
    val df = spark.range(0, 100).select(col("id").as("k"))
    st.create("t", df.schema)
    st.append("t", df.coalesce(1))
    assert(spark.sql("SELECT * FROM gdv.t.deletes").count() === 0L,
      "a clean table reports no pending deletes")
    st.deleteMoR("t", Seq(1L).toDF("k"), Seq("k"))
    st.deletePos("t", col("k") >= 90L)
    st.deletePosLegacyPairs("t", col("k") === 50L)
    val rows = spark.sql(
      "SELECT kind, key_columns, file_count, total_bytes " +
        "FROM gdv.t.deletes ORDER BY sequence, kind").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("equality", "deletion-vector", "position"))
    assert(rows.head.getString(1) === "k")
    assert(rows.forall(r => r.getLong(2) >= 1L && r.getLong(3) > 0L))
    // maintenance folds; the surface empties
    st.materializeDeletes("t")
    assert(spark.sql("SELECT * FROM gdv.t.deletes").count() === 0L)
  }

  test("updateMoR and materializeDeletes run on DV sidecars") {
    val st = newStore()
    val df = spark.range(0, 50)
      .select(col("id").as("k"), lit(1.0).as("v"))
    st.create("t", df.schema)
    st.append("t", df.coalesce(1))
    st.updateMoR("t", col("k") < 5L, Map("v" -> lit(9.0)))
    assert(st.pendingDeletes("t") === 1)
    assert(st.read("t").filter(col("v") === 9.0).count() === 5L)
    assert(st.read("t").count() === 50L)
    st.materializeDeletes("t")
    assert(st.pendingDeletes("t") === 0)
    assert(st.read("t").filter(col("v") === 9.0).count() === 5L)
    assert(st.read("t").count() === 50L)
  }
}
