package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.tables.TableStore

/** Bin-pack small-file compaction ([[TableStore.compactSmallFiles]] —
  * Iceberg's rewrite_data_files binpack strategy): ONLY undersized files
  * rewrite, right-sized files stay byte-identical on disk, pending MoR
  * deletes fold for exactly the rewritten rows, packing respects
  * partition directories, row lineage carries, and the operation is
  * idempotent. The full-table [[TableStore.compact]] stays the
  * restructuring tool; this is the O(small files) routine-maintenance
  * shape a 100 TB table needs after streaming/CDC ingestion. */
class BinpackSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def fileBytes(root: String, t: String): Map[String, Long] = {
    val base = new java.io.File(s"$root/$t/data")
    def rec(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).map(_.toSeq.flatMap(rec)).getOrElse(Nil)
    rec(base).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath.stripPrefix(base.getAbsolutePath + "/")
        -> f.length()).toMap
  }

  test("small files pack; right-sized files stay byte-identical; idempotent") {
    val root = tmpDir("binpack-")
    val st = new TableStore(spark, root)
    st.create("t", schema, zoneCols = Seq("id"))
    // one right-sized file (5k rows ≈ 40 KB) + six tiny ones
    st.append("t", (0L until 5000L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1))
    val bigRel = st.currentRelPaths("t").head
    val bigLen = fileBytes(root, "t")(bigRel)
    (0 until 6).foreach { b =>
      st.append("t", Seq((10000L + b, s"s$b")).toDF("id", "v").coalesce(1))
    }
    assert(st.currentRelPaths("t").size === 7)
    val (rw, wr) = st.compactSmallFiles("t", targetBytes = bigLen)
    assert(rw === 6 && wr >= 1 && wr < 6)
    val after = st.currentRelPaths("t")
    assert(after.contains(bigRel), "right-sized file must not rewrite")
    assert(fileBytes(root, "t")(bigRel) === bigLen)
    assert(after.size === 1 + wr)
    val rows = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length === 5006)
    assert(rows.takeRight(6).toSeq ===
      (0 until 6).map(b => (10000L + b, s"s$b")))
    // nothing left under-sized together: idempotent
    assert(st.compactSmallFiles("t", targetBytes = bigLen) === ((0, 0)))
  }

  test("pending MoR deletes fold for rewritten rows; untouched files keep their masks") {
    val root = tmpDir("binpack-")
    val st = new TableStore(spark, root)
    st.create("t", schema, zoneCols = Seq("id"))
    st.append("t", (0L until 5000L).map(i => (i, s"v$i")).toDF("id", "v")
      .coalesce(1)) // the big file — stays, mask must keep applying to it
    (0 until 4).foreach { b =>
      st.append("t", (0L until 10L).map(i => (20000L + b * 100 + i,
        s"s$b-$i")).toDF("id", "v").coalesce(1))
    }
    // tombstones hitting BOTH populations, committed merge-on-read
    st.deleteMoR("t", Seq(1L, 2L, 20001L, 20101L).toDF("id"), Seq("id"))
    assert(st.pendingDeletes("t") === 1)
    val expected = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (rw, _) = st.compactSmallFiles("t", targetBytes = 30000L)
    assert(rw === 4)
    // same visible rows; deleted ids resurrect nowhere
    val got = st.read("t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === expected)
    assert(!got.map(_._1).exists(Set(1L, 2L, 20001L, 20101L)))
    // the sidecar still pends (the untouched big file still needs it)
    assert(st.pendingDeletes("t") >= 1)
  }

  test("partitioned table: packing stays within partition directories") {
    val root = tmpDir("binpack-")
    val st = new TableStore(spark, root)
    val sch = StructType(StructField("k", LongType) +: schema.fields)
    st.create("t", sch, partitionBy = Seq("k"))
    (0 until 5).foreach { b =>
      st.append("t", (0L until 2L).flatMap(k =>
        (0L until 5L).map(i => (k, b * 100L + k * 10 + i, s"v$b-$k-$i")))
        .toDF("k", "id", "v").repartition(2, col("k")))
    }
    val before = st.currentRelPaths("t")
    assert(before.size === 10) // 5 appends × 2 dirs
    val (rw, wr) = st.compactSmallFiles("t", targetBytes = 1L << 20)
    assert(rw === 10 && wr <= 2)
    val after = st.currentRelPaths("t")
    // every file still lives under a k=<value> directory
    assert(after.forall(_.contains("k=")))
    val rows = st.read("t").orderBy("k", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length === 50)
    // partition pruning still serves: one dir's rows only
    assert(st.read("t").filter(col("k") === 1L).count() === 25)
  }

  test("row lineage carries through the pack") {
    val root = tmpDir("binpack-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    st.setProperties("t", Map("row-lineage" -> Some("true")))
    (0 until 3).foreach { b =>
      st.append("t", (0L until 4L).map(i => (b * 10L + i, s"v$b-$i"))
        .toDF("id", "v").coalesce(1))
    }
    val before = st.readLineage("t").select("id", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (rw, _) = st.compactSmallFiles("t", targetBytes = 30000L)
    assert(rw === 3)
    val after = st.readLineage("t").select("id", "_row_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before, "row ids must survive the rewrite")
  }

  test("unmergeable victims are a no-op, not a 1:1 rewrite loop") {
    val root = tmpDir("binpack-")
    val st = new TableStore(spark, root)
    st.create("t", schema)
    // two sibling files, each ~40 KB. With targetBytes = 60 KB both are
    // victims (< 3/4 * target = 45 KB) yet can never share a bin
    // (sum > target) — before the single-file-bin drop, every call
    // rewrote each 1:1 into a file that was STILL a victim, forever.
    (0 until 2).foreach { b =>
      st.append("t", (0L until 5000L).map(i => (b * 10000L + i, s"v$i"))
        .toDF("id", "v").coalesce(1))
    }
    val before = fileBytes(root, "t")
    assert(before.size === 2)
    val target = before.values.max * 3 / 2
    assert(before.values.forall(_ < target * 3 / 4), "both must be victims")
    assert(before.values.sum > target, "but they cannot share a bin")
    assert(st.compactSmallFiles("t", targetBytes = target) === ((0, 0)))
    assert(fileBytes(root, "t") === before, "files must stay byte-identical")
    // genuinely mergeable additions still pack: FFD folds the tiny
    // files into ONE of the 40 KB files' bin (3 inputs → 1 output);
    // the other 40 KB file lands alone in its bin and is left untouched
    (0 until 2).foreach { b =>
      st.append("t", Seq((90000L + b, s"s$b")).toDF("id", "v").coalesce(1))
    }
    val (rw, wr) = st.compactSmallFiles("t", targetBytes = target)
    assert(rw === 3 && wr === 1, s"got ($rw, $wr)")
    assert(st.read("t").count() === 10002)
  }

  test("SQL CALL surface: rewrite_small_files") {
    spark.conf.set("spark.sql.catalog.gbp",
      classOf[graft.tables.GraftCatalog].getName)
    val root = tmpDir("binpack-")
    spark.conf.set("spark.sql.catalog.gbp.root", root)
    val st = new TableStore(spark, root)
    st.create("t", schema)
    (0 until 5).foreach { b =>
      st.append("t", Seq((b.toLong, s"v$b")).toDF("id", "v").coalesce(1))
    }
    val r = spark.sql(
      "CALL gbp.system.rewrite_small_files(`table` => 't')").head()
    assert(r.getLong(0) === 5 && r.getLong(1) === 1)
    assert(st.read("t").count() === 5)
  }
}
