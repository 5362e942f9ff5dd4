package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Row lineage (`_row_id`, the Iceberg v3 surface): stable per-row ids
  * assigned metadata-only at commit (first_row_id + ordinal per virtual
  * file) and MATERIALIZED into rewritten files by every lineage-
  * preserving rewrite — so an entity can be tracked across compaction,
  * CoW deletes, merges, and MoR updates without a user-level key. */
class RowLineageSpec extends SparkSpec {
  import spark.implicits._

  private val root = tmpDir("lineage-")
  private val store = new TableStore(spark, root)

  private def lineageTable(name: String): Unit = {
    store.create(name,
      Seq.empty[(Long, Double)].toDF("k", "v").schema, overwrite = true,
      zoneCols = Seq("k"))
    store.setProperties(name, Map("row-lineage" -> Some("true")))
  }

  /** (k, _row_id) map of the current snapshot. */
  private def ids(name: String): Map[Long, Long] =
    store.readLineage(name).select("k", "_row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("appends assign unique, dense, commit-ordered ids") {
    lineageTable("a")
    store.append("a", (0L until 10L).map(i => (i, i.toDouble)).toDF("k", "v"))
    store.append("a", (10L until 15L).map(i => (i, i.toDouble)).toDF("k", "v"))
    val m = ids("a")
    assert(m.size === 15)
    assert(m.values.toSet.size === 15, "ids must be unique")
    assert(m.values.toSet === (0L until 15L).toSet,
      "two appends consume exactly [0, 15) — dense ranges, no gaps")
    // the second commit's rows sit strictly above the first's
    val firstBatch = m.filterKeys(_ < 10L).values.toSet
    assert(firstBatch === (0L until 10L).toSet)
  }

  test("CoW delete preserves surviving rows' ids") {
    lineageTable("d")
    store.append("d", (0L until 40L).map(i => (i, i.toDouble)).toDF("k", "v"))
    val before = ids("d")
    store.delete("d", col("k") % 4 === 0)
    val after = ids("d")
    assert(after.keySet === before.keySet.filterNot(_ % 4 == 0))
    after.foreach { case (k, id) => assert(id === before(k), s"k=$k") }
  }

  test("compaction preserves every id while rewriting every file") {
    lineageTable("c")
    (0 until 4).foreach(b => store.append("c",
      (b * 10L until b * 10L + 10L).map(i => (i, i.toDouble)).toDF("k", "v")))
    val before = ids("c")
    val filesBefore = store.currentRelPaths("c").toSet
    store.compact("c", numFiles = 2)
    assert(store.currentRelPaths("c").toSet.intersect(filesBefore).isEmpty)
    assert(ids("c") === before)
    // and a SECOND compaction re-carries the materialized ids
    store.compact("c", numFiles = 1)
    assert(ids("c") === before)
  }

  test("MoR update keeps the updated rows' ids; masked read agrees") {
    lineageTable("u")
    store.append("u", (0L until 30L).map(i => (i, i.toDouble)).toDF("k", "v"))
    val before = ids("u")
    store.updateMoR("u", col("k") < 5, Map("v" -> (col("v") + 100.0)))
    assert(store.pendingDeletes("u") === 1)
    val after = store.readLineage("u").select("k", "v", "_row_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(after.length === 30)
    after.foreach { case (k, v, id) =>
      assert(id === before(k), s"k=$k")
      assert(v === (if (k < 5) k + 100.0 else k.toDouble))
    }
    // materializing the pending sidecar preserves ids too
    store.materializeDeletes("u")
    assert(ids("u") === before)
  }

  test("merge: updated rows keep ids, inserts get fresh ones") {
    lineageTable("m")
    store.append("m", (0L until 20L).map(i => (i, i.toDouble)).toDF("k", "v"))
    val before = ids("m")
    val src = Seq((3L, 333.0), (7L, 777.0), (100L, 1.0), (101L, 2.0))
      .toDF("k", "v")
    store.merge("m", src, keyCols = Seq("k"), updateCols = Seq("v"))
    val after = ids("m")
    assert(after.keySet === before.keySet ++ Set(100L, 101L))
    (before.keySet -- Set(100L, 101L)).foreach(k =>
      assert(after(k) === before(k), s"k=$k"))
    val freshIds = Set(after(100L), after(101L))
    assert(freshIds.intersect(before.values.toSet).isEmpty,
      "inserted rows must get ids never used before")
    assert(after.values.toSet.size === after.size)
  }

  test("delete-then-reinsert of the same key gets a NEW id") {
    lineageTable("r")
    store.append("r", Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"))
    val id1 = ids("r")(1L)
    store.delete("r", col("k") === 1L)
    store.append("r", Seq((1L, 9.0)).toDF("k", "v"))
    assert(ids("r")(1L) !== id1,
      "a re-inserted key is a NEW entity, not the deleted one")
  }

  test("non-lineage tables are untouched; reserved name rejected") {
    store.create("plain", Seq.empty[(Long, Double)].toDF("k", "v").schema,
      overwrite = true)
    store.append("plain", Seq((1L, 1.0)).toDF("k", "v"))
    assert(!store.rowLineage("plain"))
    intercept[Exception](store.readLineage("plain"))
    assert(!store.read("plain").columns.contains("_row_id"))
    intercept[Exception] {
      store.create("bad",
        Seq.empty[(Long, Long)].toDF("k", "_row_id").schema)
    }
  }

  test("SQL merge-on-read UPDATE carries ids through the delta writer") {
    spark.conf.set("spark.sql.catalog.glin", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.glin.root", root)
    spark.sql("""CREATE TABLE glin.sd (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('row-lineage'='true',
        'write.update.mode'='merge-on-read',
        'write.merge.mode'='merge-on-read')""")
    spark.sql("INSERT INTO glin.sd VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val before = ids("sd")
    val files = store.currentRelPaths("sd").toSet
    spark.sql("UPDATE glin.sd SET v = v + 100.0 WHERE k >= 2")
    // still merge-on-read: originals intact, one positional sidecar
    assert(files.subsetOf(store.currentRelPaths("sd").toSet))
    assert(store.pendingDeletes("sd") === 1)
    val after = store.readLineage("sd").select("k", "v", "_row_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(after.length === 3)
    after.foreach { case (k, v, id) =>
      assert(id === before(k), s"k=$k must keep its id through SQL UPDATE")
      assert(v === (if (k >= 2) k + 100.0 else k.toDouble))
    }
    // a MERGE's NOT MATCHED insert still gets a FRESH id
    Seq((3L, 333.0), (9L, 9.0)).toDF("k", "v")
      .createOrReplaceTempView("glin_src")
    spark.sql("""MERGE INTO glin.sd t USING glin_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    val m = ids("sd")
    assert(m(3L) === before(3L), "merge-updated row keeps its id")
    assert(!before.values.toSet.contains(m(9L)), "insert gets a fresh id")
    assert(m.values.toSet.size === m.size)
  }

  test("SQL copy-on-write UPDATE/MERGE carry ids through the group rewrite") {
    spark.conf.set("spark.sql.catalog.glin2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.glin2.root", root)
    // NO merge-on-read properties → the group-based CoW rewrite path
    spark.sql("""CREATE TABLE glin2.cw (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('row-lineage'='true')""")
    spark.sql("INSERT INTO glin2.cw VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val before = ids("cw")
    spark.sql("UPDATE glin2.cw SET v = v + 100.0 WHERE k >= 2")
    val afterU = store.readLineage("cw").select("k", "v", "_row_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(afterU.length === 3)
    afterU.foreach { case (k, v, id) =>
      assert(id === before(k), s"k=$k keeps its id through CoW SQL UPDATE")
      assert(v === (if (k >= 2) k + 100.0 else k.toDouble))
    }
    // CoW MERGE: updated row keeps id, insert gets a fresh one
    Seq((3L, 333.0), (9L, 9.0)).toDF("k", "v")
      .createOrReplaceTempView("glin2_src")
    spark.sql("""MERGE INTO glin2.cw t USING glin2_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT *""")
    val m = ids("cw")
    assert(m(3L) === before(3L))
    assert(!before.values.toSet.contains(m(9L)))
    assert(m.values.toSet.size === m.size)
    // CoW SQL DELETE (rewrite path, subquery shape): survivors keep ids
    spark.sql(
      "DELETE FROM glin2.cw WHERE k IN (SELECT k FROM glin2_src WHERE v > 100)")
    val afterD = ids("cw")
    assert(afterD.keySet === Set(1L, 2L, 9L))
    afterD.foreach { case (k, id) => assert(id === m(k), s"k=$k") }
  }

  test("changeFeedLineage pairs updates by _row_id — no user key needed") {
    lineageTable("cf")
    store.append("cf", (0L until 10L).map(i => (i, i.toDouble)).toDF("k", "v"))
    val v0 = store.currentVersion("cf")
    // an update and an unrelated delete in separate commits
    store.updateMoR("cf", col("k") === 3L, Map("v" -> lit(333.0)))
    store.delete("cf", col("k") === 7L)
    val feed = store.changeFeedLineage("cf", v0, store.currentVersion("cf"))
      .select("k", "v", "_row_id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getString(3)))
    val byType = feed.groupBy(_._4)
    // the MoR update pairs pre/post by the shared id
    val pre = byType("update_preimage").toSeq
    val post = byType("update_postimage").toSeq
    assert(pre.map(x => (x._1, x._2)) === Seq((3L, 3.0)))
    assert(post.map(x => (x._1, x._2)) === Seq((3L, 333.0)))
    assert(pre.head._3 === post.head._3, "pre/post share the lineage id")
    // the unrelated delete stays a plain delete (no insert shares its id)
    assert(byType("delete").map(x => (x._1, x._2)).toSeq === Seq((7L, 7.0)))
    assert(!byType.contains("insert"))
  }

  test("SQL t.changes with lineage=true pairs by _row_id") {
    spark.conf.set("spark.sql.catalog.glin3", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.glin3.root", root)
    spark.sql("""CREATE TABLE glin3.cf2 (k BIGINT, v DOUBLE)
      TBLPROPERTIES ('row-lineage'='true')""")
    spark.sql("INSERT INTO glin3.cf2 VALUES (1, 1.0), (2, 2.0)")
    val v0 = store.currentVersion("cf2")
    store.updateMoR("cf2", col("k") === 2L, Map("v" -> lit(22.0)))
    val feed = spark.read
      .option("startVersion", v0).option("lineage", "true")
      .table("glin3.cf2.changes")
      .select("k", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(feed === Set((2L, 2.0, "update_preimage"),
      (2L, 22.0, "update_postimage")))
    intercept[Exception] {
      spark.read.option("startVersion", v0)
        .option("lineage", "true").option("updateKeys", "k")
        .table("glin3.cf2.changes").collect()
    }
  }

  private def rowIdColOf(df: DataFrame): Boolean =
    df.columns.contains("_row_id")

  test("plain read does not surface the lineage column uninvited") {
    lineageTable("q")
    store.append("q", Seq((1L, 1.0)).toDF("k", "v"))
    assert(!rowIdColOf(store.read("q")))
    assert(rowIdColOf(store.readLineage("q")))
  }
}
