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

    st.create("part", sch, partitionBy = Seq("bucket(4, k)"))
    val e3 = intercept[IllegalArgumentException](st.addFiles("part", src))
    assert(e3.getMessage.contains("unpartitioned"))

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
