package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.tables.{TableStore, ZoneMapFileIndex}

/** `write.sort-order` (Iceberg's write sort order) + its interaction with
  * `write.distribution-mode=range`: every data-file write locally sorts
  * by the declared columns, and range distribution keys on (partition ++
  * sort order), so an unpartitioned-but-sorted table gets near-disjoint
  * file ranges — zone maps then prune range/point scans to a handful of
  * files. At 100 TB this is the difference between touching ~1/files_n
  * of the table and touching all of it on every time/key-scoped query,
  * without any explicit compaction pass. */
class SortOrderSpec extends SparkSpec {
  import spark.implicits._

  private def indexOf(df: org.apache.spark.sql.DataFrame): ZoneMapFileIndex =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation =>
        l.relation.asInstanceOf[HadoopFsRelation]
          .location.asInstanceOf[ZoneMapFileIndex]
    }.head

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  /** AQE coalesces this suite's tiny range shuffles to ONE partition
    * (64 MB advisory target vs a few KB of rows), which would collapse
    * the multi-file layout the assertions inspect; at real scale the
    * coalesced partitions are exactly the right-sized files we want.
    * Same save/restore pattern the plan-pinning gates use. */
  private def withoutCoalesce[A](body: => A): A = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // deterministically shuffled ids 0..799 in 8 input partitions: the
  // WRITE layout must come from the table properties, not the input
  private def shuffled() =
    spark.range(800).select(col("id"))
      .withColumn("h", hash(col("id")))
      .repartition(8, col("h"))
      .sortWithinPartitions("h")
      .select(col("id"), concat(lit("v"), col("id")).as("v"))

  test("range distribution + sort order yields near-disjoint files; scans prune") {
    val st = new TableStore(spark, tmpDir("sortorder-"))
    st.create("t", schema, zoneCols = Seq("id"))
    st.setProperties("t", Map(
      "write.distribution-mode" -> Some("range"),
      "write.sort-order" -> Some("id")))
    withoutCoalesce { st.append("t", shuffled()) }

    // a narrow range lands in ONE file of the range-distributed four
    val q = st.read("t").filter(col("id") >= 100L && col("id") <= 150L)
    assert(q.orderBy("id").collect().map(_.getLong(0)).toSeq ===
      (100L to 150L))
    val (total, scanned) = indexOf(q).lastScanCounts.get
    assert(total >= 4, s"expected multiple files, got $total")
    assert(scanned <= 2, s"sorted+ranged write should prune to <=2 " +
      s"files, scanned $scanned of $total")

    // point lookup: one file
    val eq = st.read("t").filter(col("id") === 42L)
    assert(eq.collect().map(_.getLong(0)).toSeq === Seq(42L))
    assert(indexOf(eq).lastScanCounts.get._2 === 1)
  }

  test("sorting alone (no distribution) keeps correctness; pruning needs the range shuffle") {
    val st = new TableStore(spark, tmpDir("sortorder-"))
    st.create("t", schema, zoneCols = Seq("id"))
    st.setProperties("t", Map("write.sort-order" -> Some("id")))
    st.append("t", shuffled())
    val q = st.read("t").filter(col("id") >= 100L && col("id") <= 150L)
    assert(q.orderBy("id").collect().map(_.getLong(0)).toSeq ===
      (100L to 150L))
    // every task saw the full id range, so file zone ranges overlap and
    // nothing can prune — the property combination matters, not either
    // alone (this pins the DOCUMENTED behavior, not an aspiration)
    val (total, scanned) = indexOf(q).lastScanCounts.get
    assert(scanned === total)
  }

  test("DESC order and multi-column specs parse; rewrites stay sorted") {
    val st = new TableStore(spark, tmpDir("sortorder-"))
    st.create("t", schema, zoneCols = Seq("id"))
    st.setProperties("t", Map(
      "write.distribution-mode" -> Some("range"),
      "write.sort-order" -> Some("id DESC, v ASC")))
    withoutCoalesce {
      st.append("t", shuffled())
      // CoW delete rewrites files through the same sorted-write path
      st.delete("t", col("id") % 10L === 0L)
    }
    val q = st.read("t").filter(col("id") >= 500L && col("id") <= 540L)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ===
      (500L to 540L).filterNot(_ % 10 == 0))
    val (total, scanned) = indexOf(q).lastScanCounts.get
    assert(scanned < total, s"rewritten files lost their sort: $scanned/$total")
  }

  test("unknown column or direction fails loud at write time") {
    val st = new TableStore(spark, tmpDir("sortorder-"))
    st.create("t", schema)
    st.setProperties("t", Map("write.sort-order" -> Some("nope")))
    val e = intercept[IllegalArgumentException] {
      st.append("t", Seq((1L, "a")).toDF("id", "v"))
    }
    assert(e.getMessage.contains("unknown column"))
    st.setProperties("t", Map("write.sort-order" -> Some("id SIDEWAYS")))
    val e2 = intercept[IllegalArgumentException] {
      st.append("t", Seq((1L, "a")).toDF("id", "v"))
    }
    assert(e2.getMessage.contains("unknown direction"))
  }

  test("partitioned table: sort order applies within partition dirs") {
    val st = new TableStore(spark, tmpDir("sortorder-"))
    val sch = StructType(Seq(StructField("k", LongType),
      StructField("id", LongType), StructField("v", StringType)))
    st.create("t", sch, partitionBy = Seq("k"), zoneCols = Seq("id"))
    st.setProperties("t", Map(
      "write.distribution-mode" -> Some("range"),
      "write.sort-order" -> Some("id")))
    st.append("t", spark.range(800).select(
      (col("id") % 2).as("k"), col("id"),
      concat(lit("v"), col("id")).as("v")))
    // partition-key predicate prunes dirs AND the sort prunes within
    val q = st.read("t")
      .filter(col("k") === 1L && col("id") >= 100L && col("id") <= 160L)
    assert(q.collect().map(_.getAs[Long]("id")).sorted.toSeq ===
      (100L to 160L).filter(_ % 2 == 1))
    val (_, scanned) = indexOf(q).lastScanCounts.get
    assert(scanned <= 2)
  }

  test("z-order compaction overrides the declared sort order for its rewrite") {
    val st = new TableStore(spark, tmpDir("sortorder-"))
    val sch = StructType(Seq(StructField("a", LongType),
      StructField("b", LongType)))
    st.create("t", sch, zoneCols = Seq("a", "b"))
    st.setProperties("t", Map("write.sort-order" -> Some("a")))
    st.append("t", spark.range(4096).select(
      col("id").as("a"), (lit(4095L) - col("id")).as("b")))
    st.compact("t", numFiles = 8, clusterCols = Seq("a", "b"))
    // the interleaved clustering survived: BOTH columns prune
    val qa = st.read("t").filter(col("a") >= 100L && col("a") <= 120L)
    val qb = st.read("t").filter(col("b") >= 100L && col("b") <= 120L)
    assert(qa.count() === 21 && qb.count() === 21)
    assert(indexOf(qa).lastScanCounts.get._2 < 8)
    assert(indexOf(qb).lastScanCounts.get._2 < 8)
  }
}
