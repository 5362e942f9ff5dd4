package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `write.distribution-mode` (the Iceberg write property): how a
  * partitioned append distributes rows across tasks before writing.
  * `none` (default) keeps today's behavior — every task emits a file per
  * partition dir it holds rows for; `hash` clusters by partition tuple
  * first, collapsing a wide write to one task's worth of files per dir
  * (the small-files fix: at 1000 tasks × 1000 dirs, a million files per
  * commit become one thousand); `range` clusters adjacent partition
  * values. File counts pinned here; correctness unchanged. */
class WriteDistributionSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): TableStore = new TableStore(spark, tmpDir("wd-"))

  private val rows = (0L until 200L).map(i => (i, i % 4, i.toDouble))
    .toDF("id", "k", "v")

  test("default none: every task writes into every dir it touches") {
    val st = newStore()
    st.create("t", rows.schema, partitionBy = Seq("bucket(4:k)"))
    st.append("t", rows.repartition(8))
    // 8 tasks × up-to-4 buckets: strictly more files than buckets
    assert(st.currentRelPaths("t").size > 4)
  }

  test("hash mode: one task's files per partition dir") {
    val st = newStore()
    st.create("t", rows.schema, partitionBy = Seq("bucket(4:k)"))
    st.setProperties("t", Map("write.distribution-mode" -> Some("hash")))
    st.append("t", rows.repartition(8))
    // every bucket's rows coalesce into exactly one task → exactly one
    // file per OCCUPIED bucket dir (k has 4 values but Murmur3 may
    // collide them into fewer buckets)
    val rels = st.currentRelPaths("t")
    val dirs = rels.map(_.split('/').head).distinct.size
    assert(rels.size === dirs, rels.mkString(", "))
    assert(dirs >= 2)
    // correctness untouched by the redistribution
    assert(st.read("t").orderBy("id").collect().map(_.getLong(0)).toSeq ===
      (0L until 200L))
  }

  test("range mode: one file per day on a days(ts) table") {
    val st = newStore()
    val ev = (0 until 120).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-${1 + i % 10}%02d 12:00:00"), i * 1.0)
    }.toDF("id", "ts", "v")
    st.create("e", ev.schema, partitionBy = Seq("days(ts)"))
    st.setProperties("e", Map("write.distribution-mode" -> Some("range")))
    st.append("e", ev.repartition(8))
    val rels = st.currentRelPaths("e")
    assert(rels.map(_.split('/').head).distinct.size === 10)
    assert(rels.size === 10, rels.mkString(", "))
    assert(st.read("e").count() === 120L)
  }

  test("unknown mode fails loudly at write time") {
    val st = newStore()
    st.create("t", rows.schema, partitionBy = Seq("bucket(4:k)"))
    st.setProperties("t", Map("write.distribution-mode" -> Some("zorder")))
    val e = intercept[IllegalArgumentException] { st.append("t", rows) }
    assert(e.getMessage.contains("write.distribution-mode"))
  }

  test("unpartitioned tables ignore the property") {
    val st = newStore()
    st.create("u", rows.schema)
    st.setProperties("u", Map("write.distribution-mode" -> Some("hash")))
    st.append("u", rows.repartition(3))
    assert(st.read("u").count() === 200L)
  }
}
