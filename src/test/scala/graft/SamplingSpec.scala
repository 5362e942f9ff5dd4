package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  test("hashSample is deterministic, id-stable, and near the target rate") {
    val df = (0L until 2000L).map(i => (i, s"text $i", "en")).toDF("doc_id", "text", "lang")
    val a = Sampling.hashSample(df, "doc_id", 10).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, "doc_id", 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b) // same ids every run
    assert(a.size > 120 && a.size < 280) // ~200 expected; md5 is uniform
    // monotone in rate: a 10% sample is a subset of a 20% sample
    val c = Sampling.hashSample(df, "doc_id", 20).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(c))
  }

  test("stratifiedSample keeps at most k per stratum, exactly k when available") {
    val df = ((0L until 100L).map(i => (i, s"t$i", "big")) ++
      (100L until 103L).map(i => (i, s"t$i", "small"))).toDF("doc_id", "text", "lang")
    val out = Sampling.stratifiedSample(df, "lang", "doc_id", 10)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("big" -> 10L, "small" -> 3L))
    // deterministic membership
    val m1 = Sampling.stratifiedSample(df, "lang", "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val m2 = Sampling.stratifiedSample(df, "lang", "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(m1 === m2)
  }

  test("contamination finds planted n-gram overlap and only that") {
    val bench = docs((1000L, "the quick brown fox jumps over the lazy dog", "en"))
    val train = docs(
      (1L, "completely unrelated text about spark partitions and shuffles here", "en"),
      (2L, "prefix words then the quick brown fox jumps and more after", "en"),
      (3L, "the quick brown fox jumps over the lazy dog", "en")) // full copy
    val out = Sampling.contamination(train, bench)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L, 3L))
    val full = out.find(_.getLong(0) == 3L).get
    assert(full.getLong(1) === full.getLong(2)) // every shingle hits
    assert(full.getDouble(3) === 1.0)
    val partial = out.find(_.getLong(0) == 2L).get
    assert(partial.getLong(1) > 0 && partial.getLong(1) < partial.getLong(2))
  }

  test("contamination drops null-text docs on both sides") {
    val bench = docs((1000L, "a b c d", "en"))
    val train = Seq((1L, null: String, "en"), (2L, "a b c d", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.contamination(train, bench).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
  }
}
