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

  test("packSequences assigns docs to token-budget bins by start offset") {
    // docs of 6 tokens each, budget 10: starts 0,6,12,18 → seqs 0,0,1,1
    val df = (0L until 4L).map(i => (i, "a b c d e f", "s0"))
      .toDF("doc_id", "text", "source")
    val out = Sampling.packSequences(df, "source", 10)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 6L, 0L), (1L, 6L, 0L), (2L, 6L, 1L), (3L, 6L, 1L)))
    // strata pack independently: same ids in another source restart at seq 0
    val two = ((0L until 2L).map(i => (i, "a b c d e f", "s0")) ++
      (10L until 12L).map(i => (i, "a b c d e f", "s1")))
      .toDF("doc_id", "text", "source")
    val seqs = Sampling.packSequences(two, "source", 10)
      .groupBy("source").agg(min("seq_id"), max("seq_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(seqs === Set(("s0", 0L, 0L), ("s1", 0L, 0L)))
  }

  test("chunk emits fixed-stride token windows clamped to doc length") {
    val df = Seq((1L, ("w " * 100).trim), (2L, "a b")).toDF("doc_id", "text")
    val out = Sampling.chunk(df, 64, 16)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start_tok", "end_tok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    // 100 tokens, stride 48: starts 0, 48, 96
    assert(out.filter(_._1 == 1L).toSeq ===
      Seq((1L, 0L, 0, 64), (1L, 1L, 48, 100), (1L, 2L, 96, 100)))
    // short doc: one clamped chunk
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0, 2)))
  }

  test("mixtureWeights rebalances toward uniform token share") {
    val df = (Seq.fill(30)("t t t t") ++ Seq.fill(10)("t t")).zipWithIndex
      .map { case (txt, i) => (i.toLong, txt, if (i < 30) "big" else "small") }
      .toDF("doc_id", "text", "lang")
    val out = Sampling.mixtureWeights(df, "lang").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // big: 120 tokens, small: 20 → total 140, k=2
    assert(out("big")._1 === 120L && out("small")._1 === 20L)
    assert(math.abs(out("big")._2 - 120.0 / 140) < 1e-12)
    assert(math.abs(out("big")._3 - 140.0 / (2 * 120)) < 1e-12) // downsample
    assert(math.abs(out("small")._3 - 140.0 / (2 * 20)) < 1e-12) // upsample
    // weighted token mass equalizes across strata
    assert(math.abs(out("big")._1 * out("big")._3 -
      out("small")._1 * out("small")._3) < 1e-9)
  }

  test("qualityPercentileFilter cuts each stratum at its own p25") {
    // stratum A: scores 0.1..0.8 (8 docs) → p25 cutoff = element at
    // rank 8 div 4 = 2 → 0.2 → keeps 0.2..0.8 (7 docs);
    // stratum B: uniformly high scores — a GLOBAL cutoff would keep all,
    // the per-stratum rule still drops B's own worst quarter
    val scored = ((1L to 8L).map(i => (i, "A", i / 10.0, 100)) ++
      (11L to 18L).map(i => (i, "B", 0.9 + (i - 10) / 100.0, 100)))
      .toDF("doc_id", "lang", "quality_score", "n_tokens")
    val kept = graft.ops.Sampling.qualityPercentileFilter(scored, "lang")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === ((2L to 8L) ++ (12L to 18L)).toSet)
  }

  test("contamination drops null-text docs on both sides") {
    val bench = docs((1000L, "a b c d", "en"))
    val train = Seq((1L, null: String, "en"), (2L, "a b c d", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.contamination(train, bench).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("trainValTestSplit is exhaustive, disjoint, stable under corpus growth") {
    val small = (0L until 500L).map(i => (i, s"t$i", "en")).toDF("doc_id", "text", "lang")
    val grown = (0L until 2000L).map(i => (i, s"t$i", "en")).toDF("doc_id", "text", "lang")
    def splits(df: org.apache.spark.sql.DataFrame) =
      Sampling.trainValTestSplit(df, "doc_id", 90, 5)
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s1 = splits(small)
    val s2 = splits(grown)
    // every doc gets exactly one label; rates are near 90/5/5
    assert(s2.size === 2000)
    val byLabel = s2.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel("train") > 1700 && byLabel("train") < 1900)
    assert(byLabel("val") > 40 && byLabel("val") < 180)
    assert(byLabel("test") > 40 && byLabel("test") < 180)
    // growth stability: docs present in both corpora keep their label
    s1.foreach { case (id, label) => assert(s2(id) === label) }
  }

  test("end-to-end corpus prep composes: clean -> split -> pack") {
    // the full training-data pipeline over planted docs: near-dup removal
    // keeps each cluster's canonical, every survivor gets a split label,
    // and packing assigns token-budget sequences per split
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, base),                       // canonical of the dup cluster
      (2L, base + " iota"),             // near-dup of 1 → dropped
      (10L, "one two three four five six seven eight"),
      (11L, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
      (12L, "seventeen eighteen nineteen twenty twentyone twentytwo twentythree twentyfour"))
      .toDF("doc_id", "text")
    val kept = graft.ops.Dedup.cleanCorpus(docs, 0.5)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    assert(keptIds === Set(1L, 10L, 11L, 12L), s"got $keptIds")
    val split = Sampling.trainValTestSplit(kept, "doc_id", 90, 5)
    assert(split.filter(col("split").isNull).count() === 0)
    val packed = Sampling.packSequences(split, "split", 16)
      .select("doc_id", "split", "n_tokens", "seq_id").collect()
    assert(packed.length === 4)
    // 8 tokens per doc, budget 16 → within a split, docs pack two per
    // sequence in id order
    packed.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val seqs = rows.sortBy(_.getLong(0)).map(_.getLong(3)).toSeq
      assert(seqs === seqs.sorted)
      rows.foreach(r => assert(r.getLong(2) === 8L))
    }
  }

  test("temperatureSample: expected budget, temperature flattening, " +
    "determinism, rate cap") {
    import spark.implicits._
    // source A: 100 docs x 100 tokens; source B: 20 docs x 10 tokens
    val docs = ((1L to 100L).map(i => (i, "A", Seq.fill(100)("w").mkString(" "))) ++
      (201L to 220L).map(i => (i, "B", Seq.fill(10)("w").mkString(" "))))
      .toDF("doc_id", "source", "text")
    val sel = Sampling.temperatureSample(docs, budget = 2000L)
    val byS = sel.groupBy("source").agg(sum("tok").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = byS.values.sum
    // expected-budget semantics: within a loose band of the target
    assert(total > 1000 && total < 3200, s"total $total vs budget 2000")
    // temperature flattening: B's raw token share is 200/10200 (~2%),
    // but sqrt weighting gives it sqrt(200)/(sqrt(10000)+sqrt(200)) ~12%
    // of the budget -> B's selected share must exceed its raw share
    val bShare = byS.getOrElse("B", 0L).toDouble / total
    assert(bShare > 0.05, s"B share $bShare not flattened upward")
    // deterministic: the same call selects the same docs
    val ids1 = sel.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = Sampling.temperatureSample(docs, budget = 2000L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.toSeq === ids2.toSeq)
    // a budget above the corpus selects everything (rate caps at 1)
    assert(Sampling.temperatureSample(docs, budget = 1000000L).count() === 120L)
  }

  test("leakFreeSplit keeps near-dup pairs in one split; " +
    "singletons match the per-doc split") {
    import spark.implicits._
    val docs = (1L to 200L)
      .map(i => (i, s"doc $i body", 10L)).toDF("doc_id", "text", "n_chars")
    // planted clusters chosen so a PER-DOC split would tear them apart
    val pairs = Seq((1L, 2L), (2L, 3L), (50L, 51L), (120L, 121L))
      .toDF("a", "b")
    val split = Sampling.leakFreeSplit(docs, pairs, 60, 20)
    val byDoc = split.select("doc_id", "split", "canonical").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // every cluster member shares the survivor's split
    assert(Seq(1L, 2L, 3L).map(byDoc(_)._1).distinct.size === 1)
    assert(byDoc(50L)._1 === byDoc(51L)._1)
    assert(byDoc(120L)._1 === byDoc(121L)._1)
    // cluster members all carry the lowest-id canonical
    assert(Seq(1L, 2L, 3L).forall(byDoc(_)._2 === 1L))
    // singletons: identical to the plain per-doc split (adoption moves
    // only documents that needed moving)
    val plain = Sampling.trainValTestSplit(docs, "doc_id", 60, 20)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val clustered = Set(1L, 2L, 3L, 50L, 51L, 120L, 121L)
    (1L to 200L).filterNot(clustered).foreach { i =>
      assert(byDoc(i)._1 === plain(i), s"singleton $i moved")
    }
    // sanity: with 4 clusters and a 60/20/20 split the planted clusters
    // are not all in 'train' by luck of one hash — at least the property
    // tested above is non-vacuous when any cluster spans a boundary
    // under the per-doc split
    assert(Seq(Seq(1L, 2L, 3L), Seq(50L, 51L), Seq(120L, 121L)).exists(c =>
      c.map(plain(_)).distinct.size > 1),
      "fixture too weak: per-doc split kept every planted cluster intact")
  }
}
