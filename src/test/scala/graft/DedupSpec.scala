package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val words =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima " +
      "mike november oscar papa quebec romeo sierra tango uniform victor whiskey"
  private val base = (words + " ") * 4 + words // ~115 tokens

  test("substringDedup excises planted shared spans, keeps one canonical") {
    // span = 10 tokens shared between A (keeper, lowest id) and B;
    // C is an exact whole-doc duplicate of A (fully excised);
    // D is distinct and shorter than k (passes through untouched)
    val span = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val a = s"a1 a2 $span a3 a4"
    val b = s"b1 b2 b3 b4 b5 b6 b7 b8 $span b9 b10"
    val docs = Seq((1L, a), (2L, b), (3L, a), (4L, "d1 d2 d3"))
      .toDF("doc_id", "text")
    val got = Dedup.substringDedup(docs, k = 8).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // A: keeper of every duplicated window → nothing removed
    assert(got(0) === ((1L, 14L, 0L)))
    // B: exactly the 10 span tokens removed (b1..b10 survive)
    assert(got(1) === ((2L, 20L, 10L)))
    // C: whole doc duplicated against A → everything removed
    assert(got(2) === ((3L, 14L, 14L)))
    // D: shorter than k → no windows, untouched
    assert(got(3) === ((4L, 3L, 0L)))
    // cleaned hashes: B keeps its unique frame in order; C hashes empty
    val md5s = Dedup.substringDedup(docs, k = 8).orderBy("doc_id")
      .collect().map(_.getString(3))
    val exp = spark.sql(
      "SELECT md5('b1 b2 b3 b4 b5 b6 b7 b8 b9 b10'), md5('')").head()
    assert(md5s(1) === exp.getString(0))
    assert(md5s(2) === exp.getString(1))
  }

  test("shingles: distinct word trigrams; short docs degrade gracefully") {
    val df = Seq("a b c d e", "x y").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
    val got = df.collect().map(_.getSeq[String](0).toSeq)
    assert(got(0) === Seq("a b c", "b c d", "c d e"))
    assert(got(1) === Seq("x y"))
  }

  test("jaccard: exact overlap ratio") {
    val df = Seq(("a b c d e f", "c d e f g h")).toDF("t1", "t2")
      .select(Dedup.jaccard(Dedup.shingles(col("t1")), Dedup.shingles(col("t2"))).as("j"))
    // shingles t1: abc bcd cde def; t2: cde def efg fgh → inter 2, union 6
    assert(math.abs(df.collect()(0).getDouble(0) - 2.0 / 6.0) < 1e-12)
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val nearDup = base.replace("echo", "zulu") // small perturbation
    val unrelated = (0 until 120).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, base), (1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))  // exact dup
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L))) // near dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incrementalNearDups flags arrivals that near-dup the corpus, batch-side only") {
    val nearDup = base.replace("echo", "zulu")
    val unrelated = (0 until 120).map(i => s"w$i").mkString(" ")
    val corpus = Seq((1L, base), (3L, unrelated)).toDF("doc_id", "text")
    // arrival 10 duplicates corpus doc 1; arrival 20 is novel;
    // arrivals 10 and 30 duplicate EACH OTHER — intra-batch pairs are
    // explicitly NOT this operator's job (minhashNearDups covers that)
    val batch = Seq((10L, nearDup), (20L, "completely different words here entirely"),
      (30L, base)).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDups(batch, corpus, 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got.contains((10L, 1L)))
    assert(got.contains((30L, 1L)))
    assert(!got.exists(_._1 == 20L)) // novel doc untouched
    assert(!got.exists(p => p._1 == 10L && p._2 == 30L)) // no intra-batch pair
  }

  test("dupClusters resolves transitive pairs to the smallest canonical id") {
    // pairs: 1-2, 2-3 (chain) and 7-8; singleton 9 never appears
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L)
    // driver union-find fast path
    val fast = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === want)
    // distributed label-propagation path (forced) must agree
    val dist = Dedup.dupClusters(pairs, smallGraphThreshold = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist === want)
  }

  test("cleanCorpus keeps canonicals and unclustered docs only") {
    val nearDup = base.replace("echo", "zulu")
    val docs = Seq(
      (0L, base), (1L, base), (2L, nearDup),
      (3L, (0 until 120).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val kept = graft.ops.Dedup.cleanCorpus(docs)
      .select("doc_id").as[Long].collect().sorted
    // 0,1,2 cluster together → canonical 0 survives; 3 untouched
    assert(kept.toSeq === Seq(0L, 3L))
  }

  test("containment finds a small doc pasted inside a big one (low Jaccard)") {
    val small = (0 until 20).map(i => s"tok$i").mkString(" ")
    val big = small + " " + (100 until 200).map(i => s"pad$i").mkString(" ")
    val unrelated = (300 until 420).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big), (3L, unrelated))
      .toDF("doc_id", "text")
    // jaccard is ~18/118 ≈ 0.15 — far below the minhash gate's 0.5 — but
    // every shingle of doc 1 is inside doc 2: containment 1.0
    val out = Dedup.containmentPairs(docs, 0.8).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    assert(out.head.getDouble(2) === 1.0)
    val jac = Dedup.minhashNearDups(docs, 0.5).collect()
    assert(jac.isEmpty) // the pair jaccard-LSH cannot see
  }

  test("bestPerCluster keeps the longest member, ties to the lowest id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "canonical")
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 50L), (7L, 5L), (8L, 5L))
      .toDF("doc_id", "n_chars")
    val out = graft.ops.Dedup.bestPerCluster(labels, docs)
      .orderBy("canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cluster 1: docs 2 and 3 tie at 50 chars → lower id 2 wins;
    // cluster 7: doc 7 and 8 tie at 5 → 7 wins
    assert(out.toSeq === Seq((1L, 3L, 2L, 50L), (7L, 2L, 7L, 5L)))
  }

  test("simhash: identical → equal; near → close; unrelated → far") {
    val nearDup = base.replace("echo", "zulu")
    val unrelated = (0 until 120).map(i => s"q$i").mkString(" ")
    val df = Seq((0L, base), (1L, base), (2L, nearDup), (3L, unrelated))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(m(0L) === m(1L))
    assert(hamming(m(0L), m(2L)) <= 6)
    assert(hamming(m(0L), m(3L)) > 10)
  }
}
