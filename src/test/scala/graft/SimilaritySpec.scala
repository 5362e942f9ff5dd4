package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("cosine matches hand-computed values") {
    val df = Seq(
      (vec(1, 0, 0, 0), vec(1, 0, 0, 0), 1.0),
      (vec(1, 0, 0, 0), vec(0, 1, 0, 0), 0.0),
      (vec(1, 1, 0, 0), vec(1, 0, 0, 0), 1.0 / math.sqrt(2))).toDF("a", "b", "want")
      .select(Similarity.cosine(col("a"), col("b")).as("cos"), col("want"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-7)
    }
  }

  test("brute-force top-k ranks an identical vector first") {
    val rnd = new scala.util.Random(7)
    def noise() = Array.fill(64)((rnd.nextGaussian() / 100).toFloat)
    val q = Array.fill(64)(rnd.nextGaussian().toFloat)
    val close = q.zip(noise()).map { case (x, n) => x + n }
    val corpus = (Seq((100L, close, 0)) ++
      (0 until 50).map(i => (200L + i, Array.fill(64)(rnd.nextGaussian().toFloat), 1)))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq((0L, q, 0)).toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteTopK(corpus, queries, 3)
      .orderBy("rank").collect()
    assert(top(0).getAs[Long]("vec_id") === 100L)
    assert(top(0).getAs[Double]("cos") > 0.99)
  }

  test("TopKAggregator equals the window-rank formulation") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(23)
    val corpus = (0 until 200).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat), i % 5))
      .toDF("vec_id", "embedding", "label")
    val queries = corpus.filter(col("vec_id") < 4)
    val agg = Similarity.bruteTopK(corpus, queries, 7)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    // independent window-based reference
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    val ref = corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", Similarity.cosine(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    assert(agg.toSeq === ref.toSeq)
  }

  test("IVF ANN recalls planted near-neighbours") {
    val rnd = new scala.util.Random(13)
    val bases = (0 until 6).map(_ => Array.fill(64)(rnd.nextGaussian().toFloat))
    // vec_ids laid out so the centroid sample (every n/k-th id) lands in
    // different clusters; 8 tight vectors per base
    val corpus = bases.zipWithIndex.flatMap { case (b, bi) =>
      (0 until 8).map { j =>
        (bi * 8L + j, b.map(x => x + (rnd.nextGaussian() / 60).toFloat), bi)
      }
    }.toDF("vec_id", "embedding", "label")
    val queries = bases.zipWithIndex
      .map { case (b, bi) => (9000L + bi, b, bi) }
      .toDF("vec_id", "embedding", "label")
    val ivf = Similarity.ivfTopK(corpus, queries, 5, nCells = 6, nprobe = 2)
      .collect()
    val byQuery = ivf.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size === 6)
    byQuery.foreach { case (qid, rows) =>
      val cluster = (qid - 9000L).toInt
      val hits = rows.count(_.getAs[Int]("label") == cluster)
      assert(hits >= 4, s"query $qid recalled only $hits planted neighbours")
    }
  }

  test("LSH ANN recalls planted near-neighbours") {
    val rnd = new scala.util.Random(11)
    val bases = (0 until 8).map(_ => Array.fill(64)(rnd.nextGaussian().toFloat))
    // corpus: 5 tight neighbours around each base + 100 random
    val corpus = (bases.zipWithIndex.flatMap { case (b, bi) =>
      (0 until 5).map { j =>
        (bi * 10L + j, b.map(x => x + (rnd.nextGaussian() / 50).toFloat), bi)
      }
    } ++ (0 until 100).map(i =>
      (1000L + i, Array.fill(64)(rnd.nextGaussian().toFloat), 99)))
      .toDF("vec_id", "embedding", "label")
    val queries = bases.zipWithIndex
      .map { case (b, bi) => (5000L + bi, b, bi) }
      .toDF("vec_id", "embedding", "label")
    val ann = Similarity.annTopK(corpus, queries, 5).collect()
    // every query must recall at least 3 of its 5 planted neighbours
    val byQuery = ann.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size === 8)
    byQuery.foreach { case (qid, rows) =>
      val cluster = (qid - 5000L).toInt
      val hits = rows.count(_.getAs[Int]("label") == cluster)
      assert(hits >= 3, s"query $qid recalled only $hits planted neighbours")
    }
  }

  test("kmeansCentroids: one Lloyd round lands on exact member means; empty cells persist") {
    // two tight clusters, one seed in each (ids 0,3 at step n/k = 3);
    // exactly representable components so the refined centroid must equal
    // the hand-computed mean bit-for-bit
    val corpus = Seq(
      (0L, vec(1.0, 0, 0, 0), 0),
      (1L, vec(0.5, 0, 0, 0), 0),
      (2L, vec(0.75, 0, 0, 0), 0),
      (3L, vec(0, 1.0, 0, 0), 1),
      (4L, vec(0, 0.5, 0, 0), 1),
      (5L, vec(0, 0.75, 0, 0), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.kmeansCentroids(corpus, nCells = 2, iters = 1)
      .toMap
    assert(cents(0L).toSeq === Seq(0.75, 0.0, 0.0, 0.0))
    assert(cents(3L).toSeq === Seq(0.0, 0.75, 0.0, 0.0))
    // identical vectors: score ties break to ONE cell, the other goes
    // empty and must keep its seed instead of collapsing to NaN
    val same = (0L until 4L).map(i => (i, vec(1, 0, 0, 0), 0))
      .toDF("vec_id", "embedding", "label")
    val kept = Similarity.kmeansCentroids(same, nCells = 2, iters = 2).toMap
    assert(kept.values.forall(_.forall(x => !x.isNaN)))
    assert(kept(0L).toSeq === Seq(1.0, 0.0, 0.0, 0.0))
  }

  test("Lloyd-refined IVF recall is at least the seeded-centroid recall") {
    val rnd = new scala.util.Random(13)
    val bases = (0 until 6).map(_ => Array.fill(64)(rnd.nextGaussian().toFloat))
    val corpus = bases.zipWithIndex.flatMap { case (b, bi) =>
      (0 until 8).map { j =>
        (bi * 8L + j, b.map(x => x + (rnd.nextGaussian() / 60).toFloat), bi)
      }
    }.toDF("vec_id", "embedding", "label")
    val queries = bases.zipWithIndex
      .map { case (b, bi) => (9000L + bi, b, bi) }
      .toDF("vec_id", "embedding", "label")
    def totalHits(cents: Array[(Long, Array[Double])]): Int =
      Similarity.ivfTopK(corpus, queries, 5, nCells = 6, nprobe = 2,
          centroidsOverride = cents)
        .collect()
        .count(r => r.getAs[Int]("label") == (r.getAs[Long]("query_id") - 9000L).toInt)
    val seeded = totalHits(Similarity.seedCentroids(corpus, 6))
    val refined = totalHits(Similarity.kmeansCentroids(corpus, 6, iters = 2))
    assert(refined >= seeded, s"refined recall $refined < seeded $seeded")
    assert(refined >= 24) // at least 4 of 5 per query on average
  }

  test("PQ codes: shape, range, and self-assignment of codebook seeds") {
    val rnd = new scala.util.Random(31)
    val corpus = (0 until 64).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat), i % 4))
      .toDF("vec_id", "embedding", "label")
    val books = Similarity.pqCodebooks(corpus, m = 8, ksub = 16)
    assert(books.length === 8)
    assert(books.forall(_.length === 16))
    assert(books.forall(_.forall(_.length === 8)))
    val codes = corpus
      .select(col("vec_id"), Similarity.pqCodes(col("embedding"), books).as("codes"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
      .toMap
    assert(codes.values.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
    // a seed vector's sub-vectors are codebook entries — distance 0 to
    // themselves, so every seed must encode to its own code index
    val step = 64 / 16
    (0 until 16).foreach { j =>
      assert(codes(j.toLong * step) === Seq.fill(8)(j),
        s"seed $j did not self-assign")
    }
  }

  test("PQ top-k with full-corpus rerank equals brute force") {
    val rnd = new scala.util.Random(47)
    val corpus = (0 until 120).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat), i % 5))
      .toDF("vec_id", "embedding", "label")
    val queries = corpus.filter(col("vec_id") < 3)
    // rerank ≥ corpus size → the candidate list is the whole corpus and
    // the exact re-rank must reproduce brute-force exactly
    val pq = Similarity.pqTopK(corpus, queries, 6, rerank = 200)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    val brute = Similarity.bruteTopK(corpus, queries, 6)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    assert(pq.toSeq === brute.toSeq)
  }

  test("PQ ADC recalls planted near-neighbours from codes alone") {
    val rnd = new scala.util.Random(59)
    val bases = (0 until 4).map(_ => Array.fill(64)(rnd.nextGaussian().toFloat * 3))
    val corpus = bases.zipWithIndex.flatMap { case (b, bi) =>
      (0 until 16).map { j =>
        (bi * 16L + j, b.map(x => x + (rnd.nextGaussian() / 50).toFloat), bi)
      }
    }.toDF("vec_id", "embedding", "label")
    val queries = bases.zipWithIndex
      .map { case (b, bi) => (9000L + bi, b, bi) }
      .toDF("vec_id", "embedding", "label")
    // tight rerank: recall must come from the ADC scores, not the re-rank
    val pq = Similarity.pqTopK(corpus, queries, 5, ksub = 8, rerank = 6).collect()
    val byQuery = pq.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size === 4)
    byQuery.foreach { case (qid, rows) =>
      val cluster = (qid - 9000L).toInt
      val hits = rows.count(_.getAs[Int]("label") == cluster)
      assert(hits >= 4, s"query $qid recalled only $hits/5 from its cluster")
    }
  }

  test("int8QuantStats: range, reconstruction bound, zero-vector drop") {
    val emb = Seq(
      (1L, Seq(100.0, -50.0, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0)), // zero vector: no valid scale → dropped
      (3L, Seq(-7.0, 7.0, 3.0)))
      .toDF("vec_id", "q")
    val out = Similarity.int8QuantStats(emb).orderBy("vec_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val r1 = out.head
    assert(r1.getLong(1) === 100L) // amax
    // qi = [127, round(-63.5) = -64, 0] → sum 63, two nonzero
    assert(r1.getLong(2) === 63L)
    assert(r1.getInt(3) === 2)
    // worst reconstruction error ≤ half a quantization step (amax/254)
    // plus the half-ulp of the rounding chain
    out.foreach { r =>
      assert(r.getDouble(4) <= r.getLong(1) / 254.0 + 1e-9,
        s"vec ${r.getLong(0)} err ${r.getDouble(4)} exceeds half-step")
    }
  }

  test("semDedup: within-cell near-identicals mark the higher id; " +
      "distinct directions survive") {
    val rnd = new scala.util.Random(11)
    def unit(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(16)(r.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + (rnd.nextGaussian() / 1000).toFloat)
    val base = (0 until 8).map(unit)
    // ids 0..7 seed the 8 cells (seedCentroids: every (n/8)-th id with
    // n=16 → step 2 → ids 0,2,4,..14; keep it simple: 16 rows, 8 cells)
    val rows = (0 until 8).map(i => (i.toLong * 2, base(i), 0)) ++
      // near-identical copies of base(1) and base(3) at HIGHER ids
      Seq((101L, jitter(base(1)), 0), (103L, jitter(base(3)), 0),
        // an unrelated direction: survives
        (105L, unit(999), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedup(df, nCells = 8, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(101L) === true, "jittered copy of a lower id must mark dup")
    assert(out(103L) === true)
    assert(out(105L) === false, "distinct direction must survive")
    assert((0 until 8).forall(i => !out(i.toLong * 2)),
      "cell representatives must survive")
    // tau above every similarity keeps everything
    val none = Similarity.semDedup(df, nCells = 8, tau = 1.1)
      .collect().forall(!_.getBoolean(2))
    assert(none)
  }

  test("annRecall: hit counts bounded by truth, planted clusters recalled, " +
    "misses reported not dropped") {
    val rnd = new scala.util.Random(13)
    val bases = (0 until 4).map(_ => Array.fill(64)(rnd.nextGaussian().toFloat))
    val corpus = (bases.zipWithIndex.flatMap { case (b, bi) =>
      (0 until 6).map { j =>
        (bi * 10L + j, b.map(x => x + (rnd.nextGaussian() / 50).toFloat), bi)
      }
    } ++ (0 until 80).map(i =>
      (1000L + i, Array.fill(64)(rnd.nextGaussian().toFloat), 99)))
      .toDF("vec_id", "embedding", "label")
    val queries = bases.zipWithIndex
      .map { case (b, bi) => (5000L + bi, b, bi) }
      .toDF("vec_id", "embedding", "label")
    val rows = Similarity.annRecall(corpus, queries, 5).collect()
    assert(rows.length === 4) // one row per query even at recall 0
    rows.foreach { r =>
      val (nTrue, nHits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nTrue === 5L)
      assert(nHits >= 0L && nHits <= nTrue)
      assert(math.abs(recall - nHits.toDouble / nTrue) < 1e-12)
      // planted clusters are LSH-findable: brute truth is the 5 cluster
      // members and the ANN leg recovers a majority of them
      assert(nHits >= 3L, s"query ${r.getLong(0)} recall too low: $nHits/5")
    }
  }
}
