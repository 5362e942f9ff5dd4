package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Operators whose built-in form does not survive scale, re-expressed with
  * scalable plans.
  *
  * `NTILE(n) OVER (ORDER BY …)` — an empty PARTITION BY — makes Spark's
  * WindowExec move the whole table to ONE partition (it even warns). At
  * 100 TB that is not a slowdown, it is an OOM. The same semantics are
  * computable with a range-partitioned sort plus two linear passes:
  *
  *   1. range-repartition + sort-within-partitions on the order key — the
  *      scalable global sort (range boundaries are ordered by partition
  *      index, so partition i holds strictly smaller keys than i+1);
  *   2. count rows per partition (tiny driver-side array);
  *   3. per partition, global rank = partition offset + local index, and
  *      the exact SQL NTILE bucket formula on (rank, total).
  *
  * Genuine per-partition imperative logic — the documented case where
  * dropping to the RDD layer is the right call.
  */
object ScaleOps {

  /** Guarantee at least `minParts` partitions before a CPU-heavy map stage.
    *
    * A small parquet input (one row group) arrives as ONE partition, and
    * Spark cannot split below row-group granularity — so an expression-
    * heavy stage (per-shingle hashing, per-token md5) serializes on one
    * core no matter how many executors exist (observed: the MinHash
    * signature stage ran 3.6 s in a single task at local[8]). The
    * round-robin repartition costs one small shuffle of the raw rows and
    * buys full parallelism for everything downstream. At scale, inputs
    * already arrive in many partitions and this is a no-op. */
  def ensureParallelism(df: DataFrame, minParts: Int): DataFrame =
    if (df.rdd.getNumPartitions >= minParts) df else df.repartition(minParts)

  /** Default floor: the session's shuffle-partition setting. */
  def ensureParallelism(df: DataFrame): DataFrame =
    ensureParallelism(df,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** Two-phase (salted) aggregation for skewed group keys: when a handful
    * of keys dominate (here: 3 returnflags over the whole fact table), a
    * plain groupBy sends each hot key's entire volume to one reducer.
    * Salting splits every key into `salt` deterministic sub-keys (hash of a
    * high-cardinality column — no randomness, so results are reproducible),
    * partially aggregates, then combines the partials. Exactly equivalent
    * for any decomposable aggregate (sum/count/min/max).
    */
  def saltedSumCount(df: DataFrame, groupCols: Seq[String], saltFrom: Column,
      salt: Int, sumCol: Column, sumName: String): DataFrame =
    df.withColumn("__salt", pmod(hash(saltFrom), lit(salt)))
      .groupBy((groupCols :+ "__salt").map(col): _*)
      .agg(sum(sumCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum("__psum").as(sumName), sum("__pcnt").as("n_rows"))

  /** Salted equi-JOIN for skewed probe keys: when a few join keys carry a
    * disproportionate share of the fact side, a plain shuffle join sends
    * each hot key's entire volume to one reducer task (AQE's skew-join
    * split mitigates this only within its thresholds, and not for
    * sort-merge buckets it can't subdivide). Salting spreads every fact
    * key over `salt` deterministic sub-keys (hashed from a fact-side
    * column — no randomness, reproducible) and replicates the BUILD side
    * once per sub-key, so each reducer sees ~1/salt of any hot key.
    * Exactly equivalent to the plain join for any 1:N equi-join where
    * `build` is unique on `key`. Cost: build side × salt (choose build =
    * the smaller input; if it were broadcast-small you'd broadcast
    * instead — salting is for the mid-size build that must shuffle). */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
      saltFrom: Column, salt: Int): DataFrame = {
    require(!(fact.columns ++ build.columns).contains("__salt"),
      "saltedJoin reserves the __salt column name")
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(saltFrom), lit(salt)))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom semi-join reduction — a DIY runtime filter for the join whose
    * build side is too big to broadcast but whose KEY SET still fits a
    * sketch: build a Bloom filter over the build side's keys (one small
    * driver job over the build side only), then drop fact rows MAP-SIDE
    * before the shuffle join via the codegen'd
    * [[graft.functions.BloomMightContain]] probe. No false negatives, so
    * the exact join downstream returns the identical result; false
    * positives only cost shuffle bytes (fpp trades sketch memory vs
    * reduction). At 100 TB this is the difference between shuffling the
    * whole fact table and shuffling only the ~selectivity fraction that
    * can actually match — the same technique Spark's InjectRuntimeFilter
    * applies, but available deliberately, at a chosen fpp/size, on any
    * integral key. `build` must be unique on `key` for 1:N semantics. */
  def bloomJoin(fact: DataFrame, build: DataFrame, key: String,
      expectedKeys: Long = -1L, fpp: Double = 0.01): DataFrame = {
    // A sketch sized below the build side's true key count silently blows
    // past its fpp and stops filtering — default to counting the build
    // side (it's the SMALL side by contract, so the extra job is cheap and
    // the sketch is sized right by construction). Callers that know the
    // cardinality can pass it to skip the count.
    val nKeys =
      if (expectedKeys > 0) expectedKeys else math.max(64L, build.count())
    val bloom = build.stat.bloomFilter(key, nKeys, fpp)
    fact.filter(graft.functions.BloomExprs.bloom_might_contain(
        org.apache.spark.sql.functions.col(key), bloom))
      .join(build, Seq(key))
  }

  /** Bucketed interval join — point-in-interval matching when the
    * interval side is too big to broadcast: Spark plans a bare range
    * predicate as a nested-loop join (O(points × intervals)). Bucketing
    * by a fixed width turns it into an EQUI join: each point lands in
    * exactly one bucket (floor(p / w)), each half-open interval [s, e)
    * replicates to the buckets it overlaps (one `sequence` + `explode`,
    * no driver loop), and the residual range filter runs after the hash
    * join. Every (point, interval) pair appears at most once — the point
    * has one bucket — so no dedup pass is needed. Cost model: interval
    * replication = ceil(length / w); pick `bucketWidth` near the typical
    * interval length so replication stays O(1). Empty/inverted intervals
    * are dropped (they can match nothing, and their descending bucket
    * sequence would be malformed). */
  def intervalJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!(points.columns ++ intervals.columns).contains("__bucket"),
      "intervalJoin reserves the __bucket column name")
    // Matching AsOf.asofJoin's explicit check: a shared column name would
    // surface later as an unhelpful ambiguous-reference AnalysisException
    // from the post-join range filter.
    val shared = points.columns.toSet intersect intervals.columns.toSet
    require(shared.isEmpty,
      s"intervalJoin needs disjoint column names; rename on one side " +
        s"first, both sides have: ${shared.mkString(", ")}")
    // EXACT floor division, not floor(x / w): the double division inside
    // floor() loses exactness past 2^53 and could assign a point and its
    // covering interval to different buckets. pmod's non-negative
    // remainder makes (c - pmod) the exact floor multiple of the width
    // (negatives included, equal-width buckets everywhere); the decimal
    // division of that multiple is exact at any long magnitude.
    def bucketOf(c: Column): Column =
      ((c - pmod(c, lit(bucketWidth))).cast("decimal(38,0)")
        / lit(bucketWidth)).cast("long")
    val pb = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val ib = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col(startCol)),
        bucketOf(col(endCol) - 1))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }

  /** Exact SQL NTILE semantics (first `total % n` buckets get the extra
    * row), computed without any single-partition stage. Order columns must
    * form a unique key for deterministic output. */
  def distributedNtile(df: DataFrame, n: Int, orderCols: Seq[Column],
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .persist()
    val counts = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val total = counts.sum
    val offsets = counts.scanLeft(0L)(_ + _)
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val q = total / n
    val r = total % n
    val schema = df.schema.add(outCol, IntegerType, nullable = false)
    val out = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var rank = bOffsets.value(i)
      it.map { row =>
        rank += 1
        val bucket =
          if (q == 0L) rank.toInt // fewer rows than buckets
          else if (rank <= r * (q + 1)) ((rank - 1) / (q + 1) + 1).toInt
          else (r + (rank - 1 - r * (q + 1)) / q + 1).toInt
        Row.fromSeq(row.toSeq :+ bucket)
      }
    }
    spark.createDataFrame(out, schema)
  }
}
