package graft.tables

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for [[TableStore.maxPointBytes]]'s sorted endpoint
  * sweep: on closed intervals the max running weight (starts before
  * ends at equal coordinates) must equal the brute-force max stabbing
  * weight over interval starts — the O(n²) form the sweep replaced so a
  * thousands-of-slices sidecar pile cannot stall the driver. */
object StabbingProps extends Properties("MaxPointBytes") {

  private val interval: Gen[(Long, Long, Long)] = for {
    a <- Gen.choose(0L, 40L)
    w <- Gen.choose(0L, 15L)
    len <- Gen.choose(1L, 1000L)
  } yield (a, a + w, len)

  private val pile: Gen[List[(Long, Long, Long)]] =
    Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, interval))

  /** The replaced O(n²) definition: max over interval starts of the
    * total length of intervals containing that start. */
  private def brute(iv: List[(Long, Long, Long)]): Long =
    iv.map { case (p, _, _) =>
      iv.collect { case (mn, mx, len) if mn <= p && p <= mx => len }.sum
    }.max

  private def viaSweep(iv: List[(Long, Long, Long)]): Option[Long] = {
    val files = iv.zipWithIndex.map { case ((_, _, len), i) =>
      (s"d/f$i.parquet", len)
    }
    val ranges = iv.zipWithIndex.map { case ((mn, mx, _), i) =>
      s"f$i.parquet" -> Map("k" -> ((mn: Any, mx: Any)))
    }.toMap
    TableStore.maxPointBytes(files, ranges, "k")
  }

  property("sweep equals brute-force stabbing weight") = forAll(pile) {
    iv => viaSweep(iv).contains(brute(iv))
  }

  // tight clusters force many equal coordinates — the start-before-end
  // tie rule is what keeps closed-interval touching counted
  private val tight: Gen[List[(Long, Long, Long)]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, for {
      a <- Gen.choose(0L, 5L)
      w <- Gen.choose(0L, 3L)
      len <- Gen.choose(1L, 9L)
    } yield (a, a + w, len)))

  property("equal-coordinate ties resolve as closed intervals") =
    forAll(tight) { iv => viaSweep(iv).contains(brute(iv)) }
}
