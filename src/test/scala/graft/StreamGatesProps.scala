package graft

import org.apache.spark.api.java.Optional
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import graft.ops.StreamGates
import graft.ops.StreamGates.{Click, Crossing, SpendState}

/** Property tests for the st_stateful fold: the crossing a user emits must
  * not depend on HOW the stream was micro-batched — any contiguous split
  * of the event sequence (the staging guarantee: batches partition the
  * (us, event_id) order, ties never span a split) with arbitrary shuffling
  * INSIDE each batch yields the same single crossing as one big batch.
  * This is the determinism claim the DuckDB oracle relies on, checked
  * across thousands of random splits rather than the one split the staged
  * fixture happens to produce.
  */
object StreamGatesProps extends Properties("StreamGates") {

  /** Drive foldSpend over a sequence of micro-batches, carrying state the
    * way the state store does (via TestGroupState, Spark's official fake). */
  private def run(batches: Seq[Seq[Click]]): Seq[Crossing] = {
    var st: Option[SpendState] = None
    val out = Seq.newBuilder[Crossing]
    batches.foreach { b =>
      val gs = TestGroupState.create[SpendState](
        st.map(Optional.of[SpendState]).getOrElse(Optional.empty[SpendState]()),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long](), false)
      out ++= StreamGates.foldSpend(7L, b.iterator, gs)
      if (gs.exists) st = Some(gs.get)
    }
    out.result()
  }

  private case class Case(clicks: Seq[Click], splits: Seq[Seq[Click]])

  private val genCase: Gen[Case] = for {
    n <- Gen.choose(0, 60)
    cents <- Gen.listOfN(n, Gen.choose(0L, 4000L))
    // us advances by 0 or more — EQUAL timestamps happen (µs truncation),
    // distinguished only by event_id
    steps <- Gen.listOfN(n, Gen.oneOf(0L, 0L, 1L, 250L))
    cuts <- Gen.listOfN(n, Gen.choose(0, 3))
    shuffleSeeds <- Gen.listOfN(n + 1, Gen.choose(Long.MinValue, Long.MaxValue))
  } yield {
    val us = steps.scanLeft(1000L)(_ + _).tail
    val clicks = Seq.tabulate(n)(i => Click(7L, i.toLong, us(i), cents(i)))
    // cut only where us strictly increases — ties stay inside one batch,
    // exactly the range-partition staging guarantee
    val batches = Seq.newBuilder[Seq[Click]]
    var cur = Vector.newBuilder[Click]
    var curN = 0
    clicks.zipWithIndex.foreach { case (c, i) =>
      val tieWithNext = i + 1 < n && us(i + 1) == c.us
      cur += c; curN += 1
      if (!tieWithNext && cuts(i) == 0 && curN > 0) {
        batches += cur.result(); cur = Vector.newBuilder[Click]; curN = 0
      }
    }
    val tail = cur.result()
    if (tail.nonEmpty) batches += tail
    // shuffle inside each batch — the group iterator gives no order
    val shuffled = batches.result().zipWithIndex.map { case (b, i) =>
      new scala.util.Random(shuffleSeeds(i % shuffleSeeds.length)).shuffle(b)
    }
    Case(clicks, shuffled)
  }

  property("crossing is invariant under micro-batch splits and batch-internal order") =
    forAll(genCase) { c =>
      val one = run(Seq(scala.util.Random.shuffle(c.clicks)))
      val many = run(c.splits)
      one == many && many.length <= 1
    }

  property("the emitted crossing matches the prefix-sum definition") =
    forAll(genCase) { c =>
      val want = {
        var cum = 0L
        c.clicks.zipWithIndex.collectFirst {
          case (cl, i) if { cum += cl.cents; cum >= StreamGates.crossCents } =>
            Crossing(7L, i + 1L, cum, cl.us)
        }.toSeq
      }
      run(c.splits) == want
    }
}
