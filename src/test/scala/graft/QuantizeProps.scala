package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the quantized-embedding determinism lemma the
  * similarity oracles rest on (SURVEY.md §9 round 3): components map to
  * whole-valued doubles `round(x*1e6)`, so every 64-dim dot product and
  * squared norm is an EXACT integer below 2^53 — which makes cosine a
  * chain of correctly-rounded IEEE ops, independent of accumulation
  * order and engine. These properties check the lemma itself on the
  * JVM side (the cross-engine half is the DuckDB oracle gate).
  */
object QuantizeProps extends Properties("Quantize") {

  // embedding components in the data's realistic range (unit-ish vectors)
  private val component: Gen[Float] = Gen.choose(-1.0f, 1.0f)
  private val vec: Gen[Array[Float]] = Gen.containerOfN[Array, Float](64, component)

  private def q(v: Array[Float]): Array[Double] =
    v.map(x => BigDecimal(x.toDouble * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble)

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  property("quantized components are whole-valued and bounded") =
    forAll(vec) { v =>
      q(v).forall(x => x == math.rint(x) && math.abs(x) <= 2e6)
    }

  property("quantized dots are exact integers below 2^53, any order") =
    forAll(vec, vec) { (a, b) =>
      val (qa, qb) = (q(a), q(b))
      val d1 = dot(qa, qb)
      // reversed accumulation order gives the SAME double — exactness
      val d2 = qa.zip(qb).map { case (x, y) => x * y }.reverse.sum
      d1 == d2 && d1 == math.rint(d1) && math.abs(d1) < math.pow(2, 53)
    }

  property("quantized cosine is order-independent and in [-1, 1]") =
    forAll(vec, vec) { (a, b) =>
      val (qa, qb) = (q(a), q(b))
      val na = dot(qa, qa); val nb = dot(qb, qb)
      (na == 0 || nb == 0) || {
        val c = dot(qa, qb) / (math.sqrt(na) * math.sqrt(nb))
        val cRev = qa.zip(qb).map { case (x, y) => x * y }.reverse.sum /
          (math.sqrt(na) * math.sqrt(nb))
        c == cRev && c >= -1.0000000001 && c <= 1.0000000001
      }
    }
}
