package graft.tables

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pure unit coverage of the pruning math behind [[ZoneMapFileIndex]]
  * and TableStore's key-batch pruning — no SparkSession needed. Soundness
  * property throughout: bounds may be WIDER than the filter (lost pruning)
  * but never narrower (lost rows). */
class ZoneStatsSpec extends AnyFunSuite {

  private val id = AttributeReference("id", LongType)()
  private val s  = AttributeReference("s", StringType)()

  private def lit(v: Long) = Literal(v, LongType)
  private def slit(v: String) = Literal(UTF8String.fromString(v), StringType)

  private def bounds(e: Expression*) = ZoneStats.filterBounds(e)

  test("conjuncts of comparisons produce per-column intervals") {
    val bs = bounds(And(GreaterThanOrEqual(id, lit(10)), LessThan(id, lit(20))))
    assert(bs.toSet === Set(
      ("id", Some(10L), None), ("id", None, Some(20L))))
  }

  test("flipped literal-first comparisons normalize to the same intervals") {
    // 5 <= id is a LOWER bound on id; 30 > id is an UPPER bound
    val bs = bounds(LessThanOrEqual(lit(5), id), GreaterThan(lit(30), id))
    assert(bs.toSet === Set(
      ("id", Some(5L), None), ("id", None, Some(30L))))
  }

  test("equality and null-safe equality pin a point") {
    assert(bounds(EqualTo(id, lit(7))) === Seq(("id", Some(7L), Some(7L))))
    assert(bounds(EqualNullSafe(id, lit(7))) === Seq(("id", Some(7L), Some(7L))))
    // <=> null matches only null rows — no interval (stats exclude nulls)
    assert(bounds(EqualNullSafe(id, Literal(null, LongType))).isEmpty)
  }

  test("IN and InSet prune by the value-list envelope") {
    assert(bounds(In(id, Seq(lit(5), lit(42), lit(17)))) ===
      Seq(("id", Some(5L), Some(42L))))
    assert(bounds(InSet(id, Set[Any](9L, 3L, 6L))) ===
      Seq(("id", Some(3L), Some(9L))))
    // mixed / non-literal members fail open
    assert(bounds(In(id, Seq(lit(5), id))).isEmpty)
    assert(bounds(In(id, Seq(lit(5), Literal(null, LongType)))).isEmpty)
  }

  test("startsWith becomes a [prefix, nextPrefix) interval") {
    val bs = bounds(StartsWith(s, slit("abc")))
    assert(bs === Seq(("s", Some("abc"), Some("abd"))))
    val (lo, hi) = (Some("abc"), Some("abd"))
    // every abc-prefixed string is inside; neighbors are out
    for (v <- Seq("abc", "abc￿￿", "abcZZZ"))
      assert(ZoneStats.overlap(v, v, lo, hi))
    assert(!ZoneStats.overlap("abb￿", "abb￿", lo, hi))
    assert(!ZoneStats.overlap("abe", "abe", lo, hi))
  }

  test("startsWith prefix ending at the max code point keeps only the lower bound") {
    val max = new String(Character.toChars(Character.MAX_CODE_POINT))
    assert(bounds(StartsWith(s, slit("a" + max))) ===
      Seq(("s", Some("a" + max), Some("b"))))
    assert(bounds(StartsWith(s, slit(max))) ===
      Seq(("s", Some(max), None)))
  }

  test("OR, functions, and casts contribute nothing (fail open)") {
    assert(bounds(Or(EqualTo(id, lit(1)), EqualTo(id, lit(9)))).isEmpty)
    assert(bounds(EqualTo(Abs(id), lit(1))).isEmpty)
    assert(bounds(EqualTo(Cast(id, IntegerType), Literal(1, IntegerType))).isEmpty)
  }

  test("string comparison is code-point order, not UTF-16 unit order") {
    val bmp = "�"          // U+FFFD: above surrogate range in UTF-16
    val supp = "😀"   // U+1F600: encoded with surrogates
    // Java natural order ranks supp BELOW bmp (surrogate units < U+FFFD);
    // code-point order must rank it ABOVE
    assert(bmp.compareTo(supp) > 0)
    assert(ZoneStats.cmp(bmp, supp).exists(_ < 0))
    // consequence: a file holding supp-range strings is NOT pruned for a
    // [bmp, +inf) interval the way UTF-16 order would wrongly allow
    assert(ZoneStats.overlap(supp, supp, Some(bmp), None))
  }

  test("overlap keeps files on any non-comparable pair and NaN") {
    assert(ZoneStats.overlap("x", "y", Some(5L), Some(9L)))   // str vs long
    assert(ZoneStats.overlap(Double.NaN, Double.NaN, Some(1.0), Some(2.0)))
    // half-open intervals
    assert(ZoneStats.overlap(5L, 10L, Some(7L), None))
    assert(!ZoneStats.overlap(5L, 10L, Some(11L), None))
    assert(ZoneStats.overlap(5L, 10L, None, Some(5L)))
    assert(!ZoneStats.overlap(5L, 10L, None, Some(4L)))
  }

  test("numeric widths cross-compare through double promotion") {
    assert(ZoneStats.cmp(3, 4L).exists(_ < 0))
    assert(ZoneStats.cmp(2.5, 2L).exists(_ > 0))
    assert(ZoneStats.litVal(3.toByte) === Some(3L))
    assert(ZoneStats.litVal(1.5f) === Some(1.5))
    assert(ZoneStats.litVal(Decimal(1)) === None) // out of the stat domain
  }
}
