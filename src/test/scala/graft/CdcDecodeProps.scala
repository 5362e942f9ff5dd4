package graft

import org.scalacheck.{Arbitrary, Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import com.fasterxml.jackson.databind.ObjectMapper
import graft.cdc._

/** Property tests for the decode layer — the reference's trickiest logic
  * (SURVEY.md §5: F1–F3 null-skipping, integral-float, type preservation).
  */
object CdcDecodeProps extends Properties("CdcDecode") {

  private val mapper = new ObjectMapper()

  private val fieldName: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map("f" + _.mkString).map(_.take(12))

  private val scalarValue: Gen[Any] = Gen.oneOf(
    Arbitrary.arbitrary[Long].map(x => x: Any),
    Arbitrary.arbitrary[Double].suchThat(d => !d.isNaN && !d.isInfinite).map(x => x: Any),
    Arbitrary.arbitrary[Boolean].map(x => x: Any),
    Gen.alphaNumStr.map(s => (s: Any)))

  private val flatMap: Gen[Map[String, Any]] =
    Gen.mapOf(Gen.zip(fieldName, scalarValue)).map(_.take(8))

  property("structured → JSON → keyFields round-trips scalar fields") =
    forAll(flatMap) { m =>
      val json = CdcDecode.payloadJson(StructuredData(m))
      val back = CdcDecode.keyFields(RawData(json))
      // integral doubles come back as longs (JSON has one number type and
      // the decoder is integral-preserving) — compare numerically
      m.forall { case (k, v) =>
        back.get(k).exists { got =>
          (v, got) match {
            case (a: Long, b: Long) => a == b
            case (a: Double, b: Long) => a == b.toDouble
            case (a: Double, b: Double) => a == b
            case (a: Boolean, b: Boolean) => a == b
            case (a: String, b: String) => a == b
            case _ => false
          }
        }
      }
    }

  property("keyFields drops null fields, never throws on them") =
    forAll(fieldName) { f =>
      CdcDecode.keyFields(RawData(s"""{"$f": null}""")).isEmpty
    }

  property("normalizeIntegralFloats: x.0 becomes integral at any depth") =
    forAll(Gen.choose(-1000000L, 1000000L), fieldName) { (n, f) =>
      val json = s"""{"$f": $n.0, "nested": {"inner": $n.0, "arr": [$n.0, 1.5]}}"""
      val out = CdcDecode.normalizeIntegralFloats(json)
      val tree = mapper.readTree(out)
      tree.get(f).isIntegralNumber &&
        tree.get("nested").get("inner").isIntegralNumber &&
        tree.get("nested").get("arr").get(0).isIntegralNumber &&
        !tree.get("nested").get("arr").get(1).isIntegralNumber
    }

  property("normalizeIntegralFloats preserves non-integral and string values") =
    forAll(Gen.choose(0.0001, 0.9999), Gen.alphaNumStr) { (d, s) =>
      val json = s"""{"a": $d, "b": "$s"}"""
      val tree = mapper.readTree(CdcDecode.normalizeIntegralFloats(json))
      tree.get("a").isFloatingPointNumber && tree.get("b").textValue == s
    }

  property("non-object key JSON is always rejected") =
    forAll(Gen.oneOf("[1,2]", "42", "\"str\"", "true", "not json at all")) { s =>
      Prop.throws(classOf[IllegalArgumentException]) {
        CdcDecode.keyFields(RawData(s))
      }
    }
}
