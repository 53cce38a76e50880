package graft.codec

import org.scalacheck.{Gen, Prop, Properties, Test}
import Prop.forAll

/** Property fuzzing for INTERVALYM/DS wire codecs (SURVEY §2.4 F5). */
object OraIntervalProps extends Properties("OraInterval") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(1000)

  property("YM roundtrips any Int month total") =
    forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue)) { m =>
      OraInterval.decodeYMToMonths(OraInterval.encodeYM(m)) == m
    }

  // day component must fit the signed be32 field: ±2^31 days ≈ ±1.85e17 µs
  private val genDs: Gen[Long] = Gen.choose(-150000000000000000L, 150000000000000000L)

  property("DS roundtrips micros across mixed-sign components") =
    forAll(genDs) { m =>
      OraInterval.decodeDSToMicros(OraInterval.encodeDS(m)) == m
    }

  private val YmRe = """(-?)P(\d+)Y(\d+)M""".r
  property("ymToString parses back to the same total") =
    forAll(Gen.chooseNum(Int.MinValue + 11, Int.MaxValue)) { m =>
      OraInterval.ymToString(m) match {
        case YmRe(sign, y, mo) =>
          val v = y.toLong * 12 + mo.toLong
          (if (sign == "-") -v else v) == m.toLong
        case _ => false
      }
    }

  private val DsRe = """(-?)P(\d+)DT(\d+)H(\d+)M(\d+)\.(\d{6})S""".r
  property("dsToString parses back to the same micros") =
    forAll(genDs) { m =>
      OraInterval.dsToString(m) match {
        case DsRe(sign, d, h, mi, s, us) =>
          val v = (((d.toLong * 24 + h.toLong) * 60 + mi.toLong) * 60 +
            s.toLong) * 1000000L + us.toLong
          (if (sign == "-") -v else v) == m
        case _ => false
      }
    }
}
