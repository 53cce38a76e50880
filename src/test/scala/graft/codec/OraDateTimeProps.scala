package graft.codec

import org.scalacheck.{Gen, Prop, Properties, Test}
import Prop.forAll

/** Property fuzzing for the 7/11-byte DATE/TIMESTAMP and 13-byte TSTZ
  * wire codecs (SURVEY §2.4 F3/F4) across the full year 1..9999 range.
  */
object OraDateTimeProps extends Properties("OraDateTime") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(1000)

  // epoch seconds for 0001-01-01T00:00:00Z .. 9999-12-31T23:59:59Z
  private val genMicros: Gen[Long] = for {
    sec <- Gen.choose(-62135596800L, 253402300799L)
    micro <- Gen.choose(0L, 999999L)
  } yield sec * 1000000L + micro

  private val genOffset: Gen[Int] = Gen.choose(-18 * 60, 18 * 60)

  property("DATE roundtrip truncates to the second") =
    forAll(genMicros) { m =>
      OraDateTime.decodeToMicros(OraDateTime.encodeDate(m)) ==
        Math.floorDiv(m, 1000000L) * 1000000L
    }

  property("TIMESTAMP roundtrip preserves micros") =
    forAll(genMicros) { m =>
      OraDateTime.decodeToMicros(OraDateTime.encodeTimestamp(m)) == m
    }

  property("TIMESTAMP's leading 7 bytes ARE the DATE encoding") =
    forAll(genMicros) { m =>
      OraDateTime.encodeTimestamp(m).take(7)
        .sameElements(OraDateTime.encodeDate(m))
    }

  property("TSTZ roundtrips (instant, zone offset) independently") =
    forAll(genMicros, genOffset) { (m, off) =>
      OraDateTime.decodeTsTz(OraDateTime.encodeTsTz(m, off)) == ((m, off))
    }

  property("TSTZ instant is zone-independent") =
    forAll(genMicros, genOffset, genOffset) { (m, o1, o2) =>
      OraDateTime.decodeTsTzMicros(OraDateTime.encodeTsTz(m, o1)) ==
        OraDateTime.decodeTsTzMicros(OraDateTime.encodeTsTz(m, o2))
    }

  property("years outside the DATE range fail instead of wrapping the century") =
    forAll(Gen.oneOf(20000, 12000, -8000, 99999)) { year =>
      // year 20000 used to encode century byte 300.toByte = 44 and
      // round-trip as year -5600 — silent corruption for a legal Spark
      // timestamp
      val micros = java.time.LocalDateTime.of(year, 6, 15, 12, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
      scala.util.Try(OraDateTime.encodeDate(micros)).isFailure
    }
}
