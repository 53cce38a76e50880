package graft.codec

import java.math.{BigDecimal => JBD}
import org.scalatest.funsuite.AnyFunSuite

/** Codec unit tests. The known-value fixtures are the publicly documented
  * Oracle DUMP() encodings (same provenance as the reference's
  * OraNumberTest/OraDumpDecoderTest corpus — SURVEY.md §5.3).
  */
class CodecSpec extends AnyFunSuite {

  /** deterministic property loop (seeded) — scalacheck-style coverage
    * without extra deps */
  private def forSeeded(n: Int)(f: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach(_ => f(rnd))
  }

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ---- NUMBER known encodings (public DUMP() examples) ----
  test("NUMBER zero is 0x80") {
    assert(OraNumber.encode(JBD.ZERO).toSeq == Seq(0x80.toByte))
    assert(OraNumber.decode(Array(0x80.toByte)).compareTo(JBD.ZERO) == 0)
  }
  test("NUMBER 1 = C1 02") {
    assert(OraNumber.encode(JBD.ONE).toSeq == hex("c102").toSeq)
    assert(OraNumber.decode(hex("c102")).compareTo(JBD.ONE) == 0)
  }
  test("NUMBER 100 = C2 02") {
    assert(OraNumber.encode(new JBD(100)).toSeq == hex("c202").toSeq)
  }
  test("NUMBER 123 = C2 02 18") {
    assert(OraNumber.encode(new JBD(123)).toSeq == hex("c20218").toSeq)
    assert(OraNumber.decodeToLong(hex("c20218")) == 123L)
  }
  test("NUMBER 0.5 = C0 33") {
    assert(OraNumber.encode(new JBD("0.5")).toSeq == hex("c033").toSeq)
  }
  test("NUMBER -1 = 3E 64 66") {
    assert(OraNumber.encode(new JBD(-1)).toSeq == hex("3e6466").toSeq)
    assert(OraNumber.decodeToLong(hex("3e6466")) == -1L)
  }
  test("NUMBER -123 = 3D 64 4E 66") {
    // -123: exp=1 → b0=62-1=0x3D, digits 1,23 → 100,78=0x64,0x4E
    assert(OraNumber.encode(new JBD(-123)).toSeq == hex("3d644e66").toSeq)
    assert(OraNumber.decodeToLong(hex("3d644e66")) == -123L)
  }

  test("NUMBER exponent-62 magnitudes round-trip; only exact patterns are infinite") {
    // |x| >= 1e124 encodes with leading byte FF (positive) / 00
    // (negative) — legal NUMBER magnitudes, NOT infinities
    Seq("1e124", "-1e124", "9.9e125", "-9.9e125").foreach { s =>
      val v = new JBD(s)
      assert(OraNumber.decode(OraNumber.encode(v)).compareTo(v) == 0, s)
    }
    intercept[IllegalArgumentException] {
      OraNumber.decode(Array(0xff.toByte, 0x65.toByte)) // +infinity
    }
    intercept[IllegalArgumentException] {
      OraNumber.decode(Array(0x00.toByte, 0x00.toByte)) // -infinity
    }
  }

  test("corrupt LOB locators fail with a diagnosis, not raw JDK errors") {
    val huge = Array[Byte](1, 0x7f, -1, -1, -1) // inline, length Int.MaxValue
    assert(intercept[IllegalArgumentException] {
      LobLocator.decode(huge)
    }.getMessage.contains("corrupt inline LOB length"))
    intercept[IllegalArgumentException] { LobLocator.decode(Array[Byte](1)) }
    intercept[IllegalArgumentException] { LobLocator.decode(Array[Byte](0, 1)) }
  }

  test("NUMBER roundtrip property (long)") {
    forSeeded(500) { rnd =>
      val v = rnd.nextLong()
      assert(OraNumber.decodeToLong(OraNumber.encodeLong(v)) == v)
    }
  }
  test("NUMBER roundtrip property (scaled decimal)") {
    forSeeded(500) { rnd =>
      val unscaled = rnd.nextLong() % 1000000000000L
      val scale = rnd.nextInt(7)
      val v = new JBD(java.math.BigInteger.valueOf(unscaled), scale)
      assert(OraNumber.decode(OraNumber.encode(v)).compareTo(v) == 0)
    }
  }
  test("NUMBER fast unscaled-long encode matches the BigDecimal encoder") {
    forSeeded(2000) { rnd =>
      val unscaled = rnd.nextLong() % 1000000000000000000L // ≤ 18 digits
      val scale = rnd.nextInt(10)
      val viaBig = OraNumber.encode(
        new JBD(java.math.BigInteger.valueOf(unscaled), scale))
      val viaLong = OraNumber.encodeUnscaled(unscaled, scale)
      assert(viaLong.toSeq == viaBig.toSeq,
        s"unscaled=$unscaled scale=$scale")
    }
    // fallback shapes: odd scale at the top of the long range, MinValue
    assert(OraNumber.encodeUnscaled(Long.MaxValue, 3).toSeq ==
      OraNumber.encode(JBD.valueOf(Long.MaxValue, 3)).toSeq)
    assert(OraNumber.encodeUnscaled(Long.MinValue, 2).toSeq ==
      OraNumber.encode(JBD.valueOf(Long.MinValue, 2)).toSeq)
  }

  test("NUMBER fast unscaled-long decode matches decodeToScaled") {
    forSeeded(2000) { rnd =>
      val unscaled = rnd.nextLong() % 100000000000000L
      val scale = rnd.nextInt(6)
      val bytes = OraNumber.encodeUnscaled(unscaled, scale)
      val viaBig = OraNumber.decodeToScaled(bytes, scale).unscaledValue()
      val viaLong = OraNumber.decodeToUnscaledLong(bytes, scale)
      assert(java.math.BigInteger.valueOf(viaLong) == viaBig,
        s"unscaled=$unscaled scale=$scale")
    }
    // needs-rounding and too-wide shapes must throw (callers fall back)
    intercept[ArithmeticException] {
      OraNumber.decodeToUnscaledLong(OraNumber.encode(new JBD("0.001")), 2)
    }
    intercept[ArithmeticException] {
      OraNumber.decodeToUnscaledLong(
        OraNumber.encode(new JBD("12345678901234567890123456")), 0)
    }
  }

  test("NUMBER decode is order-preserving on sign") {
    assert(OraNumber.decodeToDouble(OraNumber.encodeDouble(-0.25)) == -0.25)
    assert(OraNumber.decodeToDouble(OraNumber.encodeDouble(1e-30)) == 1e-30)
    assert(OraNumber.decodeToDouble(OraNumber.encodeDouble(9.9e30)) == 9.9e30)
  }

  // ---- DATE / TIMESTAMP ----
  test("DATE 2014-07-01 12:34:56 encodes with excess-100 bytes") {
    val micros = java.time.LocalDateTime.of(2014, 7, 1, 12, 34, 56)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val b = OraDateTime.encodeDate(micros)
    assert(b.toSeq == Seq(120, 114, 7, 1, 13, 35, 57).map(_.toByte))
    assert(OraDateTime.decodeToMicros(b) == micros)
  }
  test("TIMESTAMP roundtrip with micros") {
    forSeeded(500) { rnd =>
      val us = 946684800000000L + (rnd.nextLong() % 1000000000000000L).abs
      assert(OraDateTime.decodeToMicros(OraDateTime.encodeTimestamp(us)) == us)
    }
  }

  // ---- ROWID ----
  test("ROWID AAASdBAAMAAAADbAAA decodes and re-encodes") {
    // fixture ROWID from the reference's public test surface (Op11_5_Test)
    val s = "AAASdBAAMAAAADbAAA"
    val r = OraRowId.decode(s)
    assert(OraRowId.encode(r.dataObj, r.fileNo, r.blockNo, r.rowNo) == s)
    assert(r.rowNo == 0)
    assert(r.dataObj == (('S' - 'A') * 64 + ('d' - 'a' + 26)) * 64 + ('B' - 'A'))
  }
  test("ROWID roundtrip property") {
    forSeeded(500) { rnd =>
      val obj = rnd.nextLong() & 0xffffffffL
      val fno = rnd.nextInt(1024)
      val blk = rnd.nextLong() & 0x3fffffffL
      val row = rnd.nextInt(65536)
      val r = OraRowId.decode(OraRowId.encode(obj, fno, blk, row))
      assert((r.dataObj, r.fileNo, r.blockNo, r.rowNo) == ((obj, fno, blk, row)))
    }
  }

  // ---- INTERVALS ----
  test("INTERVALYM roundtrip") {
    forSeeded(500) { rnd =>
      val months = rnd.nextInt(24001) - 12000
      assert(OraInterval.decodeYMToMonths(OraInterval.encodeYM(months)) == months)
    }
  }
  test("INTERVALDS roundtrip") {
    forSeeded(500) { rnd =>
      val us = rnd.nextLong() % (86400000000L * 3650)
      assert(OraInterval.decodeDSToMicros(OraInterval.encodeDS(us)) == us)
    }
  }
  test("interval strings") {
    assert(OraInterval.ymToString(27) == "P2Y3M")
    assert(OraInterval.dsToString(93784000005L) == "P1DT2H3M4.000005S")
  }

  // ---- charsets ----
  test("charset decode fixtures") {
    assert(OraCharset.decode(hex("7468616e6b73"), "US7ASCII") == "thanks")
    assert(OraCharset.decode(hex("e8ac9de8ac9de595a6"), "AL32UTF8") == "謝謝啦")
  }
}
