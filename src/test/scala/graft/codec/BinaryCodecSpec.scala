package graft.codec

import org.scalatest.funsuite.AnyFunSuite

class BinaryCodecSpec extends AnyFunSuite {

  test("BINARY_DOUBLE roundtrip incl. signed zero and infinities") {
    val cases = Seq(0.0, -0.0, 1.5, -1.5, math.Pi, -math.Pi,
      Double.MaxValue, Double.MinValue, Double.MinPositiveValue,
      Double.PositiveInfinity, Double.NegativeInfinity)
    cases.foreach { d =>
      val rt = OraBinaryFp.decodeDouble(OraBinaryFp.encodeDouble(d))
      assert(java.lang.Double.doubleToRawLongBits(rt) ===
        java.lang.Double.doubleToRawLongBits(d), s"for $d")
    }
    assert(OraBinaryFp.decodeDouble(OraBinaryFp.encodeDouble(Double.NaN)).isNaN)
  }

  test("BINARY_DOUBLE byte order sorts like the values (Oracle property)") {
    val sorted = Seq(-100.5, -1.0, -0.5, 0.0, 0.25, 3.0, 1e300)
    val encoded = sorted.map(OraBinaryFp.encodeDouble)
    val cmp = new java.util.Comparator[Array[Byte]] {
      def compare(a: Array[Byte], b: Array[Byte]): Int =
        java.util.Arrays.compareUnsigned(a, b)
    }
    assert(encoded.sorted(Ordering.comparatorToOrdering(cmp)) === encoded)
  }

  test("BINARY_FLOAT/DOUBLE randomized bit-pattern roundtrip") {
    val rnd = new scala.util.Random(42)
    (1 to 10000).foreach { _ =>
      val fBits = rnd.nextInt()
      val f = java.lang.Float.intBitsToFloat(fBits)
      assert(java.lang.Float.floatToRawIntBits(
        OraBinaryFp.decodeFloat(OraBinaryFp.encodeFloat(f))) === fBits)
      val dBits = rnd.nextLong()
      val d = java.lang.Double.longBitsToDouble(dBits)
      assert(java.lang.Double.doubleToRawLongBits(
        OraBinaryFp.decodeDouble(OraBinaryFp.encodeDouble(d))) === dBits)
    }
  }

  test("VECTOR roundtrips all four element formats") {
    val f = Array(1.5f, -2.25f, 0f)
    assert(OraVector.decode(OraVector.encodeFloats(f))
      .asInstanceOf[OraVector.Float32s].v.toSeq === f.toSeq)
    val d = Array(1.5, -2.25)
    assert(OraVector.decode(OraVector.encodeDoubles(d))
      .asInstanceOf[OraVector.Float64s].v.toSeq === d.toSeq)
    val i = Array[Byte](1, -2, 127)
    assert(OraVector.decode(OraVector.encodeInt8(i))
      .asInstanceOf[OraVector.Int8s].v.toSeq === i.toSeq)
    val b = Array(true, false, true)
    assert(OraVector.decode(OraVector.encodeBools(b))
      .asInstanceOf[OraVector.Bools].v.toSeq === b.toSeq)
    // magic byte guard
    intercept[IllegalArgumentException] {
      OraVector.decode(Array[Byte](0x00, 'F', 0, 0, 0, 0))
    }
    // float accessor rejects other formats
    intercept[IllegalArgumentException] {
      OraVector.decodeFloats(OraVector.encodeDoubles(d))
    }
  }

  test("LOB locator inline vs out-of-row") {
    val inl = LobLocator.encode(LobLocator.Inline("héllo".getBytes("UTF-8")))
    assert(LobLocator.isInline(inl))
    assert(new String(LobLocator.inlineData(inl), "UTF-8") === "héllo")
    assert(LobLocator.lobId(inl) === null)

    val oor = LobLocator.encode(LobLocator.OutOfRow(42L))
    assert(!LobLocator.isInline(oor))
    assert(LobLocator.inlineData(oor) === null)
    assert(LobLocator.lobId(oor) === 42L)
  }
}
