package graft.codec

import org.scalacheck.{Gen, Prop, Properties, Test}
import Prop.forAll

/** Property fuzzing for the remaining fixed-layout wire codecs: ROWID
  * (F7), BINARY_FLOAT/DOUBLE (F2), VECTOR (F10), LOB locator (F12) and
  * charset decode (F6).
  */
object WireCodecProps extends Properties("WireCodecs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(1000)

  // ---- ROWID: 6/3/6/3 base-64 fields, documented value ranges ----
  private val genRowIdParts = for {
    dataObj <- Gen.choose(0L, 0xffffffffL)    // 32-bit data object id
    fileNo <- Gen.choose(0, 0x3ffff)          // 18-bit relative file
    blockNo <- Gen.choose(0L, 0xfffffffffL)   // 36-bit block
    rowNo <- Gen.choose(0, 0x3ffff)           // 18-bit row
  } yield (dataObj, fileNo, blockNo, rowNo)

  property("ROWID roundtrips every documented field range") =
    forAll(genRowIdParts) { case (o, f, b, r) =>
      val s = OraRowId.encode(o, f, b, r)
      s.length == 18 &&
        OraRowId.decode(s) == OraRowId.RowId(o, f, b, r)
    }

  // NOTE: the 18-char display form does NOT sort lexicographically in
  // field order — the base-64 alphabet (A-Za-z0-9+/) is not in char-code
  // order, exactly like Oracle's real ROWID display form. (A property
  // asserting display-order = value-order was tried and correctly
  // falsified by the fuzzer.)
  property("ROWID encode emits only the documented alphabet, injectively") =
    forAll(genRowIdParts, genRowIdParts) { case (p1 @ (o1, f1, b1, r1), p2 @ (o2, f2, b2, r2)) =>
      val s1 = OraRowId.encode(o1, f1, b1, r1)
      val s2 = OraRowId.encode(o2, f2, b2, r2)
      s1.forall(c =>
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '+' || c == '/') &&
        ((s1 == s2) == (p1 == p2))
    }

  property("ROWID decode rejects non-alphabet chars and wrong lengths") =
    forAll(genRowIdParts, Gen.choose(0, 17)) { case ((o, f, b, r), pos) =>
      val s = OraRowId.encode(o, f, b, r)
      val bad = s.updated(pos, '!')
      val short = s.substring(0, 17)
      def fails(x: String) =
        try { OraRowId.decode(x); false }
        catch { case _: IllegalArgumentException => true }
      fails(bad) && fails(short)
    }

  // ---- BINARY_FLOAT / BINARY_DOUBLE ----
  private val genFloat: Gen[Float] = Gen.frequency(
    8 -> Gen.chooseNum(Float.MinValue, Float.MaxValue),
    1 -> Gen.oneOf(0.0f, -0.0f, Float.NaN, Float.PositiveInfinity,
      Float.NegativeInfinity, Float.MinPositiveValue))
  private val genDouble: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(Double.MinValue, Double.MaxValue),
    1 -> Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue))

  property("BINARY_FLOAT roundtrips bit-exactly incl. NaN/±0/±Inf") =
    forAll(genFloat) { v =>
      java.lang.Float.floatToRawIntBits(
        OraBinaryFp.decodeFloat(OraBinaryFp.encodeFloat(v))) ==
        java.lang.Float.floatToRawIntBits(v)
    }

  property("BINARY_DOUBLE roundtrips bit-exactly incl. NaN/±0/±Inf") =
    forAll(genDouble) { v =>
      java.lang.Double.doubleToRawLongBits(
        OraBinaryFp.decodeDouble(OraBinaryFp.encodeDouble(v))) ==
        java.lang.Double.doubleToRawLongBits(v)
    }

  // ---- VECTOR: four element formats ----
  property("VECTOR float32 roundtrips bit-exactly") =
    forAll(Gen.listOf(genFloat)) { v =>
      val a = v.toArray
      OraVector.decode(OraVector.encodeFloats(a)) match {
        case OraVector.Float32s(got) =>
          got.length == a.length && got.indices.forall(i =>
            java.lang.Float.floatToRawIntBits(got(i)) ==
              java.lang.Float.floatToRawIntBits(a(i)))
        case _ => false
      }
    }

  property("VECTOR float64/int8/bool roundtrip") =
    forAll(Gen.listOf(genDouble), Gen.listOf(Gen.chooseNum(-128, 127)),
      Gen.listOf(Gen.oneOf(true, false))) { (d, i, b) =>
      val dOk = OraVector.decode(OraVector.encodeDoubles(d.toArray)) match {
        case OraVector.Float64s(got) =>
          got.length == d.length && got.indices.forall(k =>
            java.lang.Double.doubleToRawLongBits(got(k)) ==
              java.lang.Double.doubleToRawLongBits(d(k)))
        case _ => false
      }
      val iOk = OraVector.decode(OraVector.encodeInt8(i.map(_.toByte).toArray)) match {
        case OraVector.Int8s(got) => got.toSeq == i.map(_.toByte)
        case _ => false
      }
      val bOk = OraVector.decode(OraVector.encodeBools(b.toArray)) match {
        case OraVector.Bools(got) => got.toSeq == b
        case _ => false
      }
      dOk && iOk && bOk
    }

  // ---- LOB locator ----
  private val genLocator: Gen[LobLocator.Locator] = Gen.oneOf(
    Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
      .map(bs => LobLocator.Inline(bs.toArray): LobLocator.Locator),
    Gen.chooseNum(Long.MinValue, Long.MaxValue)
      .map(id => LobLocator.OutOfRow(id): LobLocator.Locator))

  property("LOB locator roundtrips, isInline/lobId agree with decode") =
    forAll(genLocator) { l =>
      val bytes = LobLocator.encode(l)
      val rt = LobLocator.decode(bytes) == l
      val flags = l match {
        case LobLocator.Inline(_) => LobLocator.isInline(bytes)
        case LobLocator.OutOfRow(id) =>
          !LobLocator.isInline(bytes) && LobLocator.lobId(bytes) == id
      }
      rt && flags
    }

  property("truncated LOB locators fail with a codec diagnosis, never allocate") =
    forAll(genLocator, Gen.choose(0, 8)) { (l, keep) =>
      val bytes = LobLocator.encode(l)
      val cut = bytes.take(math.min(keep, bytes.length - 1))
      try { LobLocator.decode(cut); cut.isEmpty && false }
      catch { case e: IllegalArgumentException => true }
    }

  // ---- charset decode ----
  private val genText: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'Z', '0', ' ', 'é', 'ß', '中', '€'))
      .map(_.mkString)

  property("AL32UTF8/AL16UTF16 encode∘decode is identity on unicode text") =
    forAll(genText) { s =>
      OraCharset.decode(OraCharset.encode(s, "AL32UTF8"), "AL32UTF8") == s &&
        OraCharset.decode(OraCharset.encode(s, "AL16UTF16"), "AL16UTF16") == s
    }

  property("US7ASCII/ISO8859P1 roundtrip their own repertoires") =
    forAll(Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)) { s =>
      OraCharset.decode(OraCharset.encode(s, "US7ASCII"), "US7ASCII") == s &&
        OraCharset.decode(OraCharset.encode(s, "WE8ISO8859P1"), "WE8ISO8859P1") == s
    }
}
