package graft.codec

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import org.scalacheck.{Gen, Prop, Properties, Test}
import Prop.forAll

/** Property fuzzing for the NUMBER codec (SURVEY §2.4 F1). The
  * reference's test corpus is hand-picked vectors
  * (`OraNumberTest.java:117`); a clean-room codec earns trust past its
  * vectors by surviving the generated precision/scale lattice,
  * including the ±1e±120 exponent extremes and the 38-digit mantissa
  * ceiling.
  */
object OraNumberProps extends Properties("OraNumber") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(1000)

  /** Nonzero decimals across the full legal lattice: 1..38 significant
    * digits, decimal exponent within ±120 (inside NUMBER's ±1e126/1e-130
    * representable band).
    */
  private val genNumber: Gen[JBigDecimal] = for {
    nd <- Gen.choose(1, 38)
    d0 <- Gen.choose(1, 9)
    rest <- Gen.listOfN(nd - 1, Gen.choose(0, 9))
    neg <- Gen.oneOf(true, false)
    scale <- Gen.choose(nd - 120, nd + 120)
  } yield new JBigDecimal(
    new BigInteger((if (neg) "-" else "") + (d0 :: rest).mkString), scale)

  private val genNumberOrZero: Gen[JBigDecimal] =
    Gen.frequency(19 -> genNumber, 1 -> Gen.const(JBigDecimal.ZERO))

  property("decode∘encode is identity (numeric equality)") =
    forAll(genNumberOrZero) { v =>
      OraNumber.decode(OraNumber.encode(v)).compareTo(v) == 0
    }

  property("encode is canonical: trailing zeros never change the bytes") =
    forAll(genNumber, Gen.choose(1, 4)) { (v, extra) =>
      // same numeric value at a larger scale (e.g. 1.5 vs 1.5000)
      val padded = v.setScale(v.scale + extra)
      OraNumber.encode(padded).sameElements(OraNumber.encode(v))
    }

  property("unscaled-long fast path matches the general encoder") =
    forAll(Gen.choose(Long.MinValue + 1, Long.MaxValue), Gen.choose(0, 18)) {
      (u, s) =>
        OraNumber.encodeUnscaled(u, s).sameElements(
          OraNumber.encode(new JBigDecimal(BigInteger.valueOf(u), s)))
    }

  property("decodeToUnscaledLong honors its contract (exact or documented throw)") =
    forAll(Gen.choose(-999999999999999999L, 999999999999999999L),
      Gen.choose(0, 18)) { (u, s) =>
      // the fast path is PARTIAL by contract: >9 base-100 digits or a
      // needed rescale throws ArithmeticException and callers fall back
      // to decodeToScaled — the property checks both arms agree on u
      val bytes = OraNumber.encodeUnscaled(u, s)
      try OraNumber.decodeToUnscaledLong(bytes, s) == u
      catch {
        case _: ArithmeticException =>
          OraNumber.decodeToScaled(bytes, s)
            .compareTo(new JBigDecimal(BigInteger.valueOf(u), s)) == 0
      }
    }

  property("encodeLong/decodeToLong roundtrip the full Long range") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { v =>
      OraNumber.decodeToLong(OraNumber.encodeLong(v)) == v
    }

  property("byte order = numeric order (unsigned lexicographic)") =
    forAll(genNumberOrZero, genNumberOrZero) { (a, b) =>
      // the wire format's defining index property: Oracle can range-scan
      // NUMBER keys bytewise. Terminator 102 on short negatives and the
      // sign/exponent byte layout make memcmp order = numeric order.
      val cmp = java.util.Arrays.compareUnsigned(
        OraNumber.encode(a), OraNumber.encode(b))
      Integer.signum(cmp) == Integer.signum(a.compareTo(b))
    }

  property("encodeUnscaled enforces the same exponent bound as encode") =
    org.scalacheck.Prop.forAll(
      org.scalacheck.Gen.choose(1L, 1000000L),
      org.scalacheck.Gen.choose(140, 400)) { (u, scale) =>
      // exp < -65: the general encode throws; the fast path used to wrap
      // the excess-193 byte below the sign bit and DECODE as a negative
      val fast = scala.util.Try(OraNumber.encodeUnscaled(u, scale))
      val gen = scala.util.Try(
        OraNumber.encode(java.math.BigDecimal.valueOf(u, scale)))
      fast.isFailure == gen.isFailure
    }
}
