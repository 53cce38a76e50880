package graft.codec

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

/** Oracle NUMBER wire-format codec (pure Scala, zero Spark deps).
  *
  * Implements the publicly documented Oracle NUMBER representation
  * (exponent byte + base-100 excess mantissa; negative values are
  * complemented and 0x66-terminated). Semantics match the decode surface
  * the reference exposes through its decoder registry
  * (`runtime/data/GenericDecoders.java:114-1100`, SURVEY.md §2.4 F1) —
  * re-implemented from the public format description, not ported.
  *
  * Format summary (public knowledge, e.g. Oracle `DUMP()` docs):
  *  - 0            → single byte 0x80
  *  - positive x   → byte0 = 193 + e (x = m·100^e, 1 ≤ m < 100),
  *                   then base-100 mantissa digits each +1
  *  - negative x   → byte0 = 62 − e (bitwise complement of positive),
  *                   digits each as 101 − d, then terminator 102 when
  *                   fewer than 20 mantissa bytes
  *  - +∞ / −∞      → 0xFF,0x65 / 0x00,0x00 (rejected here)
  */
object OraNumber {

  val Zero: Array[Byte] = Array(0x80.toByte)

  /** Decode Oracle NUMBER bytes to BigDecimal. */
  def decode(b: Array[Byte]): JBigDecimal = {
    require(b != null && b.length > 0, "empty NUMBER")
    val b0 = b(0) & 0xff
    if (b.length == 1 && b0 == 0x80) return JBigDecimal.ZERO
    // only the EXACT patterns FF 65 / 00 00 are infinities; a leading
    // FF/00 byte otherwise is a legal exponent-62 magnitude (|x| ≥
    // 1e124, within NUMBER's documented ~9.99e125 range) — rejecting
    // the whole leading byte broke round-trip for those values
    if ((b.length == 2 && b0 == 0xff && (b(1) & 0xff) == 0x65) ||
        (b0 == 0x00 && (b.length == 1 || (b.length == 2 && b(1) == 0))))
      throw new IllegalArgumentException("infinite NUMBER unsupported")
    val positive = (b0 & 0x80) != 0
    val (exp, digits) =
      if (positive) {
        (b0 - 193, b.drop(1).map(x => (x & 0xff) - 1))
      } else {
        val ds = b.drop(1).takeWhile(x => (x & 0xff) != 102).map(x => 101 - (x & 0xff))
        ((~b0 & 0xff) - 193, ds)
      }
    // value = Σ digits(i) · 100^(exp − i); as unscaled/scale:
    var unscaled = BigInteger.ZERO
    val hundred = BigInteger.valueOf(100)
    digits.foreach { d =>
      require(d >= 0 && d <= 99, s"bad base-100 digit $d")
      unscaled = unscaled.multiply(hundred).add(BigInteger.valueOf(d))
    }
    val scale = 2 * (digits.length - 1 - exp)
    val v = new JBigDecimal(if (positive) unscaled else unscaled.negate(), scale)
    v.stripTrailingZeros()
  }

  /** Encode a BigDecimal as Oracle NUMBER bytes (lossless for ≤38 digits). */
  def encode(v0: JBigDecimal): Array[Byte] = {
    var v = v0.stripTrailingZeros()
    if (v.signum() == 0) return Zero
    val positive = v.signum() > 0
    if (!positive) v = v.negate()
    // normalise to even scale so decimal digits pair into base-100 digits
    var unscaled = v.unscaledValue()
    var scale = v.scale()
    if ((scale & 1) != 0) { unscaled = unscaled.multiply(BigInteger.TEN); scale += 1 }
    var s = unscaled.toString
    if ((s.length & 1) != 0) s = "0" + s
    var digits = s.grouped(2).map(_.toInt).toArray
    // strip leading/trailing zero base-100 digits, tracking the exponent
    var exp = digits.length - 1 - scale / 2
    val lead = digits.indexWhere(_ != 0)
    exp -= lead
    digits = digits.slice(lead, digits.lastIndexWhere(_ != 0) + 1)
    require(digits.length <= 20, s"NUMBER mantissa too long: $v0")
    require(exp >= -65 && exp <= 62, s"NUMBER exponent out of range: $v0")
    if (positive) {
      val out = new Array[Byte](1 + digits.length)
      out(0) = (193 + exp).toByte
      var i = 0
      while (i < digits.length) { out(i + 1) = (digits(i) + 1).toByte; i += 1 }
      out
    } else {
      val term = digits.length < 20
      val out = new Array[Byte](1 + digits.length + (if (term) 1 else 0))
      out(0) = (62 - exp).toByte
      var i = 0
      while (i < digits.length) { out(i + 1) = (101 - digits(i)).toByte; i += 1 }
      if (term) out(out.length - 1) = 102.toByte
      out
    }
  }

  /** Fast path: encode an unscaled-long decimal (precision ≤ 18 —
    * Spark's compact Decimal representation) with pure long arithmetic:
    * no BigDecimal/BigInteger, no toString. Falls back to the general
    * encoder for the rare shapes long math can't express.
    */
  def encodeUnscaled(unscaled0: Long, scale0: Int): Array[Byte] = {
    if (unscaled0 == 0) return Zero
    if (unscaled0 == Long.MinValue || scale0 < 0)
      return encode(JBigDecimal.valueOf(unscaled0, scale0))
    val positive = unscaled0 > 0
    var unscaled = Math.abs(unscaled0)
    var scale = scale0
    // canonical form (stripTrailingZeros equivalent)
    while (scale > 0 && unscaled % 10 == 0) { unscaled /= 10; scale -= 1 }
    if ((scale & 1) != 0) {
      if (unscaled > Long.MaxValue / 10)
        return encode(JBigDecimal.valueOf(unscaled0, scale0))
      unscaled *= 10; scale += 1
    }
    // base-100 digits, least significant first
    val tmp = new Array[Int](10)
    var n = 0
    var v = unscaled
    while (v != 0) { tmp(n) = (v % 100).toInt; v /= 100; n += 1 }
    var lo = 0
    while (tmp(lo) == 0) lo += 1 // strip trailing zero base-100 digits
    val m = n - lo
    val exp = (n - 1) - scale / 2
    // same wire bound the general encode() enforces: without it a large
    // scale (exp < -65) wraps the excess-193 byte below the sign bit and
    // the bytes DECODE as an unrelated negative number
    require(exp >= -65 && exp <= 62,
      s"NUMBER exponent out of range: ${unscaled0}E-$scale0")
    if (positive) {
      val out = new Array[Byte](1 + m)
      out(0) = (193 + exp).toByte
      var i = 0
      while (i < m) { out(i + 1) = (tmp(n - 1 - i) + 1).toByte; i += 1 }
      out
    } else {
      val out = new Array[Byte](2 + m) // m ≤ 10 < 20 ⇒ always terminated
      out(0) = (62 - exp).toByte
      var i = 0
      while (i < m) { out(i + 1) = (101 - tmp(n - 1 - i)).toByte; i += 1 }
      out(out.length - 1) = 102.toByte
      out
    }
  }

  /** Fast path: decode to the unscaled long of a decimal at `scale`.
    * Throws ArithmeticException when the value needs rounding, has more
    * than 9 base-100 digits, or overflows a long — callers fall back to
    * [[decodeToScaled]].
    */
  def decodeToUnscaledLong(b: Array[Byte], scale: Int): Long = {
    require(b != null && b.length > 0, "empty NUMBER")
    val b0 = b(0) & 0xff
    if (b.length == 1 && b0 == 0x80) return 0L
    if (b0 == 0xff || b0 == 0x00)
      throw new ArithmeticException("infinite NUMBER")
    val positive = (b0 & 0x80) != 0
    var acc = 0L
    var nd = 0
    var i = 1
    if (positive) {
      while (i < b.length) {
        val d = (b(i) & 0xff) - 1
        if (d < 0 || d > 99 || nd >= 9) throw new ArithmeticException("wide")
        acc = acc * 100 + d; nd += 1; i += 1
      }
    } else {
      while (i < b.length && (b(i) & 0xff) != 102) {
        val d = 101 - (b(i) & 0xff)
        if (d < 0 || d > 99 || nd >= 9) throw new ArithmeticException("wide")
        acc = acc * 100 + d; nd += 1; i += 1
      }
    }
    val exp = if (positive) b0 - 193 else (~b0 & 0xff) - 193
    val pow10 = 2 * (exp - (nd - 1)) + scale
    if (pow10 < -18 || pow10 > 18) throw new ArithmeticException("rescale")
    var r = acc
    if (pow10 >= 0) {
      var k = pow10
      while (k > 0) { r = Math.multiplyExact(r, 10L); k -= 1 }
    } else {
      // negative power: exact division or the value needs rounding
      var k = -pow10
      while (k > 0) {
        if (r % 10 != 0) throw new ArithmeticException("inexact")
        r /= 10; k -= 1
      }
    }
    if (positive) r else -r
  }

  /** Hot-path decodes used from generated code (static forwarders). */
  def decodeToLong(b: Array[Byte]): Long = decode(b).longValueExact()
  def decodeToInt(b: Array[Byte]): Int = decode(b).intValueExact()
  def decodeToDouble(b: Array[Byte]): Double = decode(b).doubleValue()
  def decodeToScaled(b: Array[Byte], scale: Int): JBigDecimal =
    decode(b).setScale(scale, RoundingMode.HALF_UP)

  def encodeLong(v: Long): Array[Byte] = encodeUnscaled(v, 0)
  def encodeDouble(v: Double): Array[Byte] = encode(new JBigDecimal(v.toString))
}
