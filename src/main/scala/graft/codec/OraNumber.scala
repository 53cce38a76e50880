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
    if (b0 == 0xff || b0 == 0x00)
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

  /** Hot-path decodes used from generated code (static forwarders). */
  def decodeToLong(b: Array[Byte]): Long = decode(b).longValueExact()
  def decodeToInt(b: Array[Byte]): Int = decode(b).intValueExact()
  def decodeToDouble(b: Array[Byte]): Double = decode(b).doubleValue()
  def decodeToScaled(b: Array[Byte], scale: Int): JBigDecimal =
    decode(b).setScale(scale, RoundingMode.HALF_UP)

  def encodeLong(v: Long): Array[Byte] = encode(JBigDecimal.valueOf(v))
  def encodeDouble(v: Double): Array[Byte] = encode(new JBigDecimal(v.toString))
}
