package graft.codec

/** BINARY_FLOAT / BINARY_DOUBLE wire codec (SURVEY.md §2.4 F2).
  *
  * Oracle stores IEEE-754 values big-endian with an order-preserving
  * transform so byte comparison sorts correctly (ref decode
  * `GenericDecoders.java:279-345` via oracle.sql.BINARY_FLOAT/DOUBLE):
  * non-negative values have the sign bit flipped; negative values have
  * ALL bits flipped.
  */
object OraBinaryFp {

  def encodeFloat(v: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToRawIntBits(v)
    val t = if (bits >= 0) bits ^ 0x80000000 else ~bits
    Array(((t >>> 24) & 0xff).toByte, ((t >>> 16) & 0xff).toByte,
      ((t >>> 8) & 0xff).toByte, (t & 0xff).toByte)
  }

  def decodeFloat(b: Array[Byte]): Float = {
    require(b.length == 4, s"BINARY_FLOAT needs 4 bytes, got ${b.length}")
    val t = ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
      ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    val bits = if ((t & 0x80000000) != 0) t ^ 0x80000000 else ~t
    java.lang.Float.intBitsToFloat(bits)
  }

  def encodeDouble(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToRawLongBits(v)
    val t = if (bits >= 0L) bits ^ 0x8000000000000000L else ~bits
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = ((t >>> (56 - 8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  def decodeDouble(b: Array[Byte]): Double = {
    require(b.length == 8, s"BINARY_DOUBLE needs 8 bytes, got ${b.length}")
    var t = 0L
    var i = 0
    while (i < 8) { t = (t << 8) | (b(i) & 0xffL); i += 1 }
    val bits = if ((t & 0x8000000000000000L) != 0L) t ^ 0x8000000000000000L else ~t
    java.lang.Double.longBitsToDouble(bits)
  }
}
