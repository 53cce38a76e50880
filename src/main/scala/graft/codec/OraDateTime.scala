package graft.codec

import java.time.{Instant, LocalDateTime, ZoneOffset}

/** Oracle DATE (7-byte) and TIMESTAMP (7/11-byte) wire-format codec.
  *
  * Public excess encoding: [century+100, year%100+100, month, day,
  * hour+1, minute+1, second+1] (+ optional 4-byte big-endian nanoseconds
  * for TIMESTAMP). Mirrors the decode behavior of the reference's
  * `GenericDecoders.java:355-375` (SURVEY.md §2.4 F3), re-implemented
  * from the public format.
  *
  * All conversions are UTC; Spark TimestampType carries micros since epoch.
  */
object OraDateTime {

  /** Decode 7- or 11-byte Oracle DATE/TIMESTAMP to epoch micros (UTC). */
  def decodeToMicros(b: Array[Byte]): Long = {
    require(b != null && (b.length == 7 || b.length == 11), s"bad DATE len ${if (b == null) -1 else b.length}")
    decodeToMicros0(b, b.length)
  }

  // length-bounded form so the 13-byte TSTZ path reads its leading 11
  // bytes in place — no per-row take() copy in the codegen hot path
  private def decodeToMicros0(b: Array[Byte], len: Int): Long = {
    val year = ((b(0) & 0xff) - 100) * 100 + ((b(1) & 0xff) - 100)
    val ldt = LocalDateTime.of(year, b(2) & 0xff, b(3) & 0xff,
      (b(4) & 0xff) - 1, (b(5) & 0xff) - 1, (b(6) & 0xff) - 1)
    val nanos =
      if (len >= 11)
        ((b(7) & 0xff) << 24) | ((b(8) & 0xff) << 16) | ((b(9) & 0xff) << 8) | (b(10) & 0xff)
      else 0
    val epochSec = ldt.toEpochSecond(ZoneOffset.UTC)
    epochSec * 1000000L + nanos / 1000L
  }

  /** Encode epoch micros (UTC) to 7-byte DATE (truncates sub-second).
    * The excess-100 century byte holds years −10100..15300 at most;
    * Oracle DATE itself spans −4712..9999 — enforce the wire format's
    * own bound so a legal-but-out-of-range Spark timestamp fails
    * loudly instead of silently wrapping the century byte (year 20000
    * would round-trip as −5600). */
  def encodeDate(micros: Long): Array[Byte] = {
    val ldt = LocalDateTime.ofInstant(
      Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L)), ZoneOffset.UTC)
    require(ldt.getYear >= -4712 && ldt.getYear <= 9999,
      s"year ${ldt.getYear} outside the Oracle DATE range -4712..9999")
    Array(
      (ldt.getYear / 100 + 100).toByte, (ldt.getYear % 100 + 100).toByte,
      ldt.getMonthValue.toByte, ldt.getDayOfMonth.toByte,
      (ldt.getHour + 1).toByte, (ldt.getMinute + 1).toByte,
      (ldt.getSecond + 1).toByte)
  }

  /** Encode epoch micros (UTC) to 11-byte TIMESTAMP (micro precision). */
  def encodeTimestamp(micros: Long): Array[Byte] = {
    val date = encodeDate(micros)
    val nanos = (Math.floorMod(micros, 1000000L) * 1000L).toInt
    date ++ Array(
      ((nanos >>> 24) & 0xff).toByte, ((nanos >>> 16) & 0xff).toByte,
      ((nanos >>> 8) & 0xff).toByte, (nanos & 0xff).toByte)
  }

  // ---- TIMESTAMP WITH TIME ZONE (13-byte; SURVEY.md §2.4 F4) ----
  //
  // Bytes 0-10 carry the instant's UTC datetime in the TIMESTAMP layout;
  // bytes 11-12 carry the zone as offset-hours+20 / offset-minutes+60
  // (the public fixed-offset form). The instant is zone-independent; the
  // offset rides along so clients can render local time.

  /** Encode (epoch micros UTC, zone offset minutes) to 13-byte TSTZ. */
  def encodeTsTz(micros: Long, offsetMinutes: Int): Array[Byte] = {
    require(offsetMinutes >= -18 * 60 && offsetMinutes <= 18 * 60,
      s"bad zone offset $offsetMinutes")
    val sign = if (offsetMinutes < 0) -1 else 1
    val abs = math.abs(offsetMinutes)
    encodeTimestamp(micros) ++ Array(
      (sign * (abs / 60) + 20).toByte,
      (sign * (abs % 60) + 60).toByte)
  }

  /** Decode 13-byte TSTZ → (epoch micros UTC, zone offset minutes). */
  def decodeTsTz(b: Array[Byte]): (Long, Int) =
    (decodeTsTzMicros(b), decodeTsTzOffset(b))

  /** Primitive accessors (single static calls for generated code). */
  def decodeTsTzMicros(b: Array[Byte]): Long = {
    require(b != null && b.length == 13, s"bad TSTZ len ${if (b == null) -1 else b.length}")
    decodeToMicros0(b, 11)
  }

  def decodeTsTzOffset(b: Array[Byte]): Int = {
    require(b != null && b.length == 13, s"bad TSTZ len ${if (b == null) -1 else b.length}")
    ((b(11) & 0xff) - 20) * 60 + ((b(12) & 0xff) - 60)
  }
}
