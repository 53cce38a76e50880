package graft.codec

/** Oracle INTERVAL YEAR TO MONTH (5-byte) and INTERVAL DAY TO SECOND
  * (11-byte) wire-format codec.
  *
  * Public excess encoding:
  *  - YM: int32-BE years (excess 0x80000000), byte months (excess 60)
  *  - DS: int32-BE days (excess 0x80000000), byte hours/minutes/seconds
  *        (excess 60), int32-BE nanoseconds (excess 0x80000000)
  *
  * Covers the reference's F5 decode family (`GenericDecoders.java:377-395`,
  * SURVEY.md §2.4), re-implemented from the documented format. Spark-side
  * targets: YearMonthIntervalType (total months) and DayTimeIntervalType
  * (total micros).
  */
object OraInterval {

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def putBe32(out: Array[Byte], off: Int, v: Long): Unit = {
    out(off) = ((v >>> 24) & 0xff).toByte
    out(off + 1) = ((v >>> 16) & 0xff).toByte
    out(off + 2) = ((v >>> 8) & 0xff).toByte
    out(off + 3) = (v & 0xff).toByte
  }

  /** YM bytes → total months (signed). */
  def decodeYMToMonths(b: Array[Byte]): Int = {
    require(b != null && b.length == 5, "bad INTERVALYM")
    val years = (be32(b, 0) - 0x80000000L).toInt
    val months = (b(4) & 0xff) - 60
    years * 12 + months
  }

  def encodeYM(totalMonths: Int): Array[Byte] = {
    val years = totalMonths / 12
    val months = totalMonths % 12
    val out = new Array[Byte](5)
    putBe32(out, 0, years.toLong + 0x80000000L)
    out(4) = (months + 60).toByte
    out
  }

  /** DS bytes → total microseconds (signed). */
  def decodeDSToMicros(b: Array[Byte]): Long = {
    require(b != null && b.length == 11, "bad INTERVALDS")
    val days = be32(b, 0) - 0x80000000L
    val hours = (b(4) & 0xff) - 60
    val minutes = (b(5) & 0xff) - 60
    val seconds = (b(6) & 0xff) - 60
    val nanos = be32(b, 7) - 0x80000000L
    (((days * 24 + hours) * 60 + minutes) * 60 + seconds) * 1000000L + nanos / 1000L
  }

  def encodeDS(totalMicros: Long): Array[Byte] = {
    var rem = totalMicros
    val micros = rem % 1000000L; rem /= 1000000L
    val seconds = rem % 60; rem /= 60
    val minutes = rem % 60; rem /= 60
    val hours = rem % 24; rem /= 24
    val out = new Array[Byte](11)
    putBe32(out, 0, rem + 0x80000000L)
    out(4) = (hours + 60).toByte
    out(5) = (minutes + 60).toByte
    out(6) = (seconds + 60).toByte
    putBe32(out, 7, micros * 1000L + 0x80000000L)
    out
  }

  /** ISO-8601-ish rendering, e.g. "P2Y3M" / "P1DT2H3M4.000005S". */
  def ymToString(totalMonths: Int): String = {
    val sign = if (totalMonths < 0) "-" else ""
    val m = Math.abs(totalMonths)
    s"${sign}P${m / 12}Y${m % 12}M"
  }

  def dsToString(totalMicros: Long): String = {
    val sign = if (totalMicros < 0) "-" else ""
    var m = Math.abs(totalMicros)
    val us = m % 1000000L; m /= 1000000L
    val s = m % 60; m /= 60
    val mi = m % 60; m /= 60
    val h = m % 24; m /= 24
    f"${sign}P${m}DT${h}H${mi}M$s%d.$us%06dS"
  }
}
