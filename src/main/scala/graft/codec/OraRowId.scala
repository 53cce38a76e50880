package graft.codec

/** Oracle ROWID codec: (dataObjectId, relativeFileNo, blockNo, rowNo) ⇄
  * the 18-character extended-ROWID display form `OOOOOOFFFBBBBBBRRR`.
  *
  * Public layout (Oracle docs): 6 base-64 chars of data-object number,
  * 3 of relative file number, 6 of block number, 3 of row number, using
  * the alphabet A–Z a–z 0–9 + / (value order). Equivalent to the surface
  * the reference gets from `solutions.a2.oracle.internals.RowId`
  * (SURVEY.md §2.4 F7), re-implemented from the documented format.
  */
object OraRowId {
  private val Alphabet =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
  private val Inverse: Array[Int] = {
    val a = Array.fill(128)(-1)
    Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  case class RowId(dataObj: Long, fileNo: Int, blockNo: Long, rowNo: Int) {
    override def toString: String = encode(dataObj, fileNo, blockNo, rowNo)
  }

  private def put(sb: java.lang.StringBuilder, v: Long, chars: Int): Unit = {
    var shift = (chars - 1) * 6
    while (shift >= 0) {
      sb.append(Alphabet(((v >>> shift) & 0x3f).toInt))
      shift -= 6
    }
  }

  def encode(dataObj: Long, fileNo: Int, blockNo: Long, rowNo: Int): String = {
    val sb = new java.lang.StringBuilder(18)
    put(sb, dataObj & 0xffffffffL, 6)
    put(sb, fileNo.toLong & 0x3ffff, 3)
    put(sb, blockNo & 0xfffffffffL, 6)
    put(sb, rowNo.toLong & 0x3ffff, 3)
    sb.toString
  }

  private def take(s: String, from: Int, chars: Int): Long = {
    var v = 0L
    var i = from
    while (i < from + chars) {
      val d = if (s.charAt(i) < 128) Inverse(s.charAt(i).toInt) else -1
      require(d >= 0, s"bad ROWID char '${s.charAt(i)}' in $s")
      v = (v << 6) | d
      i += 1
    }
    v
  }

  def decode(s: String): RowId = {
    require(s != null && s.length == 18, s"bad ROWID '$s'")
    RowId(take(s, 0, 6), take(s, 6, 3).toInt, take(s, 9, 6), take(s, 15, 3).toInt)
  }
}
