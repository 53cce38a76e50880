package graft.codec

import java.nio.charset.StandardCharsets.UTF_8

/** OSON — Oracle's self-describing binary JSON encoding (F9).
  *
  * The reference decodes OSON images with Oracle's own
  * `OracleJsonFactory#createJsonBinaryParser` and emits the JSON text
  * (`runtime/data/GenericDecoders.java:1068-1078`, carried as the
  * single-field `V` struct of `data/OraJson.java:41-56`). This is a
  * clean-room reader/writer for the same image layout, derived from the
  * publicly documented structure (header, field-name dictionary with
  * per-name hash ids, offset-addressed tree segment) and validated
  * byte-for-byte against the reference's public test vector
  * (`runtime/data/OsonTest.java:56-72`): the image decodes to
  * `{"fruit":"pineapple","quantity":20}`.
  *
  * Layout (all multi-byte integers big-endian):
  * {{{
  *   magic FF 4A 5A | version 01 | flags u16
  *   numFieldNames  u8  (u16 when flags & 0x0400 — GJSON large variant)
  *   fnamesSegSize  u16 (u32 when flags & 0x0800)
  *   treeSegSize    u16 (u32 when flags & 0x1000)
  *   tinyNodeStat   u16 (present when flags & 0x2000; unused here)
  *   hashIds        numFieldNames × u8   (low byte of FNV-1a-32 of the
  *                                        UTF-8 name — verified against
  *                                        the reference vector)
  *   fnameOffsets   numFieldNames × u16 (u32 when flags & 0x0800)
  *   fnamesSeg      at each offset: u8 length + UTF-8 bytes
  *   treeSeg        root node at offset 0
  * }}}
  *
  * Tree nodes (type byte first):
  *  - `0x00..0x1F` inline string, length = type byte
  *  - `0x20..0x2F` Oracle NUMBER scalar, length = (type & 0x0F) + 1
  *  - `0x30` null, `0x31` true, `0x32` false
  *  - `0x33`/`0x34`/`0x35` string with u8/u16/u32 length
  *  - `0x36` Oracle NUMBER with u8 length (numbers longer than 16 bytes)
  *  - `0x80 | 0x40(array) | sizeClass` container. sizeClass `0x04`:
  *    count u8 + child offsets u16; `0x08`: count u16 + offsets u16;
  *    `0x0C`: count u32 + offsets u32. Objects store count field ids
  *    (u8, or u16 when numFieldNames > 255) before the offsets; ids are
  *    1-based indexes into the dictionary; entries sorted by
  *    (hashId, name) so point lookups can binary-search. Offsets are
  *    relative to the tree-segment start.
  *
  * The dictionary sort canonicalizes key order: decode(encode(x))
  * reorders object keys by (hash, name) — the tradeoff real OSON makes
  * to give O(log n) field access without decoding the whole document.
  * Flag combinations this subset does not emit are rejected loudly
  * rather than mis-decoded.
  */
object Oson {

  // ---- JSON value model ----
  sealed trait J
  case object JNull extends J
  case class JBool(b: Boolean) extends J
  case class JStr(s: String) extends J
  case class JNum(v: java.math.BigDecimal) extends J
  case class JArr(items: Vector[J]) extends J
  case class JObj(fields: Vector[(String, J)]) extends J

  final class OsonException(msg: String) extends RuntimeException(msg)

  /** Low byte of FNV-1a-32 over the UTF-8 name — the per-field hash id
    * stored in the dictionary (fruit→0x91, quantity→0xD8 in the
    * reference vector).
    */
  def fieldHash(name: String): Int = {
    var h = 0x811c9dc5
    val bs = name.getBytes(UTF_8)
    var i = 0
    while (i < bs.length) { h = (h ^ (bs(i) & 0xff)) * 0x01000193; i += 1 }
    h & 0xff
  }

  // ---- flags ----
  private val FlagHashIdU8   = 0x0100
  private val FlagNumFnamesU16 = 0x0400
  private val FlagSegU32Fnames = 0x0800
  private val FlagSegU32Tree   = 0x1000
  private val FlagTinyNodeStat = 0x2000
  private val FlagInlineLeaf   = 0x0002 // emitted for vector-compat; no layout effect here
  private val FlagLenInPct     = 0x0004 // emitted for vector-compat; no layout effect here
  private val SmallFlags =
    FlagTinyNodeStat | FlagHashIdU8 | FlagLenInPct | FlagInlineLeaf // = 0x2106, as the reference vector
  private val LargeFlags =
    SmallFlags | FlagNumFnamesU16 | FlagSegU32Fnames | FlagSegU32Tree

  // =================================================================
  // Decode
  // =================================================================

  /** Decode an OSON image to canonical JSON text (stored key order). */
  def decodeText(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    render(decode(bytes), sb)
    sb.toString
  }

  def decode(bytes: Array[Byte]): J =
    try decode0(bytes)
    catch {
      // truncated/garbage images surface as stray index errors deep in
      // the tree walk — normalize to the codec's own failure type.
      // IllegalArgumentException covers a truncated NUMBER scalar:
      // Arrays.copyOfRange zero-PADS past end-of-array instead of
      // throwing, and pad byte 0 is an invalid base-100 digit in both
      // polarities, so OraNumber.decode rejects it (never mis-decodes)
      // — but with its own exception type
      case _: ArrayIndexOutOfBoundsException | _: StringIndexOutOfBoundsException |
           _: NegativeArraySizeException | _: IllegalArgumentException =>
        throw new OsonException("corrupt OSON image (segment out of bounds)")
    }

  private def decode0(bytes: Array[Byte]): J = {
    if (bytes.length < 10 || bytes(0) != 0xff.toByte || bytes(1) != 0x4a || bytes(2) != 0x5a)
      throw new OsonException("not an OSON image (bad magic)")
    if (bytes(3) != 1) throw new OsonException(s"unsupported OSON version ${bytes(3)}")
    val flags = u16(bytes, 4)
    val known = LargeFlags
    if ((flags & ~known) != 0)
      throw new OsonException(f"unsupported OSON flag bits 0x${flags & ~known}%04x")
    var p = 6
    val numFnames =
      if ((flags & FlagNumFnamesU16) != 0) { val v = u16(bytes, p); p += 2; v }
      else { val v = bytes(p) & 0xff; p += 1; v }
    val fnamesSegSize =
      if ((flags & FlagSegU32Fnames) != 0) { val v = u32(bytes, p); p += 4; v }
      else { val v = u16(bytes, p); p += 2; v }
    if ((flags & FlagSegU32Tree) != 0) p += 4 else p += 2 // tree seg size (trailing; unused)
    if ((flags & FlagTinyNodeStat) != 0) p += 2
    if ((flags & FlagHashIdU8) == 0)
      throw new OsonException("only u8 hash ids supported")
    p += numFnames // skip hash ids — full-document decode never searches
    val offW = if ((flags & FlagSegU32Fnames) != 0) 4 else 2
    val fnameOffsets = new Array[Int](numFnames)
    var i = 0
    while (i < numFnames) {
      fnameOffsets(i) = if (offW == 4) u32(bytes, p) else u16(bytes, p)
      p += offW; i += 1
    }
    val fnamesBase = p
    val names = new Array[String](numFnames)
    i = 0
    while (i < numFnames) {
      val off = fnamesBase + fnameOffsets(i)
      val len = bytes(off) & 0xff
      names(i) = new String(bytes, off + 1, len, UTF_8)
      i += 1
    }
    val treeBase = fnamesBase + fnamesSegSize
    val fidW = if (numFnames > 0xff) 2 else 1
    readNode(bytes, treeBase, 0, names, fidW, depth = 0)
  }

  /** Nesting bound: well-formed OSON trees are offset-acyclic, but a
    * corrupt/malicious image whose child offset points back at (or
    * above) itself would otherwise recurse to StackOverflowError — an
    * Error the corrupt-image catch cannot normalize.
    */
  private val MaxDepth = 256

  // (no offset-width parameter: every container node derives its own
  // offset width from its size-class byte)
  private def readNode(b: Array[Byte], base: Int, off: Int, names: Array[String],
      fidW: Int, depth: Int): J = {
    if (depth > MaxDepth)
      throw new OsonException("corrupt OSON image (cyclic or over-deep tree)")
    var p = base + off
    val t = b(p) & 0xff; p += 1
    if ((t & 0x80) != 0) {
      val isArray = (t & 0x40) != 0
      val (count, ow) = (t & 0x3f) match {
        case 0x04 => (b(p) & 0xff, 2)
        case 0x08 => (u16(b, p), 2)
        case 0x0c => (u32(b, p), 4)
        case other => throw new OsonException(f"unsupported container size class 0x$other%02x")
      }
      p += (if ((t & 0x3f) == 0x04) 1 else if ((t & 0x3f) == 0x08) 2 else 4)
      // an attacker-controlled u32 count must not size an allocation
      // before the bytes back it: count entries need at least count
      // offset slots in the remaining image, so a ~2G count in a short
      // image dies HERE as OsonException, not as an OutOfMemoryError
      // (an Error the corrupt-image catch cannot normalize)
      if (count.toLong * ow > (b.length - p).toLong)
        throw new OsonException(
          s"corrupt OSON image (container count $count exceeds remaining bytes)")
      if (isArray) {
        val items = Vector.newBuilder[J]
        var i = 0
        while (i < count) {
          val child = if (ow == 4) u32(b, p + i * 4) else u16(b, p + i * 2)
          items += readNode(b, base, child, names, fidW, depth + 1)
          i += 1
        }
        JArr(items.result())
      } else {
        val fids = new Array[Int](count)
        var i = 0
        while (i < count) {
          fids(i) = if (fidW == 2) u16(b, p) else b(p) & 0xff
          p += fidW; i += 1
        }
        val fields = Vector.newBuilder[(String, J)]
        i = 0
        while (i < count) {
          val child = if (ow == 4) u32(b, p + i * 4) else u16(b, p + i * 2)
          fields += names(fids(i) - 1) -> readNode(b, base, child, names, fidW, depth + 1)
          i += 1
        }
        JObj(fields.result())
      }
    } else t match {
      case n if n <= 0x1f => JStr(new String(b, p, n, UTF_8))
      case n if n >= 0x20 && n <= 0x2f =>
        JNum(OraNumber.decode(java.util.Arrays.copyOfRange(b, p, p + (n & 0x0f) + 1)))
      case 0x30 => JNull
      case 0x31 => JBool(true)
      case 0x32 => JBool(false)
      case 0x33 => JStr(new String(b, p + 1, b(p) & 0xff, UTF_8))
      case 0x34 => JStr(new String(b, p + 2, u16(b, p), UTF_8))
      case 0x35 => JStr(new String(b, p + 4, u32(b, p), UTF_8))
      case 0x36 => JNum(OraNumber.decode(
        java.util.Arrays.copyOfRange(b, p + 1, p + 1 + (b(p) & 0xff))))
      case other => throw new OsonException(f"unsupported node type 0x$other%02x")
    }
  }

  // =================================================================
  // Encode
  // =================================================================

  /** Encode a JSON value as an OSON image. Keys canonicalize to
    * (hashId, name) dictionary order, like real OSON images.
    */
  def encode(j0: J): Array[Byte] = {
    // normalize FIRST — dedup duplicate keys (last wins) and order each
    // object by (hash, name) — so the size pass and the write pass see
    // the identical tree; sizing the raw tree while writing the deduped
    // one would corrupt every sibling offset after a dup-key object
    def normalize(v: J): J = v match {
      case JObj(fs) =>
        JObj(fs.groupBy(_._1).view.mapValues(_.last._2).toVector
          .sortBy(f => (fieldHash(f._1), f._1))
          .map { case (k, c) => k -> normalize(c) })
      case JArr(is) => JArr(is.map(normalize))
      case other => other
    }
    val j = normalize(j0)
    // dictionary: distinct names sorted by (hash, name)
    val nameSet = collection.mutable.LinkedHashSet.empty[String]
    def collect(v: J): Unit = v match {
      case JObj(fs) => fs.foreach { case (k, c) => nameSet += k; collect(c) }
      case JArr(is) => is.foreach(collect)
      case _ =>
    }
    collect(j)
    val names = nameSet.toArray.sortBy(n => (fieldHash(n), n))
    val fidOf = names.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
    val nameBytes = names.map(_.getBytes(UTF_8))
    nameBytes.foreach { nb =>
      if (nb.length > 0xff)
        throw new OsonException("field name longer than 255 bytes")
    }
    val fnamesSegSize = nameBytes.map(_.length + 1).sum
    val fidW = if (names.length > 0xff) 2 else 1

    // two-pass tree layout: try u16 offsets, fall back to u32
    def tree(offW: Int): Option[Array[Byte]] = {
      val numBytes = collection.mutable.AnyRefMap.empty[JNum, Array[Byte]]
      // memoized by node identity: write() asks for each child's size
      // twice per container — without the cache encoding is O(n·depth)
      val sizeCache = new java.util.IdentityHashMap[J, java.lang.Long]()
      def nodeSize(v: J): Long = {
        val cached = sizeCache.get(v)
        if (cached != null) cached.longValue()
        else {
          val s = nodeSize0(v)
          sizeCache.put(v, s)
          s
        }
      }
      def nodeSize0(v: J): Long = v match {
        case JNull | JBool(_) => 1L
        case JStr(s) =>
          val n = s.getBytes(UTF_8).length
          if (n <= 0x1f) 1L + n
          else if (n <= 0xff) 2L + n
          else if (n <= 0xffff) 3L + n
          else 5L + n
        case n @ JNum(_) =>
          val bs = numBytes.getOrElseUpdate(n, OraNumber.encode(n.v))
          if (bs.length <= 16) 1L + bs.length else 2L + bs.length
        case JArr(is) =>
          val (cw, ow) = containerWidths(is.length, offW)
          1L + cw + is.length.toLong * ow + is.map(nodeSize).sum
        case JObj(fs) =>
          val (cw, ow) = containerWidths(fs.length, offW)
          1L + cw + fs.length.toLong * (fidW + ow) + fs.map(f => nodeSize(f._2)).sum
      }
      val total = nodeSize(j)
      if (offW == 2 && total > 0xffffL) return None
      if (total > Int.MaxValue - 64) throw new OsonException("document too large")
      val out = new java.io.ByteArrayOutputStream(total.toInt)
      // pre-order: node bytes, then children subtrees consecutively
      def write(v: J, at: Int): Unit = v match {
        case JNull => out.write(0x30)
        case JBool(true) => out.write(0x31)
        case JBool(false) => out.write(0x32)
        case JStr(s) =>
          val bs = s.getBytes(UTF_8)
          if (bs.length <= 0x1f) out.write(bs.length)
          else if (bs.length <= 0xff) { out.write(0x33); out.write(bs.length) }
          else if (bs.length <= 0xffff) { out.write(0x34); wU16(out, bs.length) }
          else { out.write(0x35); wU32(out, bs.length) }
          out.write(bs, 0, bs.length)
        case n @ JNum(_) =>
          val bs = numBytes(n)
          if (bs.length <= 16) out.write(0x20 | (bs.length - 1))
          else { out.write(0x36); out.write(bs.length) }
          out.write(bs, 0, bs.length)
        case JArr(is) =>
          val (cw, ow) = containerWidths(is.length, offW)
          out.write(0x80 | 0x40 | sizeClass(cw, ow))
          wCount(out, cw, is.length)
          var child = at + 1 + cw + is.length * ow
          val offs = is.map { c => val o = child; child += nodeSize(c).toInt; o }
          offs.foreach(o => if (ow == 4) wU32(out, o) else wU16(out, o))
          var cat = at + 1 + cw + is.length * ow
          is.foreach { c => write(c, cat); cat += nodeSize(c).toInt }
        case JObj(fs) =>
          // already deduped + (hash, name)-ordered by normalize()
          val (cw, ow) = containerWidths(fs.length, offW)
          out.write(0x80 | sizeClass(cw, ow))
          wCount(out, cw, fs.length)
          fs.foreach { case (k, _) =>
            if (fidW == 2) wU16(out, fidOf(k)) else out.write(fidOf(k))
          }
          val hdr = 1 + cw + fs.length * (fidW + ow)
          var child = at + hdr
          val offs = fs.map { case (_, c) => val o = child; child += nodeSize(c).toInt; o }
          offs.foreach(o => if (ow == 4) wU32(out, o) else wU16(out, o))
          var cat = at + hdr
          fs.foreach { case (_, c) => write(c, cat); cat += nodeSize(c).toInt }
      }
      write(j, 0)
      Some(out.toByteArray)
    }
    // the large-variant dictionary header is u16 — silently truncating
    // a bigger dictionary would corrupt every field-id reference
    if (names.length > 0xffff)
      throw new OsonException(
        s"too many distinct field names for OSON: ${names.length} > 65535")
    // a large dictionary forces u32 tree offsets (one flag governs
    // both), and it is known BEFORE any tree pass — don't size+write a
    // u16 tree that is guaranteed to be discarded
    val dictLarge = names.length > 0xff || fnamesSegSize > 0xffff
    val (treeFinal, large) =
      if (dictLarge) (tree(4).get, true)
      else tree(2) match {
        case Some(t) => (t, false)
        case None => (tree(4).get, true)
      }

    val out = new java.io.ByteArrayOutputStream(treeFinal.length + fnamesSegSize + 64)
    out.write(0xff); out.write(0x4a); out.write(0x5a); out.write(0x01)
    wU16(out, if (large) LargeFlags else SmallFlags)
    if (large) wU16(out, names.length) else out.write(names.length)
    if (large) wU32(out, fnamesSegSize) else wU16(out, fnamesSegSize)
    if (large) wU32(out, treeFinal.length) else wU16(out, treeFinal.length)
    wU16(out, 0) // tiny-node stat
    names.foreach(n => out.write(fieldHash(n)))
    var off = 0
    nameBytes.foreach { nb =>
      if (large) wU32(out, off) else wU16(out, off)
      off += nb.length + 1
    }
    nameBytes.foreach { nb => out.write(nb.length); out.write(nb, 0, nb.length) }
    out.write(treeFinal, 0, treeFinal.length)
    out.toByteArray
  }

  /** Parse JSON text and encode it as an OSON image. */
  def encodeText(json: String): Array[Byte] = encode(parse(json))

  private def wCount(o: java.io.ByteArrayOutputStream, cw: Int, n: Int): Unit =
    cw match {
      case 1 => o.write(n)
      case 2 => wU16(o, n)
      case _ => wU32(o, n)
    }

  private def containerWidths(count: Int, offW: Int): (Int, Int) =
    if (offW == 4) (4, 4) else if (count <= 0xff) (1, 2) else (2, 2)
  private def sizeClass(cw: Int, ow: Int): Int =
    if (ow == 4) 0x0c else if (cw == 1) 0x04 else 0x08

  // =================================================================
  // JSON text: minimal recursive-descent parser + canonical renderer
  // =================================================================

  def parse(s: String): J =
    try {
      val p = new Parser(s)
      val v = p.value()
      p.ws()
      if (!p.eof) throw new OsonException(s"trailing JSON content at ${p.pos}")
      v
    } catch {
      // malformed escapes/numbers surface as raw JDK exceptions from
      // substring/BigDecimal — normalize to the codec's failure type
      case e @ (_: StringIndexOutOfBoundsException | _: NumberFormatException) =>
        throw new OsonException(s"malformed JSON text: ${e.getMessage}")
    }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit =
      while (!eof && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t' ||
        s.charAt(pos) == '\n' || s.charAt(pos) == '\r')) pos += 1
    private def fail(msg: String) = throw new OsonException(s"$msg at $pos")
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    def value(): J = {
      ws()
      if (eof) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => num()
      }
    }
    private def lit(l: String): Unit = {
      if (!s.regionMatches(pos, l, 0, l.length)) fail(s"expected $l")
      pos += l.length
    }
    private def obj(): J = {
      expect('{'); ws()
      val fs = Vector.newBuilder[(String, J)]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return JObj(Vector.empty) }
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':')
        fs += k -> value()
        ws()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); more = false }
      }
      JObj(fs.result())
    }
    private def arr(): J = {
      expect('['); ws()
      val is = Vector.newBuilder[J]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return JArr(Vector.empty) }
      var more = true
      while (more) {
        is += value(); ws()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); more = false }
      }
      JArr(is.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        val c = s.charAt(pos); pos += 1
        c match {
          case '"' => return sb.toString
          case '\\' =>
            if (eof) fail("bad escape")
            val e = s.charAt(pos); pos += 1
            e match {
              case '"' => sb.append('"'); case '\\' => sb.append('\\')
              case '/' => sb.append('/'); case 'b' => sb.append('\b')
              case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
              case 'r' => sb.append('\r'); case 't' => sb.append('\t')
              case 'u' =>
                if (pos + 4 > s.length) fail("bad \\u escape (truncated)")
                val hex = s.substring(pos, pos + 4)
                // strict 4 hex digits: Integer.parseInt(_, 16) would
                // also accept a sign character ("+0041")
                if (!hex.forall(ch => Character.digit(ch, 16) >= 0))
                  fail(s"bad \\u escape \\u$hex")
                sb.append(Integer.parseInt(hex, 16).toChar)
                pos += 4
              case _ => fail(s"bad escape \\$e")
            }
          case other => sb.append(other)
        }
      }
      sb.toString
    }
    private def num(): J = {
      val start = pos
      if (!eof && s.charAt(pos) == '-') pos += 1
      while (!eof && { val c = s.charAt(pos)
        (c >= '0' && c <= '9') || c == '.' || c == 'e' || c == 'E' || c == '+' || c == '-' }) pos += 1
      if (pos == start) fail("expected value")
      val tok = s.substring(start, pos)
      // STRICT JSON grammar — BigDecimal alone would also accept
      // leading '+', leading zeros ("01") and bare fractions (".5"/"1."),
      // letting invalid text round-trip into OSON images
      if (!tok.matches("-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?"))
        fail(s"invalid JSON number '$tok'")
      JNum(new java.math.BigDecimal(tok))
    }
  }

  /** Canonical JSON text: no whitespace, numbers in plain notation with
    * trailing zeros stripped — matching what the reference emits via
    * `OracleJsonValue.toString` for its test vector.
    */
  private def render(j: J, sb: java.lang.StringBuilder): Unit = j match {
    case JNull => sb.append("null")
    case JBool(b) => sb.append(b)
    case JNum(v) =>
      val z = v.stripTrailingZeros
      sb.append(if (z.scale < 0) z.setScale(0).toPlainString else z.toPlainString)
    case JStr(s) =>
      sb.append('"')
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        c match {
          case '"' => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case '\b' => sb.append("\\b")
          case '\f' => sb.append("\\f")
          case '\n' => sb.append("\\n")
          case '\r' => sb.append("\\r")
          case '\t' => sb.append("\\t")
          case cc if cc < 0x20 => sb.append(f"\\u$cc%04x")
          case cc => sb.append(cc)
        }
        i += 1
      }
      sb.append('"')
    case JArr(is) =>
      sb.append('[')
      var first = true
      is.foreach { v => if (!first) sb.append(','); render(v, sb); first = false }
      sb.append(']')
    case JObj(fs) =>
      sb.append('{')
      var first = true
      fs.foreach { case (k, v) =>
        if (!first) sb.append(',')
        render(JStr(k), sb); sb.append(':'); render(v, sb)
        first = false
      }
      sb.append('}')
  }

  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  private def u32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
  private def wU16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def wU32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 24) & 0xff); o.write((v >> 16) & 0xff)
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
}
