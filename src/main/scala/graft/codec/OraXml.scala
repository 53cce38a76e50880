package graft.codec

import java.nio.charset.{Charset, StandardCharsets}

/** XMLTYPE text envelope decode (F8).
  *
  * The reference surfaces XML columns as text: a CLOB-carried document
  * is UTF-16 bytes, a BLOB-carried one is assumed UTF-8 with an
  * explicit `TODO not all XML are in UTF-8!`
  * (`runtime/data/GenericDecoders.java:1059-1066`; envelope schema
  * `data/OraXml.java:41-56`; the redo-side KRVXML opcode that carries
  * the chunks is `internals/OraCdcChangeKrvXml.java:47-104` — those
  * chunks arrive through the same LOB assembly path as T8).
  *
  * This codec closes the reference's TODO with the XML-spec encoding
  * detection (XML 1.0 Appendix F): BOM first, then the byte pattern of
  * `<?xm` in each candidate encoding, then the `encoding="..."`
  * pseudo-attribute of the declaration read in the detected family,
  * defaulting to UTF-8.
  */
object OraXml {

  final class OraXmlException(msg: String) extends RuntimeException(msg)

  /** CLOB carrier: UTF-16 bytes (BOM-aware, big-endian default — the
    * same behavior as the reference's `new String(data, UTF_16)`).
    */
  def decodeClob(bytes: Array[Byte]): String =
    new String(bytes, StandardCharsets.UTF_16)

  /** BLOB carrier: sniff the encoding per XML 1.0 Appendix F and decode. */
  def decodeBlob(bytes: Array[Byte]): String = {
    val (cs, bomLen) = sniff(bytes)
    new String(bytes, bomLen, bytes.length - bomLen, cs)
  }

  /** (charset, bytes-to-skip). Detection order: BOM, `<?xm` byte
    * pattern, declaration pseudo-attribute, UTF-8 default.
    */
  private def sniff(b: Array[Byte]): (Charset, Int) = {
    def at(i: Int): Int = if (i < b.length) b(i) & 0xff else -1
    // byte-order marks
    if (at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf)
      return (StandardCharsets.UTF_8, 3)
    if (at(0) == 0xfe && at(1) == 0xff) return (StandardCharsets.UTF_16BE, 2)
    if (at(0) == 0xff && at(1) == 0xfe) return (StandardCharsets.UTF_16LE, 2)
    // '<?xm' in UTF-16 without BOM
    if (at(0) == 0x00 && at(1) == '<' && at(2) == 0x00 && at(3) == '?')
      return (StandardCharsets.UTF_16BE, 0)
    if (at(0) == '<' && at(1) == 0x00 && at(2) == '?' && at(3) == 0x00)
      return (StandardCharsets.UTF_16LE, 0)
    // single-byte family: read the declaration (pure ASCII by spec) and
    // honor its encoding= pseudo-attribute
    if (at(0) == '<' && at(1) == '?') {
      val end = {
        var i = 2
        while (i < b.length && i < 256 && b(i) != '>') i += 1
        i
      }
      val decl = new String(b, 0, math.min(end + 1, b.length), StandardCharsets.US_ASCII)
      val m = java.util.regex.Pattern
        .compile("""encoding\s*=\s*["']([A-Za-z][A-Za-z0-9._\-]*)["']""")
        .matcher(decl)
      if (m.find()) {
        val name = m.group(1)
        try return (Charset.forName(name), 0)
        catch {
          case _: Exception =>
            throw new OraXmlException(s"unsupported XML encoding '$name'")
        }
      }
    }
    (StandardCharsets.UTF_8, 0)
  }
}
