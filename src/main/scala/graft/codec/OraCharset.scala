package graft.codec

import java.nio.charset.{Charset, StandardCharsets}

/** Oracle charset name → JVM Charset mapping for CHAR/VARCHAR2/NCHAR
  * byte decode (SURVEY.md §2.4 F6; reference surface
  * `runtime/data/RdbmsCharsetMapping.java`). Only charsets with exact
  * public JVM equivalents are mapped; unknown names throw rather than
  * silently mis-decode.
  */
object OraCharset {
  private val map: Map[String, Charset] = Map(
    "AL32UTF8" -> StandardCharsets.UTF_8,
    "UTF8" -> StandardCharsets.UTF_8, // CESU-8 in Oracle; UTF-8 for BMP
    "US7ASCII" -> StandardCharsets.US_ASCII,
    "AL16UTF16" -> StandardCharsets.UTF_16BE,
    "WE8ISO8859P1" -> StandardCharsets.ISO_8859_1,
    "WE8ISO8859P15" -> Charset.forName("ISO-8859-15"),
    "EL8ISO8859P7" -> Charset.forName("ISO-8859-7"),
    "CL8ISO8859P5" -> Charset.forName("ISO-8859-5"),
    "WE8MSWIN1252" -> Charset.forName("windows-1252"),
    "CL8MSWIN1251" -> Charset.forName("windows-1251"),
    "EE8MSWIN1250" -> Charset.forName("windows-1250"),
    "EL8MSWIN1253" -> Charset.forName("windows-1253"),
    "TR8MSWIN1254" -> Charset.forName("windows-1254"),
    "IW8MSWIN1255" -> Charset.forName("windows-1255"),
    "AR8MSWIN1256" -> Charset.forName("windows-1256"),
    "BLT8MSWIN1257" -> Charset.forName("windows-1257"),
    "JA16SJIS" -> Charset.forName("Shift_JIS"),
    "JA16EUC" -> Charset.forName("EUC-JP"),
    "KO16MSWIN949" -> Charset.forName("x-windows-949"),
    "ZHS16GBK" -> Charset.forName("GBK"),
    "ZHT16MSWIN950" -> Charset.forName("windows-950"),
  )

  def forName(oracleName: String): Charset =
    // Locale.ROOT: default-locale uppercasing turns 'i' into dotted
    // capital İ on Turkish JVMs, missing every map key containing I
    map.getOrElse(oracleName.toUpperCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(s"unmapped Oracle charset $oracleName"))

  def decode(bytes: Array[Byte], oracleName: String): String =
    new String(bytes, forName(oracleName))

  def encode(s: String, oracleName: String): Array[Byte] =
    s.getBytes(forName(oracleName))
}
