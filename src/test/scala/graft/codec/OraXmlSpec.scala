package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class OraXmlSpec extends AnyFunSuite {

  private val doc = """<?xml version="1.0"?><a href="x">héllo &amp; ✓</a>"""

  test("CLOB carrier decodes UTF-16 (BOM-aware, BE default)") {
    assert(OraXml.decodeClob(doc.getBytes(StandardCharsets.UTF_16)) == doc)
    // raw BE without BOM — the charset's documented default
    assert(OraXml.decodeClob(doc.getBytes(StandardCharsets.UTF_16BE)) == doc)
  }

  test("BLOB carrier: BOM detection wins") {
    val utf8Bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      doc.getBytes(StandardCharsets.UTF_8)
    assert(OraXml.decodeBlob(utf8Bom) == doc)
    assert(OraXml.decodeBlob(doc.getBytes(StandardCharsets.UTF_16)) == doc) // FE FF BOM
    val le = Array[Byte](0xff.toByte, 0xfe.toByte) ++
      doc.getBytes(StandardCharsets.UTF_16LE)
    assert(OraXml.decodeBlob(le) == doc)
  }

  test("BLOB carrier: BOM-less UTF-16 detected from the '<?' byte pattern") {
    assert(OraXml.decodeBlob(doc.getBytes(StandardCharsets.UTF_16BE)) == doc)
    assert(OraXml.decodeBlob(doc.getBytes(StandardCharsets.UTF_16LE)) == doc)
  }

  test("BLOB carrier: declaration encoding pseudo-attribute is honored") {
    val latin = """<?xml version="1.0" encoding="ISO-8859-1"?><v>café</v>"""
    assert(OraXml.decodeBlob(latin.getBytes(StandardCharsets.ISO_8859_1)) == latin)
  }

  test("BLOB carrier: defaults to UTF-8") {
    assert(OraXml.decodeBlob(doc.getBytes(StandardCharsets.UTF_8)) == doc)
    val noDecl = "<root>plain</root>"
    assert(OraXml.decodeBlob(noDecl.getBytes(StandardCharsets.UTF_8)) == noDecl)
  }

  test("unknown declared encoding fails loudly") {
    val bad = """<?xml version="1.0" encoding="NOT-A-CHARSET"?><v/>"""
    intercept[OraXml.OraXmlException] {
      OraXml.decodeBlob(bad.getBytes(StandardCharsets.US_ASCII))
    }
  }
}
