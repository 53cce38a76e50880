package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The native whitespace-token counter must equal the split-based
  * formulation (`size(filter(split(s, "\\s+"), _ != ""))`) — the
  * semantics every tokenCount oracle restates — on arbitrary strings,
  * including multi-byte UTF-8 and Unicode whitespace Java `\s` does
  * NOT match.
  */
class WsTokenCountProps extends AnyFunSuite {

  private def reference(s: String): Int =
    s.split("\\s+").count(_.nonEmpty)

  private def native(s: String): Int =
    TextHash.wsTokenCount(UTF8String.fromString(s))

  test("equals split-based count on seeded random strings") {
    val rnd = new scala.util.Random(20260816L)
    // alphabet mixes every Java \s char, ASCII text, 2/3/4-byte UTF-8
    // code points, and Unicode spaces OUTSIDE \s (NBSP  ,
    // IDEOGRAPHIC SPACE 　) which must count as token characters
    // in both formulations
    val alphabet = "ab0. \t\n\f\r" + "é中" +
      new String(Character.toChars(0x1f600)) + " 　"
    (1 to 2000).foreach { _ =>
      val n = rnd.nextInt(40)
      val s = Array.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(native(s) === reference(s),
        s"mismatch on code points ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("edge cases") {
    assert(native("") === 0)
    assert(native("   \t\r\n") === 0)
    assert(native("a") === 1)
    assert(native(" a ") === 1)
    assert(native("a b\tc\nd") === 4)
    // NBSP ( ) is NOT Java \s: one token in both formulations
    assert(native("a b") === 1)
    assert(reference("a b") === 1)
    // VT () IS Java \s: a separator in both
    assert(native("ab") === 2)
    assert(reference("ab") === 2)
  }
}
