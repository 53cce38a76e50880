package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The banded Levenshtein kernel must equal the FULL unit-cost DP
  * whenever the true distance is within the band, and return −1 exactly
  * when it is not — across random ASCII pairs, adversarial shapes
  * (empty, equal, prefix/suffix edits, length gaps at the band edge)
  * and every small threshold.
  */
class LevBandedProps extends AnyFunSuite {

  /** Reference: full O(n·m) unit-cost DP. */
  private def full(a: String, b: String): Int = {
    val n = a.length; val m = b.length
    val d = Array.tabulate(n + 1, m + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to n; j <- 1 to m) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(d(i - 1)(j - 1) + cost,
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1))
    }
    d(n)(m)
  }

  private def banded(a: String, b: String, k: Int): Int =
    TextHash.levBanded(UTF8String.fromString(a), UTF8String.fromString(b), k)

  test("fuzz: banded ≡ full when within threshold, −1 past it") {
    val rnd = new scala.util.Random(60091)
    val alpha = "abcde " // small alphabet → frequent near-matches
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    var checked = 0
    (1 to 3000).foreach { _ =>
      val a = word(rnd.nextInt(80))
      // half the time, b is a mutated a (near pairs matter most)
      val b =
        if (rnd.nextBoolean()) word(rnd.nextInt(80))
        else a.map(ch =>
          if (rnd.nextInt(10) == 0) alpha(rnd.nextInt(alpha.length)) else ch)
          .mkString.take(math.max(0, a.length - rnd.nextInt(4)))
      val k = rnd.nextInt(13)
      val f = full(a, b)
      val got = banded(a, b, k)
      if (f <= k) assert(got == f, s"a='$a' b='$b' k=$k: $got != $f")
      else assert(got == -1, s"a='$a' b='$b' k=$k: expected -1, got $got ($f)")
      checked += 1
    }
    assert(checked == 3000)
  }

  test("edges: empties, equality, band-boundary length gaps, k=0") {
    assert(banded("", "", 0) == 0)
    assert(banded("", "abc", 3) == 3)
    assert(banded("", "abc", 2) == -1)
    assert(banded("abc", "abc", 0) == 0)
    assert(banded("abc", "abd", 0) == -1)
    assert(banded("abcdefgh", "abcdefgh".reverse, 10) ==
      full("abcdefgh", "abcdefgh".reverse))
    assert(banded("aaaa", "aaaaaaaa", 4) == 4) // gap exactly at the band
    assert(banded("aaaa", "aaaaaaaaa", 4) == -1)
    assert(banded("x", "y", -1) == -1)
  }
}
