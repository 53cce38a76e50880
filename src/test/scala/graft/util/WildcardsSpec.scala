package graft.util

import org.scalatest.funsuite.AnyFunSuite

class WildcardsSpec extends AnyFunSuite {

  test("exact patterns anchor to the whole string, not a line") {
    val m = Wildcards.matcher(Seq("GRAFT.EVENTS"))
    assert(m("GRAFT.EVENTS"))
    assert(m("graft.events"), "matching is case-insensitive")
    // Java's $ matches just before a trailing line terminator — an
    // un-trimmed config/index line must NOT scope in
    assert(!m("GRAFT.EVENTS\n"))
    assert(!m("GRAFT.EVENTS\r\n"))
    assert(!m("GRAFT.EVENTSX"))
    assert(!m("XGRAFT.EVENTS"))
  }

  test("% and * wildcards expand; regex metacharacters stay literal") {
    val m = Wildcards.matcher(Seq("G%.EV*S"))
    assert(m("G123.EVENTS"))
    assert(m("G.EVS"))
    assert(!m("H.EVENTS"))
    // the dot is literal, not any-char
    assert(!m("GXEVENTS"))
    val lit = Wildcards.matcher(Seq("A+B(C)"))
    assert(lit("A+B(C)"))
    assert(!lit("AAB(C)"))
  }

  test("empty pattern list matches everything") {
    assert(Wildcards.matcher(Nil)("anything"))
  }
}
