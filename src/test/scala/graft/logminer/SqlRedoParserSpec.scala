package graft.logminer

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Ops
import graft.logminer.SqlRedoParser._

class SqlRedoParserSpec extends AnyFunSuite {

  test("insert with strings, numbers, NULL, HEXTORAW") {
    val c = parse("""insert into "SCOTT"."DEPT"("DEPTNO","DNAME","RAW","NOTE") """ +
      """values (42,'R''n''D',HEXTORAW('DEADbeef'),NULL)""")
    assert(c.op === Ops.Insert)
    assert(c.owner === "SCOTT" && c.table === "DEPT")
    assert(c.set === Map(
      "DEPTNO" -> Some("42"),
      "DNAME" -> Some("R'n'D"),
      "RAW" -> Some("0xdeadbeef"),
      "NOTE" -> None))
  }

  test("update with WHERE incl. IS NULL and commas inside strings") {
    val c = parse("""update "S"."T" set "A" = 'x,y (z)', "B" = 7 """ +
      """where "A" = 'old' and "B" IS NULL and "C" = HEXTORAW('00ff')""")
    assert(c.op === Ops.Update)
    assert(c.set === Map("A" -> Some("x,y (z)"), "B" -> Some("7")))
    assert(c.where === Map("A" -> Some("old"), "B" -> None, "C" -> Some("0x00ff")))
  }

  test("delete with full before-image predicate") {
    val c = parse("""delete from "S"."T" where "K" = 1 and "V" = 'v'""")
    assert(c.op === Ops.Delete)
    assert(c.set.isEmpty)
    assert(c.where === Map("K" -> Some("1"), "V" -> Some("v")))
  }

  test("TO_DATE / TO_TIMESTAMP unwrap to the literal") {
    val c = parse("""insert into "S"."T"("D","TS") values """ +
      """(TO_DATE('2024-01-02 03:04:05', 'YYYY-MM-DD HH24:MI:SS'),""" +
      """TO_TIMESTAMP('2024-01-02 03:04:05.123456'))""")
    assert(c.set === Map(
      "D" -> Some("2024-01-02 03:04:05"),
      "TS" -> Some("2024-01-02 03:04:05.123456")))
  }

  test("quoted identifiers with escaped quotes; unquoted identifiers") {
    val c = parse("""update "S"."Odd""Name" set COL1 = 1 where COL2 = 2""")
    assert(c.table === "Odd\"Name")
    assert(c.set === Map("COL1" -> Some("1")))
    assert(c.where === Map("COL2" -> Some("2")))
  }

  test("update without WHERE (no supplemental logging)") {
    val c = parse("""update "S"."T" set "A" = NULL""")
    assert(c.set === Map("A" -> None) && c.where.isEmpty)
  }

  test("trailing semicolon and unsupported statements") {
    assert(parse("""delete from "S"."T" where "K" = 1;""").op === Ops.Delete)
    intercept[IllegalArgumentException] { parse("merge into t using ...") }
  }

  test("unparsed trailing input fails loudly instead of truncating the image") {
    // an OR predicate the grammar does not support must not silently
    // become a where-image missing its second half
    val ex = intercept[IllegalArgumentException] {
      parse("""delete from "S"."T" where "A" = 1 or "B" = 2""")
    }
    assert(ex.getMessage.contains("unparsed trailing"))
    intercept[IllegalArgumentException] {
      parse("""insert into "S"."T"("A") values(1) garbage""")
    }
    intercept[IllegalArgumentException] {
      parse("""update "S"."T" set "A" = 1 where "B" = 2 or "C" = 3""")
    }
  }

  test("CRLF/newline-formatted statements parse (keywords and bare values)") {
    val c = parse("update \"S\".\"T\"\r\nset \"A\" = 123\r\nwhere\n\"B\" = 4\r\nand\n\"C\" IS\nNULL")
    assert(c.set === Map("A" -> Some("123")))
    assert(c.where === Map("B" -> Some("4"), "C" -> None))
    // keyword boundary: a column named ANDCOL is an identifier, not 'and'
    val d = parse("delete from \"S\".\"T\" where \"X\" = 1 and ANDCOL = 2")
    assert(d.where === Map("X" -> Some("1"), "ANDCOL" -> Some("2")))
  }
}
