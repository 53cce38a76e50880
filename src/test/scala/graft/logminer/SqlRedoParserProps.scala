package graft.logminer

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.cdc.Ops

/** Roundtrip fuzz for the hand-rolled SQL_REDO tokenizer: random
  * statements are RENDERED the way LogMiner would print them (quoted
  * identifiers with doubled-quote escapes, '' string escapes, HEXTORAW /
  * TO_DATE wrappers, IS NULL predicates, keyword-lookalike content
  * inside values) and must parse back to exactly the generated change.
  * The reference's equivalent surface is exercised by hand-picked
  * vectors (`OraCdcLogMinerTable` tests); a single-pass cursor earns
  * trust past its vectors by surviving content designed to break
  * tokenizers — commas, parens, `and`, quotes inside quoted values.
  */
object SqlRedoParserProps extends Properties("SqlRedoParser") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(800)

  // ---- generators ----

  private val bareIdent: Gen[String] = for {
    n <- Gen.choose(0, 7)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('_', '$', '#')))
  } yield "c" + cs.mkString

  private val nastyChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(',', '(', ')', ' ', '\'', '"', '=', '.'),
    1 -> Gen.oneOf('€', 'ü', '\t'))

  private val nastyText: Gen[String] =
    Gen.choose(0, 16).flatMap(n => Gen.listOfN(n, nastyChar).map(_.mkString))

  /** (parsedName, renderedForm) — quoted idents may hold ANY content. */
  private val ident: Gen[(String, String)] = Gen.frequency(
    1 -> bareIdent.map(b => (b, b)),
    1 -> nastyText.map(q => (q, "\"" + q.replace("\"", "\"\"") + "\"")))

  /** (expectedValue, renderedForm) for one SQL value token. */
  private val sqlValue: Gen[(Option[String], String)] = Gen.frequency(
    2 -> Gen.oneOf("NULL", "null", "Null").map(n => (None, n)),
    4 -> nastyText.map(v => (Some(v), "'" + v.replace("'", "''") + "'")),
    2 -> Gen.chooseNum(-999999L, 999999L).flatMap(n =>
      Gen.oneOf(n.toString, s"$n.25").map(t => (Some(t), t))),
    1 -> Gen.choose(0, 8).flatMap(n => Gen.listOfN(2 * n,
      Gen.oneOf("0123456789abcdefABCDEF".toSeq)).map { h =>
      val hex = h.mkString
      (Some("0x" + hex.toLowerCase), s"HEXTORAW('$hex')")
    }),
    1 -> nastyText.map { v =>
      val fmt = "YYYY-MM-DD HH24:MI:SS"
      (Some(v), s"TO_DATE('${v.replace("'", "''")}', '$fmt')")
    })

  /** n DISTINCT (name, rendered) columns with a value each. */
  private def pairs(n: Int): Gen[List[((String, String), (Option[String], String))]] =
    Gen.listOfN(n, Gen.zip(ident, sqlValue)).map { ps =>
      // duplicate column names collapse in the parsed map — keep firsts
      val seen = collection.mutable.Set.empty[String]
      ps.filter { case ((name, _), _) => seen.add(name) }
    }.suchThat(_.nonEmpty)

  private val tableRef: Gen[((String, String), String)] =
    Gen.zip(ident, ident).map { case ((o, ro), (t, rt)) =>
      ((o, t), s"$ro.$rt")
    }

  private def expectedMap(
      ps: List[((String, String), (Option[String], String))]): Map[String, Option[String]] =
    ps.map { case ((name, _), (v, _)) => name -> v }.toMap

  private def renderWhere(
      ps: List[((String, String), (Option[String], String))]): String =
    ps.map {
      case ((_, rc), (None, _)) => s"$rc IS NULL"
      case ((_, rc), (_, rv)) => s"$rc = $rv"
    }.mkString(" and ")

  // ---- properties ----

  property("INSERT roundtrips: cols/values incl. nasty content") =
    forAll(tableRef, Gen.choose(1, 6).flatMap(pairs)) { case (((o, t), rot), ps) =>
      val sql = s"insert into $rot(${ps.map(_._1._2).mkString(",")}) " +
        s"values (${ps.map(_._2._2).mkString(", ")});"
      val c = SqlRedoParser.parse(sql)
      c.op == Ops.Insert && c.owner == o && c.table == t &&
        c.set == expectedMap(ps) && c.where.isEmpty
    }

  property("UPDATE roundtrips: SET pairs + optional WHERE with IS NULL") =
    forAll(tableRef, Gen.choose(1, 5).flatMap(pairs),
      Gen.oneOf(0, 1, 4).flatMap(n =>
        if (n == 0) Gen.const(Nil) else pairs(n))) { case (((o, t), rot), setPs, wherePs) =>
      val setSql = setPs.map { case ((_, rc), (_, rv)) =>
        s"$rc = $rv"
      }.mkString(", ")
      val whereSql =
        if (wherePs.isEmpty) "" else s" where ${renderWhere(wherePs)}"
      val c = SqlRedoParser.parse(s"update $rot set $setSql$whereSql;")
      c.op == Ops.Update && c.owner == o && c.table == t &&
        c.set == expectedMap(setPs) && c.where == expectedMap(wherePs)
    }

  property("DELETE roundtrips: WHERE before-image, keyless form included") =
    forAll(tableRef, Gen.oneOf(0, 1, 5).flatMap(n =>
      if (n == 0) Gen.const(Nil) else pairs(n))) { case (((o, t), rot), wherePs) =>
      val whereSql =
        if (wherePs.isEmpty) "" else s" where ${renderWhere(wherePs)}"
      val c = SqlRedoParser.parse(s"delete from $rot$whereSql;")
      c.op == Ops.Delete && c.owner == o && c.table == t &&
        c.set.isEmpty && c.where == expectedMap(wherePs)
    }
}
