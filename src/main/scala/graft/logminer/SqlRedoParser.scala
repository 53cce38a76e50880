package graft.logminer

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

import graft.cdc.Ops

/** Parser for LogMiner-style SQL_REDO text (SURVEY.md §2.1 S4).
  *
  * The reference's LogMiner path reconstructs typed row changes from the
  * SQL text LogMiner generates (`OraCdcLogMinerTable.parseRedoRecord`,
  * ref OraCdcLogMinerTable.java:155-541): `insert into "O"."T"(cols)
  * values(...)`, `update ... set ... where ...`, `delete ... where ...`,
  * with values as quoted strings ('' escaping), NULL, HEXTORAW('..'),
  * bare numerics, or TO_DATE/TO_TIMESTAMP wrappers, and `IS NULL`
  * predicates in WHERE. This is a hand-rolled single-pass tokenizer —
  * regexes can't handle commas/parens inside quoted values.
  */
object SqlRedoParser {

  /** A parsed statement: op ∈ {Insert, Update, Delete}; `set` is the
    * after-image (INSERT/UPDATE), `where` the before-image (UPDATE/
    * DELETE). Values are None for SQL NULL.
    */
  case class SqlRedoChange(
      op: Int,
      owner: String,
      table: String,
      set: Map[String, Option[String]],
      where: Map[String, Option[String]])

  def parse(sql: String): SqlRedoChange = {
    val s = sql.trim.stripSuffix(";")
    val lower = s.toLowerCase
    // dispatch on the first keyword only — the statement parsers match
    // the full keyword sequence whitespace-agnostically (LogMiner output
    // may break lines anywhere)
    if (lower.startsWith("insert")) parseInsert(s)
    else if (lower.startsWith("update")) parseUpdate(s)
    else if (lower.startsWith("delete")) parseDelete(s)
    else throw new IllegalArgumentException(
      s"unsupported SQL_REDO statement: ${s.take(40)}…")
  }

  // ---- statement forms ----

  private def parseInsert(s: String): SqlRedoChange = {
    val p = new Cursor(s)
    p.expectKeyword("insert"); p.expectKeyword("into")
    val (owner, table) = p.qualifiedName()
    p.skipWs(); p.expect('(')
    val cols = new ArrayBuffer[String]()
    var done = false
    while (!done) {
      p.skipWs()
      cols += p.identifier()
      p.skipWs()
      if (p.tryConsume(',')) () else { p.expect(')'); done = true }
    }
    p.skipWs(); p.expectIgnoreCase("values"); p.skipWs(); p.expect('(')
    val vals = new ArrayBuffer[Option[String]]()
    done = false
    while (!done) {
      p.skipWs()
      vals += p.value()
      p.skipWs()
      if (p.tryConsume(',')) () else { p.expect(')'); done = true }
    }
    require(cols.length == vals.length,
      s"column/value count mismatch: ${cols.length} vs ${vals.length}")
    p.expectEnd()
    SqlRedoChange(Ops.Insert, owner, table, cols.zip(vals).toMap, Map.empty)
  }

  private def parseUpdate(s: String): SqlRedoChange = {
    val p = new Cursor(s)
    p.expectKeyword("update")
    val (owner, table) = p.qualifiedName()
    p.expectKeyword("set")
    val set = LinkedHashMap[String, Option[String]]()
    var inSet = true
    while (inSet) {
      p.skipWs()
      val col = p.identifier()
      p.skipWs(); p.expect('='); p.skipWs()
      set += col -> p.value()
      p.skipWs()
      if (!p.tryConsume(',')) inSet = false
    }
    val where =
      if (p.atEnd) Map.empty[String, Option[String]]
      else { p.expectKeyword("where"); parseWhere(p) }
    p.expectEnd()
    SqlRedoChange(Ops.Update, owner, table, set.toMap, where)
  }

  private def parseDelete(s: String): SqlRedoChange = {
    val p = new Cursor(s)
    p.expectKeyword("delete"); p.expectKeyword("from")
    val (owner, table) = p.qualifiedName()
    p.skipWs()
    val where =
      if (p.atEnd) Map.empty[String, Option[String]]
      else { p.expectKeyword("where"); parseWhere(p) }
    p.expectEnd()
    SqlRedoChange(Ops.Delete, owner, table, Map.empty, where)
  }

  /** `"C1" = v and "C2" IS NULL and …` */
  private def parseWhere(p: Cursor): Map[String, Option[String]] = {
    val out = LinkedHashMap[String, Option[String]]()
    var more = true
    while (more) {
      p.skipWs()
      val col = p.identifier()
      p.skipWs()
      if (p.tryConsumeKeyword("is")) { p.expectKeyword("null"); out += col -> None }
      else { p.expect('='); p.skipWs(); out += col -> p.value() }
      p.skipWs()
      more = p.tryConsumeKeyword("and")
    }
    out.toMap
  }

  // ---- cursor / tokens ----

  private final class Cursor(s: String) {
    private var i = 0
    def atEnd: Boolean = { skipWs(); i >= s.length }
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s(i) != c)
        throw new IllegalArgumentException(
          s"expected '$c' at $i in: ${s.slice(math.max(0, i - 20), i + 20)}")
      i += 1
    }
    def tryConsume(c: Char): Boolean =
      if (i < s.length && s(i) == c) { i += 1; true } else false
    def expectIgnoreCase(tok: String): Unit = {
      if (!s.regionMatches(true, i, tok, 0, tok.length))
        throw new IllegalArgumentException(s"expected '$tok' at $i")
      i += tok.length
    }
    def tryConsumeIgnoreCase(tok: String): Boolean =
      if (s.regionMatches(true, i, tok, 0, tok.length)) { i += tok.length; true }
      else false

    /** Case-insensitive KEYWORD match: requires a word boundary after
      * (so `and` never matches the prefix of `android`) and swallows any
      * following whitespace — LogMiner output may break lines (CR/LF)
      * where the old literal-trailing-space matchers demanded ' '. */
    def tryConsumeKeyword(tok: String): Boolean = {
      skipWs()
      if (s.regionMatches(true, i, tok, 0, tok.length) && {
        val j = i + tok.length
        j >= s.length || !(s(j).isLetterOrDigit || s(j) == '_' ||
          s(j) == '$' || s(j) == '#')
      }) { i += tok.length; skipWs(); true }
      else false
    }

    def expectKeyword(tok: String): Unit =
      if (!tryConsumeKeyword(tok))
        throw new IllegalArgumentException(
          s"expected '$tok' at $i in: ${s.slice(math.max(0, i - 20), i + 20)}")

    /** The whole statement must be consumed: silently ignoring a
      * trailing `or …` predicate or junk would emit a TRUNCATED image
      * as a valid change. */
    def expectEnd(): Unit =
      if (!atEnd) throw new IllegalArgumentException(
        s"unparsed trailing input at $i: '${s.substring(i).take(40)}'")

    /** `"OWNER"."TABLE"` or unquoted `owner.table`. */
    def qualifiedName(): (String, String) = {
      skipWs()
      val a = identifier()
      expect('.')
      val b = identifier()
      (a, b)
    }

    /** `"Quoted"` (double-quote escaping) or bare identifier. */
    def identifier(): String = {
      skipWs()
      if (tryConsume('"')) {
        val sb = new StringBuilder
        var closed = false
        while (!closed) {
          if (i >= s.length) throw new IllegalArgumentException("unterminated identifier")
          val c = s(i); i += 1
          if (c == '"') {
            if (i < s.length && s(i) == '"') { sb += '"'; i += 1 }
            else closed = true
          } else sb += c
        }
        sb.result()
      } else {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_' ||
          s(i) == '$' || s(i) == '#')) i += 1
        require(i > start, s"empty identifier at $start")
        s.substring(start, i)
      }
    }

    /** One SQL value token → Some(text) / None for NULL. HEXTORAW('…') is
      * decoded to its raw-hex payload prefixed "0x" (typed decode happens
      * in the projection layer, like the reference's per-column decoders);
      * TO_DATE/TO_TIMESTAMP unwrap to their first literal argument.
      */
    def value(): Option[String] = {
      skipWs()
      if (tryConsumeIgnoreCase("null")) None
      else if (s(i) == '\'') Some(quotedString())
      else if (tryConsumeIgnoreCase("hextoraw(")) {
        skipWs()
        val hex = quotedString()
        skipWs(); expect(')')
        Some("0x" + hex.toLowerCase)
      } else if (tryConsumeIgnoreCase("to_date(") ||
        tryConsumeIgnoreCase("to_timestamp(")) {
        skipWs()
        val v = quotedString()
        // skip optional format argument(s)
        var depth = 1
        while (depth > 0) {
          if (i >= s.length) throw new IllegalArgumentException("unterminated call")
          val c = s(i)
          if (c == '\'') quotedString()
          else {
            if (c == '(') depth += 1
            else if (c == ')') depth -= 1
            i += 1
          }
        }
        Some(v)
      } else {
        // bare literal (numeric); runs to comma/paren/ANY whitespace —
        // the old explicit " \t\n" set let a CR ride into the value on
        // CRLF-formatted statements
        val start = i
        while (i < s.length && s(i) != ',' && s(i) != ')' &&
          !s(i).isWhitespace) i += 1
        require(i > start, s"empty value at $start")
        Some(s.substring(start, i))
      }
    }

    private def quotedString(): String = {
      expect('\'')
      val sb = new StringBuilder
      var closed = false
      while (!closed) {
        if (i >= s.length) throw new IllegalArgumentException("unterminated string")
        val c = s(i); i += 1
        if (c == '\'') {
          if (i < s.length && s(i) == '\'') { sb += '\''; i += 1 }
          else closed = true
        } else sb += c
      }
      sb.result()
    }
  }
}
