package graft.cdc

import org.apache.spark.sql.types._

/** DDL apply / schema evolution (SURVEY.md §2.2 T9).
  *
  * Re-expresses the reference's ALTER TABLE pre-processing and dictionary
  * update (`utils/OraSqlUtils.java:47-50,143-228`; apply
  * `OraCdcTableBase.processDdl:404-616`): supported operations are add /
  * modify / drop / rename / set-unused column; each successful apply bumps
  * the value-schema version (key schema stays v1 — ref
  * `doc/LogMinerConnector.adoc:127-131`). Spark streaming can't swap a
  * query's schema mid-flight, so the registry is the foreachBatch-side
  * authority: a version bump signals restart-on-DDL (documented
  * limitation, SURVEY §7.4-4).
  */
object SchemaEvolution {

  sealed trait DdlOp
  case class AddColumn(name: String, dataType: DataType, nullable: Boolean) extends DdlOp
  case class ModifyColumn(name: String, dataType: DataType) extends DdlOp
  case class DropColumn(name: String) extends DdlOp
  case class RenameColumn(from: String, to: String) extends DdlOp
  case class SetUnused(name: String) extends DdlOp

  case class TableVersion(schema: StructType, version: Int)

  /** Oracle type text → Spark type (subset of the §1.2 mapping). */
  def oraType(t: String): DataType = {
    val up = t.trim.toUpperCase
    // any parenthesized argument list: numeric precision/scale, `*`
    // precision (NUMBER(*,2) = precision 38), and length-semantics
    // qualifiers (VARCHAR2(30 CHAR / 30 BYTE)) all occur in real DDL
    val anyArgs = """\(([^)]*)\)""".r
    val args: Seq[Int] = anyArgs.findFirstMatchIn(up)
      .map(_.group(1).split(",").toSeq.flatMap { raw =>
        val a = raw.trim.replaceAll("\\s+(CHAR|BYTE)$", "")
        if (a == "*") Some(38)
        else if (a.matches("-?\\d+")) Some(a.toInt)
        else None
      }).getOrElse(Nil)
    // strip only the argument list, keeping any trailing qualifier:
    // "TIMESTAMP(6) WITH TIME ZONE" must not collapse to "TIMESTAMP"
    anyArgs.replaceAllIn(up, "").replaceAll("\\s+", " ").trim match {
      case "NUMBER" => args match {
        // Oracle allows scale > precision (NUMBER(2,7): values < 10^-5
        // with 2 significant digits); Spark requires scale <= precision,
        // so widen the precision to the scale — lossless for every value
        // the Oracle type admits
        case Seq(p, s) if s > 0 => DecimalType(math.max(p, s), s)
        // NUMBER(p) and NUMBER(p,0) are the same integral split; a
        // negative scale widens the magnitude by |s| decimal digits
        case Seq(p) => integralNumber(p)
        case Seq(p, s) => integralNumber(p - s)
        case _ => DoubleType // scale-less NUMBER
      }
      case "BINARY_FLOAT" => FloatType
      case "BINARY_DOUBLE" => DoubleType
      case "DATE" | "TIMESTAMP" => TimestampNTZType
      // session-zone semantics → instant-typed, matching DictionaryReader's
      // TIMESTAMP_WITH_TIMEZONE mapping
      case "TIMESTAMP WITH TIME ZONE" |
           "TIMESTAMP WITH LOCAL TIME ZONE" => TimestampType
      case "VARCHAR2" | "NVARCHAR2" | "CHAR" | "NCHAR" | "CLOB" | "NCLOB" |
           "LONG" | "XMLTYPE" | "JSON" => StringType
      case "RAW" | "BLOB" => BinaryType
      case "BOOLEAN" => BooleanType
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  private def integralNumber(effPrecision: Int): DataType =
    if (effPrecision < 3) ByteType
    else if (effPrecision < 5) ShortType
    else if (effPrecision < 10) IntegerType
    else if (effPrecision < 19) LongType
    else DecimalType(math.min(38, effPrecision), 0)

  /** Pre-process one ALTER TABLE into its column operations (the
    * reference's alterTablePreProcessor analogue). Handles single and
    * parenthesized multi-column forms.
    */
  def parseAlter(ddl: String): Seq[DdlOp] = {
    val s = ddl.trim.stripSuffix(";").replaceAll("\\s+", " ")
    val lower = s.toLowerCase
    require(lower.startsWith("alter table "), s"not an ALTER TABLE: ${s.take(30)}")
    val rest = s.substring("alter table ".length)
    // skip the table name (quoted or bare, possibly owner-qualified)
    val afterName = rest.replaceFirst("^\\S+ ", "")
    val verb = afterName.toLowerCase

    def splitCols(body: String): Seq[String] = {
      // split a parenthesized list on top-level commas
      val out = collection.mutable.ArrayBuffer[String]()
      var depth = 0
      val cur = new StringBuilder
      body.foreach {
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => out += cur.result().trim; cur.clear()
        case c => cur += c
      }
      if (cur.nonEmpty) out += cur.result().trim
      out.toSeq
    }
    def colDef(d: String, withNull: Boolean): (String, DataType, Boolean) = {
      val parts = d.trim.split(" ", 2)
      require(parts.length == 2, s"bad column definition: $d")
      val nullable = !parts(1).toLowerCase.contains("not null")
      // strip DEFAULT <expr> and NULL/NOT NULL before the type mapping —
      // "D DATE DEFAULT SYSDATE NOT NULL" must map as "DATE"
      val typeText = parts(1)
        .replaceAll("(?i)\\bdefault\\b.*$", "")
        .replaceAll("(?i)\\b(not\\s+)?null\\b", "")
      (clean(parts(0)), oraType(typeText), if (withNull) nullable else true)
    }
    def clean(id: String): String = id.stripPrefix("\"").stripSuffix("\"")

    def body(prefix: String): String = {
      val b = afterName.substring(prefix.length).trim
      if (b.startsWith("(")) b.stripPrefix("(").stripSuffix(")") else b
    }
    // Oracle DROP/SET UNUSED accept trailing options after the column —
    // CASCADE CONSTRAINTS, INVALIDATE, ONLINE, CHECKPOINT n — possibly
    // COMBINED. They must all be stripped BEFORE the name lookup:
    // treated as part of the name they match no column and the drop
    // silently no-ops. The repetition group handles multi-option DDL.
    def stripTrailingOptions(b: String): String =
      b.replaceAll("(?i)(\\s+(cascade( constraints)?|invalidate|online|checkpoint( \\d+)?))+\\s*$",
        "")

    // verbs may abut the parenthesized form with no space: ADD(...),
    // MODIFY(...), DROP(...) are all legal Oracle syntax. `body` handles
    // both shapes: the trim absorbs the space, the paren-strip the rest.
    def verbIs(v: String): Boolean =
      verb.startsWith(v + " ") || verb.startsWith(v + "(")

    if (verbIs("add")) {
      splitCols(body("add")).map { d =>
        val (n, t, nu) = colDef(d, withNull = true); AddColumn(n, t, nu)
      }
    } else if (verbIs("modify")) {
      splitCols(body("modify")).map { d =>
        val (n, t, _) = colDef(d, withNull = false); ModifyColumn(n, t)
      }
    } else if (verb.startsWith("drop column ")) {
      Seq(DropColumn(clean(stripTrailingOptions(body("drop column ")))))
    } else if (verb.startsWith("drop (") || verb.startsWith("drop(")) {
      // strip trailing options BEFORE the parens: "(a, b) cascade
      // constraints" must reduce to "a, b"
      val b = stripTrailingOptions(afterName.substring("drop".length).trim)
      splitCols(b.stripPrefix("(").stripSuffix(")"))
        .map(c => DropColumn(clean(c)))
    } else if (verb.startsWith("rename column ")) {
      val b = body("rename column ")
      val m = "(?i)^(\\S+) to (\\S+)$".r.findFirstMatchIn(b)
        .getOrElse(throw new IllegalArgumentException(s"bad rename: $b"))
      Seq(RenameColumn(clean(m.group(1)), clean(m.group(2))))
    } else if (verb.startsWith("set unused column ")) {
      Seq(SetUnused(clean(stripTrailingOptions(body("set unused column ")))))
    } else if (verb.startsWith("set unused (") || verb.startsWith("set unused(")) {
      val b = stripTrailingOptions(
        afterName.substring("set unused".length).trim)
      splitCols(b.stripPrefix("(").stripSuffix(")"))
        .map(c => SetUnused(clean(c)))
    } else throw new IllegalArgumentException(s"unsupported DDL verb: $verb")
  }

  /** Apply one DDL statement; bumps version iff the schema changed.
    * Unknown columns in drop/set-unused are ignored (the reference guards
    * re-applied DDL on restart the same way); rename/modify of a missing
    * column is an error.
    */
  def applyDdl(tv: TableVersion, ddl: String): TableVersion = {
    var fields = tv.schema.fields.toVector
    parseAlter(ddl).foreach {
      case AddColumn(n, t, nu) =>
        fields.find(_.name.equalsIgnoreCase(n)) match {
          // replayed DDL on restart: an identical ADD is a no-op (same
          // idempotence guard drop/set-unused already have); a SAME-NAME
          // add with a different type OR nullability is a genuine conflict
          case Some(f) =>
            require(f.dataType == t && f.nullable == nu,
              s"duplicate column $n with conflicting definition " +
                s"${f.dataType}${if (f.nullable) "" else " NOT NULL"} vs " +
                s"$t${if (nu) "" else " NOT NULL"}")
          case None => fields = fields :+ StructField(n, t, nu)
        }
      case ModifyColumn(n, t) =>
        val i = indexOf(fields, n)
        fields = fields.updated(i, fields(i).copy(dataType = t))
      case DropColumn(n) =>
        fields = fields.filterNot(_.name.equalsIgnoreCase(n))
      case SetUnused(n) => // semantically a drop from the capture's view
        fields = fields.filterNot(_.name.equalsIgnoreCase(n))
      case RenameColumn(from, to) =>
        val i = indexOf(fields, from)
        fields = fields.updated(i, fields(i).copy(name = to))
    }
    val next = StructType(fields)
    if (next == tv.schema) tv else TableVersion(next, tv.version + 1)
  }

  private def indexOf(fields: Vector[StructField], n: String): Int = {
    val i = fields.indexWhere(_.name.equalsIgnoreCase(n))
    require(i >= 0, s"no such column $n")
    i
  }
}

/** Per-table schema registry driven by DDL records in the change stream —
  * the foreachBatch-side authority for value-schema versions.
  *
  * The registry keeps each table's version TIMELINE — (fromCommitScn,
  * TableVersion), ascending — not just the latest version: stamping a
  * data row looks up the version in force AT ITS COMMIT SCN, so a
  * micro-batch REPLAYED by foreachBatch's at-least-once contract (or
  * re-processed after a crash-restart whose history file already holds
  * the batch's DDL) stamps its pre-DDL rows with the OLD version, not
  * whatever the registry's head happens to be. DDL application is
  * keyed by commit SCN too: a replayed DDL record whose commit SCN is
  * already on the timeline is a no-op (and is NOT re-appended to the
  * history file).
  */
class SchemaRegistry {
  /** One timeline entry: the commit SCN the DDL landed at, the DDL
    * text itself (replay-conflict detection — empty for the base
    * registration), and the resulting version.
    */
  private case class Entry(commitScn: Long, ddl: String,
      tv: SchemaEvolution.TableVersion)

  private val tables = collection.mutable.Map[String, Vector[Entry]]()

  def register(table: String, schema: StructType): Unit =
    tables(table) =
      Vector(Entry(Long.MinValue, "", SchemaEvolution.TableVersion(schema, 1)))

  /** The LATEST version (the head of the timeline). */
  def get(table: String): Option[SchemaEvolution.TableVersion] =
    tables.get(table).map(_.last.tv)

  /** The version in force at `commitScn` (floor lookup on the timeline). */
  def versionAt(table: String, commitScn: Long): Option[SchemaEvolution.TableVersion] =
    tables.get(table).flatMap { tl =>
      tl.takeWhile(_.commitScn <= commitScn).lastOption.map(_.tv)
    }

  /** Apply DDL at the timeline head (no commit coordinates — the
    * batch-side/test surface). Returns the new version; bumps only on
    * effective change.
    */
  def applyDdl(table: String, ddl: String): Int = {
    val tl = timeline(table)
    val scn = math.max(tl.last.commitScn + 1, 0L)
    applyDdlAt(table, ddl, scn)._1
  }

  private def timeline(table: String) =
    tables.getOrElse(table,
      throw new NoSuchElementException(s"unknown table $table"))

  /** Apply DDL that committed at `commitScn`. Returns (version, newly
    * applied) — a commit SCN already on the timeline is a replay and
    * applies nothing. Every applied DDL lands on the timeline, version
    * bump or not, so the replay check holds for no-op DDL too.
    */
  def applyDdlAt(table: String, ddl: String,
      commitScn: Long): (Int, Boolean) = {
    val tl = timeline(table)
    tl.find(_.commitScn == commitScn) match {
      case Some(e) =>
        // replay detection must compare the TEXT too: a different DDL
        // arriving at an already-seen commit SCN is not a replay — it
        // is a coordinate collision, and silently discarding it would
        // leave the registry's schema permanently wrong
        require(e.ddl == ddl,
          s"conflicting DDL at commitScn $commitScn of $table: " +
            s"'${e.ddl}' already applied, now '$ddl'")
        (e.tv.version, false)
      case None =>
        require(commitScn > tl.last.commitScn,
          s"DDL at commitScn $commitScn arrives before the timeline head " +
            s"${tl.last.commitScn} of $table — out-of-order schema history")
        val next = SchemaEvolution.applyDdl(tl.last.tv, ddl)
        tables(table) = tl :+ Entry(commitScn, ddl, next)
        (next.version, true)
    }
  }

  /** Apply one micro-batch of COMMITTED changes in commit order: DDL
    * records bump their table's version (appending the statement to
    * `history` when NEWLY applied — the durable schema story: the
    * reference persists per-version Connect schemas and bumps on DDL,
    * `OraCdcTableBase.java:528,598,616`; here the history file is the
    * restart authority, see [[SchemaRegistry.replay]]); data changes
    * return stamped with their table's version AT THEIR COMMIT SCN —
    * a row committed before the batch's DDL carries the old version,
    * after it the new, and the stamping is IDEMPOTENT under batch
    * replay (the timeline lookup, not the registry head). The batch's
    * DDLs land on the timeline FIRST, data rows stamp second: with a
    * single interleaved pass, a row sharing its commit SCN with a DDL
    * would stamp OLD on first processing (the DDL not yet applied)
    * but NEW on an at-least-once replay (the DDL now on the
    * timeline) — the two-phase order makes the tie rule "a DDL at
    * commitScn C governs rows at C" hold identically on every replay.
    * DDL processing is inherently serial per table (the reference
    * single-threads it the same way), so this is a driver-side pass
    * over the batch's DDL boundaries — data rows between boundaries
    * stay distributed in the caller's frame.
    */
  def stampBatch(changes: Seq[EmittedChange],
      history: Option[java.nio.file.Path] = None): Seq[(EmittedChange, Int)] = {
    val ordered = changes.sortBy(c => (c.commitScn, c.scn, c.ssn))
    // phase 1: every DDL onto the timeline (replay-safe: an already-
    // seen commit SCN applies nothing and re-appends nothing)
    ordered.foreach { c =>
      if (c.op == Ops.Ddl) {
        val ddl = c.after.getOrElse("ddl",
          throw new IllegalArgumentException(
            s"DDL record without statement text: $c"))
        val (_, newlyApplied) = applyDdlAt(c.table, ddl, c.commitScn)
        if (newlyApplied) history.foreach { h =>
          java.nio.file.Files.writeString(h,
            s"${c.table}\t${c.commitScn}\t${SchemaRegistry.encode(ddl)}\n",
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.APPEND)
        }
      }
    }
    // phase 2: stamp data rows off the settled timeline. An unknown
    // table is a misconfiguration and must FAIL here, the same way a
    // DDL for it would — silently stamping version 0 would poison
    // version-keyed consumers precisely when the registration is wrong
    ordered.flatMap { c =>
      if (c.op == Ops.Ddl) None
      else Some((c, versionAt(c.table, c.commitScn).map(_.version).getOrElse(
        throw new NoSuchElementException(
          s"unknown table ${c.table} in stampBatch — register its base " +
            s"schema before streaming its changes"))))
    }
  }
}

object SchemaRegistry {
  /** One-line encoding for history records — DDL text may legally span
    * lines ("ALTER TABLE t ADD (\n  c NUMBER\n)") and the history file
    * is line-oriented, so tab/newline/backslash are escaped.
    */
  private[cdc] def encode(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '\t' => "\\t"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case c => c.toString
  }

  private[cdc] def decode(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        b.append(s(i + 1) match {
          case '\\' => '\\'
          case 't' => '\t'
          case 'n' => '\n'
          case 'r' => '\r'
          case c => c
        })
        i += 2
      } else { b.append(s(i)); i += 1 }
    }
    b.result()
  }

  /** Rebuild a registry from base schemas + the persisted DDL history —
    * the restart path: recovered stream offsets skip the already-
    * processed micro-batches, so their DDL records never replay; the
    * history file carries the schema state (version timeline INCLUDING
    * commit SCNs) across the boundary instead — the reference stores
    * versioned schemas externally for the same reason.
    */
  def replay(base: Map[String, StructType],
      history: Option[java.nio.file.Path] = None): SchemaRegistry = {
    val reg = new SchemaRegistry
    base.foreach { case (t, s) => reg.register(t, s) }
    history.filter(java.nio.file.Files.exists(_)).foreach { h =>
      java.nio.file.Files.readAllLines(h).forEach { line =>
        if (line.nonEmpty) {
          line.split("\t", 3) match {
            case Array(t, scn, ddl) if scn.nonEmpty && scn.forall(_.isDigit) =>
              reg.applyDdlAt(t, decode(ddl), scn.toLong)
            case Array(t, ddl) =>
              // legacy record without a commit SCN (pre-timeline
              // format, exactly 2 fields — encode escapes tabs, so a
              // legacy line can never split to 3): apply at the head —
              // order within the file is commit order, which is all
              // the old format carried. A 3-field line with a
              // non-numeric SCN is CORRUPTION, not legacy — it falls
              // through to the error below instead of being applied
              // as garbage DDL at a synthesized coordinate
              reg.applyDdl(t, decode(ddl))
            case _ =>
              throw new IllegalArgumentException(
                s"unparseable schema-history record: '$line'")
          }
        }
      }
    }
    reg
  }
}
