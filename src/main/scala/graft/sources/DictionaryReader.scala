package graft.sources

import java.sql.{Connection, Types}

import org.apache.spark.sql.types._

/** JDBC dictionary scan (SURVEY.md §2.1 S9).
  *
  * Re-expresses the reference's table/column/key metadata reads
  * (`OraDictSqlTexts.java:93-355` COLUMN_LIST/WELL_DEFINED_KEY SQL;
  * cached by table id in `OraCdcDictionaryChecker.java:129-281`) on the
  * portable JDBC metadata API: column list with the NUMBER precision
  * split, and the reference's key-selection ladder
  * (`doc/parameters.adoc:100-103`):
  *
  *  - `well_defined`: primary key, else a unique index whose columns are
  *    all NOT NULL;
  *  - `any_unique`: those, else ANY unique index;
  *  - fallback: ROWID pseudo-key (`ORA_ROW_ID`), else keyless.
  *
  * The driver reads this once per table on first touch and broadcasts the
  * resulting schema map to executors — dictionary lookups never happen
  * per row.
  */
object DictionaryReader {

  sealed trait KeyMode
  case object WellDefined extends KeyMode
  case object AnyUnique extends KeyMode

  /** Per-table key override (ref `OraCdcKeyOverrideTypes.java:28`,
    * `doc/parameters.adoc:155-159` `a2.key.override`): when present for a
    * table it REPLACES the key ladder entirely —
    *  - NOKEY: no key fields (keyless emission);
    *  - ROWID: the ROWID pseudo-key (`ORA_ROW_ID` string field);
    *  - INDEX(name): the named index's columns, in index column order,
    *    whether or not that index is unique.
    */
  sealed trait KeyOverride
  object KeyOverride {
    case object NoKey extends KeyOverride
    case object RowId extends KeyOverride
    final case class Index(name: String) extends KeyOverride

    private val IndexRe = "(?i)^INDEX\\(([^)]+)\\)$".r

    def parse(s: String): KeyOverride = s.trim match {
      case t if t.equalsIgnoreCase("NOKEY") => NoKey
      case t if t.equalsIgnoreCase("ROWID") => RowId
      case IndexRe(name) => Index(name.trim)
      case other => throw new IllegalArgumentException(
        s"bad key override '$other' (want NOKEY | ROWID | INDEX(name))")
    }

    /** Parse the reference's comma-separated config form:
      * `OWNER.TABLE=NOKEY,OWNER.T2=INDEX(T2_IX)` → map keyed
      * "OWNER.TABLE" (upper-cased).
      */
    def parseMap(s: String): Map[String, KeyOverride] =
      s.split(',').iterator.map(_.trim).filter(_.nonEmpty).map { e =>
        e.split("=", 2) match {
          case Array(t, v) => t.trim.toUpperCase -> parse(v)
          case _ => throw new IllegalArgumentException(
            s"bad key override entry '$e' (want OWNER.TABLE=...)")
        }
      }.toMap
  }

  case class ColumnDef(name: String, jdbcType: Int, precision: Int,
      scale: Int, nullable: Boolean)
  case class TableDef(schema: String, table: String, columns: Seq[ColumnDef],
      keyCols: Seq[String], keyType: String,
      typeOverrides: Map[String, DataType] = Map.empty) {
    private def colType(c: ColumnDef): DataType =
      typeOverrides.getOrElse(c.name, sparkType(c))
    def valueSchema: StructType =
      StructType(columns.map(c =>
        StructField(c.name, colType(c), c.nullable)))
    def keySchema: StructType = keyType match {
      case "ROWID" => StructType(Seq(StructField("ORA_ROW_ID", StringType, false)))
      case "NONE" => StructType(Nil)
      // fields in keyCols (KEY_SEQ / index ordinal) order, NOT table
      // column order — consumers bind key values positionally, so a key
      // column missing from the column list (a function-based index's
      // hidden SYS_NC expression column, say) must FAIL here: silently
      // dropping it would misbind every key field after it. Nullability
      // comes from the column — AnyUnique/override keys can legally sit
      // on nullable unique-index columns, and a hardcoded false would
      // crash key serializers on the first NULL
      case _ => StructType(keyCols.map { k =>
        val c = columns.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(
            s"key column $k of $schema.$table is not a table column " +
              "(function-based or hidden index column?) — override the " +
              "key or exclude the index"))
        StructField(c.name, colType(c), nullable = c.nullable)
      })
    }
  }

  /** Per-column NUMBER target overrides (ref `OraCdcNumberMapTest.java`,
    * `a2.map.number.SCHEMA.TABLE.COL_OR_PATTERN=TYPE`): force a NUMBER
    * column to a chosen target regardless of its reported precision/
    * scale. Patterns use the reference's `%` wildcard (prefix `SAL%`,
    * suffix `%ID`), resolved with the reference's precedence
    * (`runtime/config/SourceConnectorConfig.java` `columnNumberMapping`):
    * exact name, then prefix patterns, then suffix patterns — all
    * case-sensitive. Mid-string `%` (e.g. `A%B`) is an extension the
    * reference does not read; it is tried last. Only NUMBER/DECIMAL
    * columns are remapped — the override never rewrites non-numeric
    * types.
    */
  object NumberMap {
    def parseType(s: String): DataType = {
      val t = s.trim.toUpperCase
      val DecRe = "(?:DECIMAL|NUMERIC)\\((\\d+),\\s*(\\d+)\\)".r
      val DecScaleRe = "(?:DECIMAL|NUMERIC)\\((\\d+)\\)".r
      def dec(p: Int, sc: Int): DataType = {
        // validate HERE with the config text in hand — an invalid target
        // otherwise surfaces as an opaque Spark error deep inside schema
        // construction, far from the a2.map.number entry that caused it
        if (p < 1 || p > 38 || sc < 0 || sc > p)
          throw new IllegalArgumentException(
            s"bad NUMBER map target '$s': DECIMAL precision must be 1..38 " +
              "and scale must be 0..precision")
        DecimalType(p, sc)
      }
      t match {
        case "BOOL" | "BOOLEAN" => BooleanType
        case "BYTE" | "TINYINT" => ByteType
        case "SHORT" | "SMALLINT" => ShortType
        case "INT" | "INTEGER" => IntegerType
        case "LONG" | "BIGINT" => LongType
        case "FLOAT" => FloatType
        case "DOUBLE" => DoubleType
        case DecRe(p, sc) => dec(p.toInt, sc.toInt)
        // single-argument form: the reference accepts ONLY the comma
        // form — `DECIMAL(p,s)` with exactly one comma, of which it
        // keeps just the SCALE and discards the precision; anything
        // else is logged and ignored (`runtime/config/
        // SourceConnectorConfig.java:166-183`). We read DECIMAL(S) as
        // that scale with precision widened to 38 (same value space the
        // reference ends up with), and honor an explicit precision when
        // the comma form supplies one — a strictness extension, not a
        // reference behavior.
        case DecScaleRe(sc) => dec(38, sc.toInt)
        case other => throw new IllegalArgumentException(
          s"bad NUMBER map target '$other'")
      }
    }

    /** Resolve a column against (pattern, type) entries with the
      * reference's precedence (`runtime/config/SourceConnectorConfig
      * .java` `columnNumberMapping`/`remapUsingPattern`): exact name,
      * then prefix `X%` (startsWith), then suffix `%X` (endsWith) —
      * case-sensitive throughout, first match within each tier. General
      * mid-`%` patterns (our extension) are tried last.
      */
    def resolve(entries: Seq[(String, DataType)], col: String): Option[DataType] = {
      def isPrefix(p: String) =
        p.length > 1 && p.indexOf('%') == p.length - 1
      def isSuffix(p: String) =
        p.length > 1 && p.lastIndexOf('%') == 0
      entries.collectFirst { case (p, t) if !p.contains("%") && p == col => t }
        .orElse(entries.collectFirst {
          case (p, t) if isPrefix(p) && col.startsWith(p.dropRight(1)) => t
        })
        .orElse(entries.collectFirst {
          case (p, t) if isSuffix(p) && col.endsWith(p.drop(1)) => t
        })
        .orElse(entries.collectFirst {
          case (p, t) if p.contains("%") && !isPrefix(p) && !isSuffix(p) &&
            matches(p, col) => t
        })
    }

    private def matches(pattern: String, col: String): Boolean = {
      // translate the % wildcard, quoting everything else literally
      val rx = pattern.split("%", -1).map(java.util.regex.Pattern.quote)
        .mkString(".*")
      col.matches(rx)
    }
  }

  /** JDBC type tag → Spark type, with the reference's NUMBER split
    * (`OraCdcColumn.java:462-501`).
    */
  def sparkType(c: ColumnDef): DataType = c.jdbcType match {
    case Types.TINYINT => ByteType
    case Types.SMALLINT => ShortType
    case Types.INTEGER => IntegerType
    case Types.BIGINT => LongType
    case Types.REAL => FloatType
    case Types.FLOAT | Types.DOUBLE => DoubleType
    case Types.DECIMAL | Types.NUMERIC =>
      // precision 0 = unconstrained NUMERIC → the scale-less fallback;
      // the integral split only applies to a REPORTED precision
      if (c.precision <= 0) DoubleType
      else if (c.scale == 0 && c.precision < 3) ByteType
      else if (c.scale == 0 && c.precision < 5) ShortType
      else if (c.scale == 0 && c.precision < 10) IntegerType
      else if (c.scale == 0 && c.precision < 19) LongType
      else if (c.scale < 0)
        // Oracle NUMBER(p,-s) rounds to 10^s and stores up to p+s digits
        // (NUMBER(5,-2) holds 9_999_900): the integer width is p - scale,
        // clamped to Spark's 38-digit maximum
        DecimalType(math.min(38, c.precision - c.scale), 0)
      else {
        // Oracle allows NUMBER(p,s) with s > p (values < 1 carrying s
        // fraction digits); Spark requires precision >= scale, so widen
        // the precision to hold the scale
        DecimalType(math.max(c.precision, c.scale), c.scale)
      }
    case Types.CHAR | Types.VARCHAR | Types.LONGVARCHAR | Types.NCHAR |
         Types.NVARCHAR | Types.LONGNVARCHAR | Types.CLOB | Types.NCLOB |
         Types.SQLXML => StringType
    case Types.DATE | Types.TIMESTAMP => TimestampNTZType
    case Types.TIMESTAMP_WITH_TIMEZONE => TimestampType
    case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB =>
      BinaryType
    case Types.BOOLEAN | Types.BIT => BooleanType
    case other => throw new IllegalArgumentException(s"unsupported jdbc type $other")
  }

  /** `rowIdPseudoKey = false` disables the ROWID fallback globally
    * (`a2.use.rowid.as.key=false`): tables without a usable key become
    * keyless instead of falling back to the ROWID pseudo-key.
    *
    * `keyOverride` (per-table `a2.key.override=...`) REPLACES the ladder
    * outright when present; `numberOverrides` are this table's
    * `a2.map.number.*` entries in config order.
    */
  def readTable(conn: Connection, schema: String, table: String,
      keyMode: KeyMode = WellDefined, rowIdPseudoKey: Boolean = true,
      keyOverride: Option[KeyOverride] = None,
      numberOverrides: Seq[(String, DataType)] = Nil): TableDef = {
    val md = conn.getMetaData
    // getColumns treats schema/table as LIKE patterns: an unescaped '_'
    // (ubiquitous in Oracle names) matches ANY character and can merge a
    // sibling table's columns into this TableDef — escape literals
    val esc = md.getSearchStringEscape
    def lit(id: String): String =
      id.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")

    val cols = {
      val rs = md.getColumns(null, lit(schema), lit(table), "%")
      val buf = collection.mutable.ArrayBuffer[ColumnDef]()
      while (rs.next()) {
        buf += ColumnDef(
          rs.getString("COLUMN_NAME"),
          rs.getInt("DATA_TYPE"),
          rs.getInt("COLUMN_SIZE"),
          rs.getInt("DECIMAL_DIGITS"),
          rs.getInt("NULLABLE") != java.sql.DatabaseMetaData.columnNoNulls)
      }
      rs.close()
      buf.toSeq
    }
    require(cols.nonEmpty, s"no such table $schema.$table")
    val notNull = cols.filterNot(_.nullable).map(_.name).toSet

    val pk = {
      val rs = md.getPrimaryKeys(null, schema, table)
      val buf = collection.mutable.ArrayBuffer[(Short, String)]()
      while (rs.next()) buf += rs.getShort("KEY_SEQ") -> rs.getString("COLUMN_NAME")
      rs.close()
      buf.sortBy(_._1).map(_._2).toSeq
    }

    // unique=false so INDEX(name) overrides can target ANY named index,
    // not just unique ones; the ladder below still restricts itself to
    // the unique subset. A SEQ, not a Map: JDBC result-set order
    // (NON_UNIQUE, TYPE, INDEX_NAME) must survive so the ladder's
    // find/headOption stay deterministic for the same table
    lazy val allIndexes: Seq[(String, (Boolean, Seq[String]))] = {
      val rs = md.getIndexInfo(null, schema, table, false, false)
      val byIndex = collection.mutable.LinkedHashMap[String,
        (Boolean, collection.mutable.ArrayBuffer[(Short, String)])]()
      while (rs.next()) {
        val idx = rs.getString("INDEX_NAME")
        val colName = rs.getString("COLUMN_NAME")
        val unique = !rs.getBoolean("NON_UNIQUE")
        if (idx != null && colName != null)
          byIndex.getOrElseUpdate(idx,
            (unique, collection.mutable.ArrayBuffer()))
            ._2.append(rs.getShort("ORDINAL_POSITION") -> colName)
      }
      rs.close()
      byIndex.iterator.map { case (n, (u, cs)) =>
        n -> (u, cs.sortBy(_._1).map(_._2).toSeq)
      }.toSeq
    }
    lazy val uniqueIndexes: Seq[Seq[String]] =
      allIndexes.collect { case (_, (true, cs)) => cs }

    val (keyCols, keyType) = keyOverride match {
      case Some(KeyOverride.NoKey) => (Nil, "NONE")
      case Some(KeyOverride.RowId) => (Nil, "ROWID")
      case Some(KeyOverride.Index(name)) =>
        val ix = allIndexes.collectFirst {
          case (n, (_, cs)) if n.equalsIgnoreCase(name) => cs
        }.getOrElse(throw new IllegalArgumentException(
          s"key override INDEX($name): no such index on $schema.$table"))
        (ix, "INDEX")
      case None =>
        if (pk.nonEmpty) (pk, "PK")
        else {
          val notNullUnique = uniqueIndexes.find(_.forall(notNull.contains))
          val anyUnique = uniqueIndexes.headOption
          (keyMode match {
            case WellDefined => notNullUnique
            case AnyUnique => notNullUnique.orElse(anyUnique)
          }) match {
            case Some(ix) => (ix, "UNIQUE")
            case None if rowIdPseudoKey => (Nil, "ROWID") // pseudo-key fallback
            case None => (Nil, "NONE") // keyless (NOKEY)
          }
        }
    }

    // the NUMBER map applies ONLY to NUMBER/DECIMAL columns — a non-
    // numeric column matching a pattern keeps its dictionary type
    val overrides = cols.iterator.filter(c =>
        c.jdbcType == Types.DECIMAL || c.jdbcType == Types.NUMERIC)
      .flatMap(c => NumberMap.resolve(numberOverrides, c.name).map(c.name -> _))
      .toMap

    TableDef(schema, table, cols, keyCols, keyType, overrides)
  }

  /** First-touch cache keyed like the reference's (conId<<32)|objId —
    * here by qualified name; the driver holds one instance.
    *
    * `keyOverrides`: per-table map keyed "SCHEMA.TABLE" (upper-case),
    * the parsed `a2.key.override` list. `numberOverrides`: per-table
    * `a2.map.number.*` entries, pattern → target, in config order.
    */
  final class Cache(conn: Connection, keyMode: KeyMode = WellDefined,
      keyOverrides: Map[String, KeyOverride] = Map.empty,
      numberOverrides: Map[String, Seq[(String, DataType)]] = Map.empty) {
    private val tables = collection.mutable.Map[String, TableDef]()
    def get(schema: String, table: String): TableDef = {
      val qn = s"$schema.$table"
      tables.getOrElseUpdate(qn, readTable(conn, schema, table, keyMode,
        keyOverride = keyOverrides.get(qn.toUpperCase),
        numberOverrides = numberOverrides.getOrElse(qn.toUpperCase, Nil)))
    }
    def loaded: Int = tables.size
  }
}
