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

  case class ColumnDef(name: String, jdbcType: Int, precision: Int,
      scale: Int, nullable: Boolean)
  case class TableDef(schema: String, table: String, columns: Seq[ColumnDef],
      keyCols: Seq[String], keyType: String) {
    def valueSchema: StructType =
      StructType(columns.map(c =>
        StructField(c.name, sparkType(c), c.nullable)))
    def keySchema: StructType = keyType match {
      case "ROWID" => StructType(Seq(StructField("ORA_ROW_ID", StringType, false)))
      case "NONE" => StructType(Nil)
      // fields in keyCols (KEY_SEQ) order, NOT table column order —
      // consumers bind key values positionally against this schema
      case _ => StructType(keyCols.flatMap(k =>
        columns.find(_.name == k)
          .map(c => StructField(c.name, sparkType(c), nullable = false))))
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
      else DecimalType(c.precision, math.max(0, c.scale))
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

  /** `rowIdPseudoKey = false` is the NOKEY override
    * (`a2.key.override=NOKEY`): tables without a usable key become
    * keyless instead of falling back to the ROWID pseudo-key.
    */
  def readTable(conn: Connection, schema: String, table: String,
      keyMode: KeyMode = WellDefined, rowIdPseudoKey: Boolean = true): TableDef = {
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

    lazy val uniqueIndexes: Seq[Seq[String]] = {
      val rs = md.getIndexInfo(null, schema, table, true, false)
      val byIndex = collection.mutable.LinkedHashMap[String,
        collection.mutable.ArrayBuffer[(Short, String)]]()
      while (rs.next()) {
        val idx = rs.getString("INDEX_NAME")
        val colName = rs.getString("COLUMN_NAME")
        if (idx != null && colName != null)
          byIndex.getOrElseUpdate(idx, collection.mutable.ArrayBuffer())
            .append(rs.getShort("ORDINAL_POSITION") -> colName)
      }
      rs.close()
      byIndex.values.map(_.sortBy(_._1).map(_._2).toSeq).toSeq
    }

    val (keyCols, keyType) =
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
          case None => (Nil, "NONE") // keyless (NOKEY override)
        }
      }

    TableDef(schema, table, cols, keyCols, keyType)
  }

  /** First-touch cache keyed like the reference's (conId<<32)|objId —
    * here by qualified name; the driver holds one instance.
    */
  final class Cache(conn: Connection, keyMode: KeyMode = WellDefined) {
    private val tables = collection.mutable.Map[String, TableDef]()
    def get(schema: String, table: String): TableDef =
      tables.getOrElseUpdate(s"$schema.$table", readTable(conn, schema, table, keyMode))
    def loaded: Int = tables.size
  }
}
