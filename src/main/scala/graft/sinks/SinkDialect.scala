package graft.sinks

import org.apache.spark.sql.types._

/** Per-dialect sink SQL generation (SURVEY.md §2.5 K2/K3; reference
  * semantics: `TargetDbSqlUtils.generateSinkSql:363-631` and
  * `createTableSql:207-334`). Re-expressed from the documented SQL
  * dialects (PostgreSQL ON CONFLICT, MySQL ON DUPLICATE KEY, Oracle/SQL
  * Server MERGE, ClickHouse ReplacingMergeTree) — string generation only,
  * so it unit-tests without a database and executes through
  * `JdbcUpsertSink` in foreachBatch.
  */
sealed trait SinkDialect {
  def name: String

  def typeName(dt: DataType): String = dt match {
    case ByteType => "SMALLINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE PRECISION"
    case BooleanType => "BOOLEAN"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => "TEXT"
    case BinaryType => "BYTEA"
    case DateType => "DATE"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case other => throw new IllegalArgumentException(s"unmapped type $other")
  }

  protected def q(ident: String): String = ident

  def createTableSql(table: String, schema: StructType, keyCols: Seq[String]): String = {
    val cols = schema.fields.map { f =>
      val notNull = if (keyCols.contains(f.name) || !f.nullable) " NOT NULL" else ""
      s"${q(f.name)} ${typeName(f.dataType)}$notNull"
    }
    val pk = if (keyCols.nonEmpty)
      Seq(s"PRIMARY KEY (${keyCols.map(q).mkString(", ")})") else Nil
    s"CREATE TABLE IF NOT EXISTS ${q(table)} (\n  " +
      (cols ++ pk).mkString(",\n  ") + "\n)"
  }

  /** ALTER TABLE for schema evolution (K3: add missing columns). */
  def addColumnSql(table: String, field: StructField): String =
    s"ALTER TABLE ${q(table)} ADD COLUMN ${q(field.name)} ${typeName(field.dataType)}"

  def insertSql(table: String, cols: Seq[String]): String =
    s"INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"

  def deleteSql(table: String, keyCols: Seq[String]): String =
    s"DELETE FROM ${q(table)} WHERE " +
      keyCols.map(c => s"${q(c)} = ?").mkString(" AND ")

  def updateSql(table: String, setCols: Seq[String], keyCols: Seq[String]): String =
    s"UPDATE ${q(table)} SET " + setCols.map(c => s"${q(c)} = ?").mkString(", ") +
      " WHERE " + keyCols.map(c => s"${q(c)} = ?").mkString(" AND ")

  def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String

  /** Column bind order for `upsertSql`'s ? placeholders. Default: one
    * placeholder per column in column order. Dialects whose upsert text
    * repeats values (e.g. Derby's MERGE) override.
    */
  def upsertParams(cols: Seq[String], keyCols: Seq[String]): Seq[String] = cols
}

object SinkDialect {
  def forName(name: String): SinkDialect = name.toLowerCase match {
    case "postgresql" | "postgres" => PostgresDialect
    case "mysql" => MySqlDialect
    // MariaDB (any version) and MySQL < 8.0.19 reject the row-alias
    // upsert form — route them to the VALUES() variant
    case "mariadb" | "mysql-legacy" => MySqlLegacyDialect
    case "oracle" => OracleDialect
    case "sqlserver" | "mssql" => SqlServerDialect
    case "clickhouse" => ClickHouseDialect
    case "derby" => DerbyDialect
    case other => throw new IllegalArgumentException(s"unknown dialect $other")
  }
  val all: Seq[SinkDialect] =
    Seq(PostgresDialect, MySqlDialect, MySqlLegacyDialect, OracleDialect,
      SqlServerDialect, ClickHouseDialect, DerbyDialect)
}

/** Apache Derby (embedded) — standard-SQL MERGE via SYSIBM.SYSDUMMY1.
  * Primarily the in-JVM integration-test target for the sink path.
  */
case object DerbyDialect extends SinkDialect {
  val name = "derby"
  override def typeName(dt: DataType): String = dt match {
    case ByteType => "SMALLINT"
    case StringType => "VARCHAR(4000)"
    case BinaryType => "BLOB"
    case DoubleType => "DOUBLE"
    case other => super.typeName(other)
  }
  override def createTableSql(table: String, schema: StructType,
      keyCols: Seq[String]): String =
    super.createTableSql(table, schema, keyCols)
      .replace("CREATE TABLE IF NOT EXISTS", "CREATE TABLE")
  override def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
    val nonKey = cols.filterNot(keyCols.contains)
    val on = keyCols.map(c => s"t.$c = ?").mkString(" AND ")
    val update =
      if (nonKey.isEmpty) ""
      else " WHEN MATCHED THEN UPDATE SET " +
        nonKey.map(c => s"t.$c = ?").mkString(", ")
    s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON $on$update" +
      s" WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})" +
      s" VALUES (${cols.map(_ => "?").mkString(", ")})"
  }
  override def upsertParams(cols: Seq[String], keyCols: Seq[String]): Seq[String] =
    keyCols ++ cols.filterNot(keyCols.contains) ++ cols
}

case object PostgresDialect extends SinkDialect {
  val name = "postgresql"
  override def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
    val nonKey = cols.filterNot(keyCols.contains)
    val updates =
      if (nonKey.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + nonKey.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    insertSql(table, cols) + s" ON CONFLICT (${keyCols.mkString(", ")}) $updates"
  }
}

case object MySqlDialect extends SinkDialect {
  val name = "mysql"
  override def typeName(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case BinaryType => "BLOB"
    case DoubleType => "DOUBLE"
    case BooleanType => "TINYINT(1)"
    case other => super.typeName(other)
  }
  override protected def q(ident: String): String =
    if (ident.contains(".")) ident else s"`$ident`"
  // row-alias form: VALUES(col) in ON DUPLICATE KEY UPDATE is
  // deprecated since MySQL 8.0.20 and slated for removal
  override def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String =
    onDuplicateUpsert(table, cols, keyCols, " AS nv", c => s"nv.${q(c)}")

  /** Shared ON DUPLICATE KEY UPDATE scaffold; `ref` renders the
    * new-value reference (row alias vs legacy VALUES()).
    */
  private[sinks] def onDuplicateUpsert(table: String, cols: Seq[String],
      keyCols: Seq[String], insertSuffix: String, ref: String => String): String = {
    val nonKey = cols.filterNot(keyCols.contains)
    val updates =
      if (nonKey.isEmpty) keyCols.map(c => s"${q(c)} = ${q(c)}").mkString(", ")
      else nonKey.map(c => s"${q(c)} = ${ref(c)}").mkString(", ")
    insertSql(table, cols) + s"$insertSuffix ON DUPLICATE KEY UPDATE $updates"
  }
}

/** MySQL < 8.0.19 and all MariaDB versions: the row-alias form is a
  * syntax error there — this variant emits the classic `VALUES(col)`
  * form (deprecated-but-working on modern MySQL). Pick per server.
  */
case object MySqlLegacyDialect extends SinkDialect {
  val name = "mysql-legacy"
  override def typeName(dt: DataType): String = MySqlDialect.typeName(dt)
  override protected def q(ident: String): String =
    if (ident.contains(".")) ident else s"`$ident`"
  override def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String =
    MySqlDialect.onDuplicateUpsert(table, cols, keyCols, "",
      c => s"VALUES(${q(c)})")
}

case object OracleDialect extends SinkDialect {
  val name = "oracle"
  override def typeName(dt: DataType): String = dt match {
    case ByteType | ShortType => "NUMBER(5)"
    case IntegerType => "NUMBER(10)"
    case LongType => "NUMBER(19)"
    case FloatType => "BINARY_FLOAT"
    case DoubleType => "BINARY_DOUBLE"
    case BooleanType => "NUMBER(1)"
    case d: DecimalType => s"NUMBER(${d.precision},${d.scale})"
    case StringType => "VARCHAR2(4000)"
    case BinaryType => "BLOB"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case other => super.typeName(other)
  }
  override def createTableSql(table: String, schema: StructType,
      keyCols: Seq[String]): String =
    // Oracle has no IF NOT EXISTS before 23ai; the writer probes first
    super.createTableSql(table, schema, keyCols)
      .replace("CREATE TABLE IF NOT EXISTS", "CREATE TABLE")
  override def addColumnSql(table: String, field: StructField): String =
    // ORA-01735: Oracle's form is ADD (col type), no COLUMN keyword
    s"ALTER TABLE ${q(table)} ADD (${q(field.name)} ${typeName(field.dataType)})"
  override def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
    val nonKey = cols.filterNot(keyCols.contains)
    val src = cols.map(c => s"? AS $c").mkString(", ")
    val on = keyCols.map(c => s"t.$c = s.$c").mkString(" AND ")
    val update =
      if (nonKey.isEmpty) ""
      else " WHEN MATCHED THEN UPDATE SET " +
        nonKey.map(c => s"t.$c = s.$c").mkString(", ")
    s"MERGE INTO $table t USING (SELECT $src FROM DUAL) s ON ($on)$update" +
      s" WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})" +
      s" VALUES (${cols.map(c => s"s.$c").mkString(", ")})"
  }
}

case object SqlServerDialect extends SinkDialect {
  val name = "sqlserver"
  override def typeName(dt: DataType): String = dt match {
    case StringType => "NVARCHAR(MAX)"
    case BinaryType => "VARBINARY(MAX)"
    case DoubleType => "FLOAT"
    case BooleanType => "BIT"
    case TimestampType | TimestampNTZType => "DATETIME2"
    case other => super.typeName(other)
  }
  override def addColumnSql(table: String, field: StructField): String =
    // SQL Server rejects the COLUMN keyword: ALTER TABLE t ADD col type
    s"ALTER TABLE ${q(table)} ADD ${q(field.name)} ${typeName(field.dataType)}"
  override def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
    val nonKey = cols.filterNot(keyCols.contains)
    val src = cols.map(c => s"? AS $c").mkString(", ")
    val on = keyCols.map(c => s"t.$c = s.$c").mkString(" AND ")
    val update =
      if (nonKey.isEmpty) ""
      else " WHEN MATCHED THEN UPDATE SET " +
        nonKey.map(c => s"t.$c = s.$c").mkString(", ")
    s"MERGE INTO $table t USING (SELECT $src) s ON ($on)$update" +
      s" WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})" +
      s" VALUES (${cols.map(c => s"s.$c").mkString(", ")});"
  }
}

case object ClickHouseDialect extends SinkDialect {
  val name = "clickhouse"
  override def typeName(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case BooleanType => "UInt8"
    case d: DecimalType => s"Decimal(${d.precision},${d.scale})"
    case StringType => "String"
    case BinaryType => "String"
    case DateType => "Date"
    case TimestampType | TimestampNTZType => "DateTime64(6)"
    case other => super.typeName(other)
  }
  override def createTableSql(table: String, schema: StructType,
      keyCols: Seq[String]): String = {
    val cols = schema.fields.map { f =>
      val t = typeName(f.dataType)
      val wrapped = if (f.nullable && !keyCols.contains(f.name)) s"Nullable($t)" else t
      s"${f.name} $wrapped"
    }
    s"CREATE TABLE IF NOT EXISTS $table (\n  ${cols.mkString(",\n  ")}\n)" +
      s" ENGINE = ReplacingMergeTree ORDER BY (${keyCols.mkString(", ")})"
  }
  /** ReplacingMergeTree: upsert == insert; dedup at merge time. */
  override def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String =
    insertSql(table, cols)
  /** Lightweight delete (ClickHouse ≥ 23.3; `DELETE FROM` is a
    * row-granular mutation there). High-delete CDC feeds should prefer
    * an is_deleted/version column on the ReplacingMergeTree instead —
    * this statement exists so correctness holds, not as the fast path.
    */
  override def deleteSql(table: String, keyCols: Seq[String]): String =
    super.deleteSql(table, keyCols)
}
