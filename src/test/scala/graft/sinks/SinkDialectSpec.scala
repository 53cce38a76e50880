package graft.sinks

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden-string sink SQL tests, mirroring the reference's
  * JdbcSinkCreateTableTest / JdbcSinkSqlInsertTest pattern on a DEPT-like
  * schema (FIXTURES.md §1).
  */
class SinkDialectSpec extends AnyFunSuite {

  private val dept = StructType(Seq(
    StructField("deptno", ByteType, nullable = false),
    StructField("dname", StringType, nullable = true),
    StructField("loc", StringType, nullable = true),
    StructField("budget", DecimalType(12, 2), nullable = true)))
  private val cols = dept.fieldNames.toSeq
  private val keys = Seq("deptno")

  test("postgres upsert = ON CONFLICT DO UPDATE") {
    assert(PostgresDialect.upsertSql("dept", cols, keys) ==
      "INSERT INTO dept (deptno, dname, loc, budget) VALUES (?, ?, ?, ?) " +
        "ON CONFLICT (deptno) DO UPDATE SET dname = EXCLUDED.dname, " +
        "loc = EXCLUDED.loc, budget = EXCLUDED.budget")
  }

  test("mysql upsert = row-alias ON DUPLICATE KEY UPDATE with backticks") {
    // row-alias form: VALUES() is deprecated since MySQL 8.0.20
    assert(MySqlDialect.upsertSql("dept", cols, keys) ==
      "INSERT INTO `dept` (`deptno`, `dname`, `loc`, `budget`) VALUES (?, ?, ?, ?) " +
        "AS nv ON DUPLICATE KEY UPDATE `dname` = nv.`dname`, " +
        "`loc` = nv.`loc`, `budget` = nv.`budget`")
  }

  test("oracle upsert = MERGE INTO ... DUAL") {
    val sql = OracleDialect.upsertSql("dept", cols, keys)
    assert(sql.startsWith("MERGE INTO dept t USING (SELECT ? AS deptno"))
    assert(sql.contains("FROM DUAL"))
    assert(sql.contains("WHEN MATCHED THEN UPDATE SET t.dname = s.dname"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT (deptno, dname, loc, budget)"))
  }

  test("sqlserver upsert = MERGE without DUAL, semicolon-terminated") {
    val sql = SqlServerDialect.upsertSql("dept", cols, keys)
    assert(sql.contains("USING (SELECT ? AS deptno"))
    assert(!sql.contains("DUAL"))
    assert(sql.endsWith(";"))
  }

  test("clickhouse upsert = plain INSERT (ReplacingMergeTree)") {
    assert(ClickHouseDialect.upsertSql("dept", cols, keys) ==
      "INSERT INTO dept (deptno, dname, loc, budget) VALUES (?, ?, ?, ?)")
  }

  test("postgres create table with PK and NOT NULL") {
    assert(PostgresDialect.createTableSql("dept", dept, keys) ==
      """CREATE TABLE IF NOT EXISTS dept (
        |  deptno SMALLINT NOT NULL,
        |  dname TEXT,
        |  loc TEXT,
        |  budget DECIMAL(12,2),
        |  PRIMARY KEY (deptno)
        |)""".stripMargin)
  }

  test("oracle create table uses NUMBER/VARCHAR2 and no IF NOT EXISTS") {
    val sql = OracleDialect.createTableSql("dept", dept, keys)
    assert(sql.startsWith("CREATE TABLE dept"))
    assert(sql.contains("deptno NUMBER(5) NOT NULL"))
    assert(sql.contains("dname VARCHAR2(4000)"))
    assert(sql.contains("budget NUMBER(12,2)"))
  }

  test("clickhouse create table = ReplacingMergeTree with Nullable cols") {
    val sql = ClickHouseDialect.createTableSql("dept", dept, keys)
    assert(sql.contains("deptno Int8"))
    assert(sql.contains("dname Nullable(String)"))
    assert(sql.contains("ENGINE = ReplacingMergeTree ORDER BY (deptno)"))
  }

  test("delete + update + add-column SQL") {
    assert(PostgresDialect.deleteSql("dept", keys) ==
      "DELETE FROM dept WHERE deptno = ?")
    assert(PostgresDialect.updateSql("dept", Seq("dname"), keys) ==
      "UPDATE dept SET dname = ? WHERE deptno = ?")
    assert(PostgresDialect.addColumnSql("dept",
      StructField("hq", BooleanType)) ==
      "ALTER TABLE dept ADD COLUMN hq BOOLEAN")
    // Oracle: parenthesized form, no COLUMN keyword (ORA-01735 otherwise)
    assert(OracleDialect.addColumnSql("dept",
      StructField("hq", IntegerType)) ==
      "ALTER TABLE dept ADD (hq NUMBER(10))")
    // SQL Server: bare ADD, COLUMN keyword is a syntax error
    assert(SqlServerDialect.addColumnSql("dept",
      StructField("hq", BooleanType)) ==
      "ALTER TABLE dept ADD hq BIT")
  }

  test("dialect lookup by name") {
    assert(SinkDialect.forName("postgres") == PostgresDialect)
    assert(SinkDialect.forName("MSSQL") == SqlServerDialect)
    intercept[IllegalArgumentException](SinkDialect.forName("db2"))
  }
}
