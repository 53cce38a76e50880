package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DictionaryReader._

class DictionaryReaderSpec extends AnyFunSuite {

  private def withDb(f: java.sql.Connection => Unit): Unit = {
    val conn = DriverManager.getConnection(
      "jdbc:derby:memory:dicttest;create=true")
    try f(conn) finally conn.close()
  }

  test("PK table: columns, types, key ladder picks the PK") {
    withDb { conn =>
      val st = conn.createStatement()
      st.execute("""CREATE TABLE APP.DEPT (
        DEPTNO NUMERIC(2) NOT NULL PRIMARY KEY,
        DNAME VARCHAR(14),
        BUDGET NUMERIC(12,2),
        HIRED TIMESTAMP,
        ACTIVE BOOLEAN NOT NULL)""")
      val td = readTable(conn, "APP", "DEPT")
      assert(td.keyType === "PK" && td.keyCols === Seq("DEPTNO"))
      assert(td.valueSchema === StructType(Seq(
        StructField("DEPTNO", ByteType, nullable = false),
        StructField("DNAME", StringType),
        StructField("BUDGET", DecimalType(12, 2)),
        StructField("HIRED", TimestampNTZType),
        StructField("ACTIVE", BooleanType, nullable = false))))
      assert(td.keySchema === StructType(Seq(
        StructField("DEPTNO", ByteType, nullable = false))))
      st.execute("DROP TABLE APP.DEPT")
    }
  }

  test("no PK: well_defined requires a NOT-NULL unique index") {
    withDb { conn =>
      val st = conn.createStatement()
      st.execute("""CREATE TABLE APP.T1 (
        A BIGINT NOT NULL, B VARCHAR(10), C INT)""")
      st.execute("CREATE UNIQUE INDEX T1_UA ON APP.T1(A)")
      val td = readTable(conn, "APP", "T1")
      assert(td.keyType === "UNIQUE" && td.keyCols === Seq("A"))

      st.execute("""CREATE TABLE APP.T2 (A BIGINT, B VARCHAR(10))""")
      st.execute("CREATE UNIQUE INDEX T2_UA ON APP.T2(A)") // nullable col
      val well = readTable(conn, "APP", "T2", WellDefined)
      assert(well.keyType === "ROWID" && well.keyCols.isEmpty)
      assert(well.keySchema.fieldNames.toSeq === Seq("ORA_ROW_ID"))
      val any = readTable(conn, "APP", "T2", AnyUnique)
      assert(any.keyType === "UNIQUE" && any.keyCols === Seq("A"))
      st.execute("DROP TABLE APP.T1")
      st.execute("DROP TABLE APP.T2")
    }
  }

  test("unconstrained NUMERIC (precision 0) maps to the scale-less fallback") {
    assert(sparkType(ColumnDef("X", java.sql.Types.NUMERIC, 0, 0, nullable = true))
      === DoubleType)
    assert(sparkType(ColumnDef("X", java.sql.Types.DECIMAL, 0, 0, nullable = true))
      === DoubleType)
  }

  test("keyless table falls back to ROWID pseudo-key; cache loads once") {
    withDb { conn =>
      val st = conn.createStatement()
      st.execute("CREATE TABLE APP.KL (X INT, Y VARCHAR(5))")
      // NOKEY override: no pseudo-key, genuinely keyless
      val none = readTable(conn, "APP", "KL", WellDefined, rowIdPseudoKey = false)
      assert(none.keyType === "NONE" && none.keySchema.fields.isEmpty)
      val cache = new Cache(conn)
      val td = cache.get("APP", "KL")
      assert(td.keyType === "ROWID")
      assert(cache.get("APP", "KL") eq td) // cached instance
      assert(cache.loaded === 1)
      intercept[IllegalArgumentException] { cache.get("APP", "MISSING") }
      st.execute("DROP TABLE APP.KL")
    }
  }
}
