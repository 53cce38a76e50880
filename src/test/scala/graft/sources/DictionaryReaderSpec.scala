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

  test("negative-scale NUMBER widens to hold its integer magnitude") {
    // NUMBER(5,-2) stores values up to 9_999_900 — seven digits, not
    // five: the type must be DECIMAL(p - s, 0), never DECIMAL(p, 0)
    assert(sparkType(ColumnDef("X", java.sql.Types.NUMERIC, 5, -2, nullable = true))
      === DecimalType(7, 0))
    assert(sparkType(ColumnDef("X", java.sql.Types.NUMERIC, 3, -10, nullable = true))
      === DecimalType(13, 0))
    // clamped at Spark's 38-digit maximum
    assert(sparkType(ColumnDef("X", java.sql.Types.NUMERIC, 38, -84, nullable = true))
      === DecimalType(38, 0))
  }

  test("key schema: unknown key column errors; nullability follows the column") {
    val cols = Seq(
      ColumnDef("ID", java.sql.Types.BIGINT, 19, 0, nullable = false),
      ColumnDef("ALT", java.sql.Types.VARCHAR, 20, 0, nullable = true))
    // a unique index on a NULLABLE column (the AnyUnique rung): the key
    // field must be nullable too, or serializers crash on the first NULL
    val anyUnique = TableDef("S", "T", cols, Seq("ALT"), "ANY_UNIQUE")
    assert(anyUnique.keySchema.fields.head.nullable)
    val wellDefined = TableDef("S", "T", cols, Seq("ID"), "PRIMARY_KEY")
    assert(!wellDefined.keySchema.fields.head.nullable)
    // a key column that is not a table column (function-based index's
    // hidden expression column) must fail, not silently vanish from the
    // positionally-bound key schema
    val hidden = TableDef("S", "T", cols, Seq("SYS_NC00003$"), "ANY_UNIQUE")
    val ex = intercept[IllegalArgumentException] { hidden.keySchema }
    assert(ex.getMessage.contains("SYS_NC00003$"))
  }

  test("per-table key override: NOKEY, ROWID, INDEX(name) (a2.key.override)") {
    withDb { conn =>
      val st = conn.createStatement()
      st.execute("""CREATE TABLE APP.KO (
        ID BIGINT NOT NULL PRIMARY KEY, GRP INT NOT NULL, NM VARCHAR(10))""")
      // non-unique named index — only reachable via the INDEX() override
      st.execute("CREATE INDEX KO_GRP_IX ON APP.KO(GRP, NM)")

      // the override REPLACES the ladder: the PK is ignored
      val nokey = readTable(conn, "APP", "KO",
        keyOverride = Some(KeyOverride.NoKey))
      assert(nokey.keyType === "NONE" && nokey.keySchema.fields.isEmpty)

      val rowid = readTable(conn, "APP", "KO",
        keyOverride = Some(KeyOverride.RowId))
      assert(rowid.keyType === "ROWID" &&
        rowid.keySchema.fieldNames.toSeq === Seq("ORA_ROW_ID"))

      val named = readTable(conn, "APP", "KO",
        keyOverride = Some(KeyOverride.Index("KO_GRP_IX")))
      assert(named.keyType === "INDEX" && named.keyCols === Seq("GRP", "NM"))
      assert(named.keySchema.fieldNames.toSeq === Seq("GRP", "NM"))

      intercept[IllegalArgumentException] {
        readTable(conn, "APP", "KO",
          keyOverride = Some(KeyOverride.Index("NO_SUCH_IX")))
      }

      // ladder unchanged without an override
      assert(readTable(conn, "APP", "KO").keyType === "PK")
      st.execute("DROP TABLE APP.KO")
    }
  }

  test("key override config list parses (reference form)") {
    val m = KeyOverride.parseMap(
      "SCOTT.DEPT=NOKEY, SCOTT.EMP=ROWID,AP.INVOICES=INDEX(INV_IX)")
    assert(m("SCOTT.DEPT") === KeyOverride.NoKey)
    assert(m("SCOTT.EMP") === KeyOverride.RowId)
    assert(m("AP.INVOICES") === KeyOverride.Index("INV_IX"))
    intercept[IllegalArgumentException] { KeyOverride.parse("PRIMARY") }
  }

  test("per-column NUMBER map overrides the precision split (a2.map.number)") {
    withDb { conn =>
      val st = conn.createStatement()
      st.execute("""CREATE TABLE APP.NM (
        DEPTNO NUMERIC(2) NOT NULL PRIMARY KEY,
        EMPNO NUMERIC(6),
        SAL NUMERIC(8,2),
        NOTE VARCHAR(20))""")
      val overrides = Seq(
        "EMPNO" -> LongType,          // exact: NUMERIC(6) would be Integer
        "%NO" -> ShortType,           // suffix pattern (exact beats it)
        "SAL%" -> DecimalType(38, 2)) // prefix pattern
      val td = readTable(conn, "APP", "NM", numberOverrides = overrides)
      val byName = td.valueSchema.fields.map(f => f.name -> f.dataType).toMap
      assert(byName("EMPNO") === LongType)   // exact wins over %NO
      assert(byName("DEPTNO") === ShortType) // pattern (default: ByteType)
      assert(byName("SAL") === DecimalType(38, 2))
      assert(byName("NOTE") === StringType)  // non-NUMBER never remapped
      // the override follows the column into the key schema
      assert(td.keySchema.fields.head.dataType === ShortType)

      // cache threads per-table overrides through
      val cache = new Cache(conn,
        numberOverrides = Map("APP.NM" -> overrides))
      assert(cache.get("APP", "NM").valueSchema === td.valueSchema)
      st.execute("DROP TABLE APP.NM")
    }
  }

  test("NUMBER map resolution follows reference precedence (exact>prefix>suffix, CS)") {
    import NumberMap.resolve
    // prefix beats suffix even when the suffix entry is listed first
    // (ref `runtime/config/SourceConnectorConfig.java` columnNumberMapping:
    // middle map, then getLeft prefix list, then getRight suffix list)
    val both = Seq("%_ID" -> ShortType, "SAL%" -> LongType)
    assert(resolve(both, "SAL_ID") === Some(LongType))
    // exact beats everything
    assert(resolve(Seq("%NO" -> ShortType, "EMPNO" -> LongType), "EMPNO")
      === Some(LongType))
    // case-sensitive, like the reference's Strings.CS matchers
    assert(resolve(Seq("EMPNO" -> LongType), "empno") === None)
    assert(resolve(Seq("SAL%" -> LongType), "salary") === None)
    // mid-string % (our extension) resolves last
    assert(resolve(Seq("S%Y" -> ShortType), "SALARY") === Some(ShortType))
    assert(resolve(Seq("S%Y" -> ShortType, "SAL%" -> LongType), "SALARY")
      === Some(LongType))
  }

  test("NUMBER map target types parse (reference catalogue)") {
    import NumberMap.parseType
    assert(parseType("BOOLEAN") === BooleanType)
    assert(parseType("byte") === ByteType)
    assert(parseType("SMALLINT") === ShortType)
    assert(parseType("INT") === IntegerType)
    assert(parseType("BIGINT") === LongType)
    assert(parseType("FLOAT") === FloatType)
    assert(parseType("DOUBLE") === DoubleType)
    assert(parseType("DECIMAL(38,2)") === DecimalType(38, 2))
    assert(parseType("NUMERIC(10, 4)") === DecimalType(10, 4))
    // single-arg form is the reference's `DECIMAL([P],S)`: a SCALE with
    // precision defaulting to 38 — NOT standard SQL's DECIMAL(P)
    assert(parseType("DECIMAL(2)") === DecimalType(38, 2))
    assert(parseType("NUMERIC(0)") === DecimalType(38, 0))
    intercept[IllegalArgumentException] { parseType("VARCHAR") }
    // invalid targets fail HERE with the config text, not deep in Spark
    intercept[IllegalArgumentException] { parseType("DECIMAL(39,2)") }
    intercept[IllegalArgumentException] { parseType("DECIMAL(5,6)") }
    intercept[IllegalArgumentException] { parseType("DECIMAL(0,0)") }
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
