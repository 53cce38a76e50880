package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

class NameMappersSpec extends AnyFunSuite {
  import NameMappers._

  test("sanitize fixes first-char and illegal characters") {
    assert(sanitize("DEPT") === "DEPT")
    assert(sanitize("9LIVES") === "_9LIVES")
    assert(sanitize("A-B C$D") === "A_B_C_D")
    assert(sanitize("_ok_1") === "_ok_1")
    assert(sanitize("ümlaut") === "__mlaut")
    intercept[IllegalArgumentException] { sanitize("") }
  }

  test("default topic mapper joins with delimiter and optional prefix") {
    assert(defaultTopic("SCOTT.DEPT") === "SCOTT_DEPT")
    assert(defaultTopic("SCOTT.DEPT", prefix = "cdc") === "cdc_SCOTT_DEPT")
    assert(defaultTopic("PDB1.SCOTT.DEPT", prefix = "p", delimiter = "-")
      === "p-PDB1-SCOTT-DEPT")
  }

  test("flexible mapper picks first wildcard match, falls back to default") {
    val m = Seq(
      "hot" -> Seq("SCOTT.EMP%", "HR.*"),
      "cold" -> Seq("%"))
    assert(flexibleTopic(m, "SCOTT.EMPLOYEES") === "hot")
    assert(flexibleTopic(m, "HR.JOBS") === "hot")
    assert(flexibleTopic(m, "OTHER.T") === "cold")
    assert(flexibleTopic(Nil, "A.B") === "A_B")
  }

  test("RAC partition is THREAD#-1") {
    assert(racPartition(1) === 0)
    assert(racPartition(3) === 2)
    intercept[IllegalArgumentException] { racPartition(0) }
  }

  test("sink table-name mappers") {
    assert(tableFromTopic("cdc_SCOTT_DEPT", "cdc") === "SCOTT_DEPT")
    assert(tableFromTopic("SCOTT_DEPT") === "SCOTT_DEPT")
    assert(tableFromSchemaName("solutions.graft.SCOTT.DEPT") === "DEPT")
    assert(tableFromSchemaName("DEPT") === "DEPT")
  }
}
