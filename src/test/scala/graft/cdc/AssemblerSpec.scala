package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.TransactionAssembler.{assemble, Options}

/** Transaction-assembly semantics (SURVEY.md §2.2 T1–T6, §2.3 P3–P5).
  * Scenario structure mirrors the reference's rollback/binding test
  * intent (PartialRollback_Test, OraCdcRollbackZeroRows) on our model.
  */
class AssemblerSpec extends AnyFunSuite {

  private def chg(scn: Long, op: Int, rowId: String,
      before: Map[String, String] = Map.empty,
      after: Map[String, String] = Map.empty,
      rollback: Boolean = false, xid: String = "tx1") =
    RedoRecord(scn, 0, xid, op, "T", rowId, rollback, scn * 1000, before, after)

  private def commit(scn: Long, xid: String = "tx1") =
    RedoRecord(scn, 0, xid, Ops.Commit, "", "", rollback = false, 0, Map.empty, Map.empty)

  private def rollbackTxn(scn: Long, xid: String = "tx1") =
    RedoRecord(scn, 0, xid, Ops.Rollback, "", "", rollback = false, 0, Map.empty, Map.empty)

  test("emission is deferred to commit; commitScn stamped") {
    val recs = Seq(
      chg(10, Ops.Insert, "r1", after = Map("c" -> "1")),
      chg(11, Ops.Update, "r2", after = Map("c" -> "2")),
      commit(20))
    val out = assemble(recs)
    assert(out.map(_.scn) == Seq(10, 11))
    assert(out.forall(_.commitScn == 20))
  }

  test("uncommitted transaction emits nothing") {
    assert(assemble(Seq(chg(10, Ops.Insert, "r1"))) == Nil)
  }

  test("rolled-back transaction emits nothing (zero-rows)") {
    val recs = Seq(
      chg(10, Ops.Insert, "r1"), chg(11, Ops.Delete, "r2"), rollbackTxn(12))
    assert(assemble(recs) == Nil)
  }

  test("partial rollback cancels nearest prior change with same rowId") {
    val recs = Seq(
      chg(10, Ops.Insert, "r1", after = Map("c" -> "1")),
      chg(11, Ops.Insert, "r2", after = Map("c" -> "2")),
      chg(12, Ops.Delete, "r2", rollback = true), // cancels scn=11
      commit(20))
    val out = assemble(recs)
    assert(out.map(_.scn) == Seq(10))
  }

  test("chained partial rollbacks pair in reverse (stack order)") {
    val recs = Seq(
      chg(10, Ops.Update, "rA", after = Map("c" -> "1")),
      chg(11, Ops.Update, "rA", after = Map("c" -> "2")),
      chg(12, Ops.Update, "rA", rollback = true), // cancels scn=11
      chg(13, Ops.Update, "rA", rollback = true), // cancels scn=10
      commit(20))
    assert(assemble(recs).isEmpty)
  }

  test("unmatched partial rollback is dropped, rest emits") {
    val recs = Seq(
      chg(10, Ops.Insert, "r1", after = Map("c" -> "1")),
      chg(12, Ops.Update, "rX", rollback = true), // no pair
      commit(20))
    assert(assemble(recs).map(_.scn) == Seq(10))
  }

  test("multi-row insert expands with incrementing ssn (T6)") {
    val rows = Seq(Map("c" -> "1"), Map("c" -> "2"), Map("c" -> "3"))
    val recs = Seq(
      RedoRecord(10, 5, "tx1", Ops.MultiInsert, "T", "r", rollback = false,
        0, Map.empty, Map.empty, rows),
      commit(20))
    val out = assemble(recs)
    assert(out.map(_.ssn) == Seq(5, 6, 7))
    assert(out.forall(_.op == Ops.Insert))
    assert(out.map(_.after("c")) == Seq("1", "2", "3"))
  }

  test("direct-loaded block expands to INSERTs with synthesized rowIds (T7)") {
    val rows = Seq(Map("c" -> "1"), Map("c" -> "2"), Map("c" -> "3"))
    val recs = Seq(
      RedoRecord(10, 2, "tx1", Ops.DirectLoad, "T", "4711", rollback = false,
        0, Map.empty, Map.empty, rows),
      commit(20))
    val out = assemble(recs)
    assert(out.forall(_.op == Ops.Insert))
    assert(out.map(_.rowId) == Seq("4711.0", "4711.1", "4711.2"))
    assert(out.map(_.ssn) == Seq(2, 3, 4))
    assert(out.map(_.after("c")) == Seq("1", "2", "3"))
    assert(out.forall(_.before.isEmpty)) // no undo on direct path
    assert(out.forall(_.commitScn == 20))
  }

  test("rolled-back direct load emits nothing (T7)") {
    val recs = Seq(
      RedoRecord(10, 0, "tx1", Ops.DirectLoad, "T", "1", rollback = false,
        0, Map.empty, Map.empty, Seq(Map("c" -> "1"))),
      rollbackTxn(20))
    assert(assemble(recs) == Nil)
  }

  test("multi-row delete expands to before-images (T6)") {
    val rows = Seq(Map("c" -> "1"), Map("c" -> "2"))
    val recs = Seq(
      RedoRecord(10, 0, "tx1", Ops.MultiDelete, "T", "r", rollback = false,
        0, Map.empty, Map.empty, rows),
      commit(20))
    val out = assemble(recs)
    assert(out.forall(_.op == Ops.Delete))
    assert(out.map(_.before("c")) == Seq("1", "2"))
  }

  test("no-op update dropped only when emitAllUpdates=false (P3)") {
    val noop = chg(10, Ops.Update, "r1",
      before = Map("c" -> "1"), after = Map("c" -> "1"))
    val real = chg(11, Ops.Update, "r2",
      before = Map("c" -> "1"), after = Map("c" -> "2"))
    val recs = Seq(noop, real, commit(20))
    assert(assemble(recs).map(_.scn) == Seq(10, 11))
    assert(assemble(recs, Options(emitAllUpdates = false)).map(_.scn) == Seq(11))
  }

  test("delete pruned to key columns when allColsOnDelete=false (P4)") {
    val recs = Seq(
      chg(10, Ops.Delete, "r1", before = Map("id" -> "7", "c" -> "x")),
      commit(20))
    val out = assemble(recs, Options(allColsOnDelete = false, keyCols = Seq("id")))
    assert(out.head.before == Map("id" -> "7"))
  }

  test("keyless delete skipped when skipKeylessDelete=true (P5)") {
    val recs = Seq(
      chg(10, Ops.Delete, "r1", before = Map("c" -> "x")),
      chg(11, Ops.Insert, "r2", after = Map("c" -> "y")),
      commit(20))
    val out = assemble(recs, Options(skipKeylessDelete = true))
    assert(out.map(_.op) == Seq(Ops.Insert))
  }

  test("P4/P5 delete options apply to QMD-expanded rows too") {
    val rows = Seq(Map("id" -> "7", "c" -> "x"), Map("id" -> "8", "c" -> "y"))
    val qmd = RedoRecord(10, 0, "tx1", Ops.MultiDelete, "T", "r",
      rollback = false, 0, Map.empty, Map.empty, rows)
    val recs = Seq(qmd, commit(20))
    // P4: expanded before-images pruned to key columns
    val pruned = assemble(recs,
      Options(allColsOnDelete = false, keyCols = Seq("id")))
    assert(pruned.map(_.before) == Seq(Map("id" -> "7"), Map("id" -> "8")))
    // P5: a keyless QMD delete is skipped like a keyless DRP delete
    assert(assemble(recs, Options(skipKeylessDelete = true)) == Nil)
  }

  test("rollback-flagged LOB chunk retracts the pending chunks (T8)") {
    def lob(scn: Long, data: String, rb: Boolean = false) =
      RedoRecord(scn, 0, "tx1", Ops.LobChunk, "T", "", rollback = rb, 0,
        Map.empty, Map("lobId" -> "L1", "data" -> data))
    val row = chg(14, Ops.Insert, "r1",
      after = Map("doc" -> s"${TransactionAssembler.LobRef}L1"))
    val out = assemble(Seq(
      lob(10, "AAA"), lob(11, "", rb = true), lob(12, "BBB"), lob(13, "CCC"),
      row, commit(20)))
    // the rolled-back AAA chunk must not contaminate the resolved value
    assert(out.head.after("doc") == "BBBCCC")
  }

  test("session-audit record stamps every emitted change (P7)") {
    val fields = Map("username" -> "SCOTT", "osUsername" -> "oracle",
      "hostname" -> "db01", "auditSessionId" -> "4242")
    val audit = RedoRecord(5, 0, "tx1", Ops.Audit, "", "",
      rollback = false, 0, Map.empty, fields)
    val out = assemble(Seq(audit,
      chg(10, Ops.Insert, "r1", after = Map("c" -> "1")),
      chg(11, Ops.Update, "r2", after = Map("c" -> "2")),
      commit(12)))
    assert(out.size == 2 && out.forall(_.audit === fields))
    // audit records themselves never emit
    assert(!out.exists(_.op == Ops.Audit))
  }

  test("audit capture is position-independent and absent-audit means empty") {
    val audit = RedoRecord(11, 0, "tx1", Ops.Audit, "", "",
      rollback = false, 0, Map.empty, Map("username" -> "U"))
    // audit arrives AFTER the data change it must stamp
    val out = assemble(Seq(
      chg(10, Ops.Insert, "r1", after = Map("c" -> "1")), audit, commit(12)))
    assert(out.head.audit("username") == "U")
    val bare = assemble(Seq(
      chg(10, Ops.Insert, "r1", after = Map("c" -> "1")), commit(12)))
    assert(bare.head.audit.isEmpty)
  }

  test("key-update collapse: one-statement DELETE+INSERT becomes one UPDATE (10.30 semantics)") {
    // row moved (IOT key update, ref Op10_30_Test.java): new rowId, so
    // pairing demands one wire statement — same SCN, consecutive ssn,
    // adjacent. The UPDATE carries the delete's before-image, the
    // insert's after-image and the NEW rowId.
    val recs = Seq(
      RedoRecord(10, 0, "tx1", Ops.Delete, "T", "rOld", rollback = false,
        0, Map("id" -> "3", "d" -> "old"), Map.empty),
      RedoRecord(10, 1, "tx1", Ops.Insert, "T", "rNew", rollback = false,
        0, Map.empty, Map("id" -> "3", "d" -> "new")),
      commit(20))
    val out = assemble(recs, Options(collapseKeyUpdates = true))
    assert(out.map(_.op) == Seq(Ops.Update))
    assert(out.head.before("d") == "old" && out.head.after("d") == "new")
    assert(out.head.rowId == "rNew" && out.head.scn == 10)
    // default options keep the raw pair (GRL1 writers emit UPDATEs
    // directly, so collapsing is opt-in)
    assert(assemble(recs).map(_.op) == Seq(Ops.Delete, Ops.Insert))
  }

  test("key-update collapse: unrelated same-SCN rows never mis-pair") {
    // DELETE row A + INSERT row B under one SCN (e.g. DELETE +
    // INSERT..SELECT): different rowIds AND non-consecutive ssn → the
    // pair must survive as-is, not corrupt into a fake UPDATE
    val recs = Seq(
      RedoRecord(10, 0, "tx1", Ops.Delete, "T", "rA", rollback = false,
        0, Map("k" -> "a"), Map.empty),
      RedoRecord(10, 2, "tx1", Ops.Insert, "T", "rB", rollback = false,
        0, Map.empty, Map("k" -> "b")),
      commit(20))
    val out = assemble(recs, Options(collapseKeyUpdates = true))
    assert(out.map(_.op) == Seq(Ops.Delete, Ops.Insert))
  }

  test("key-update collapse pairs same-rowId across interleaved other-table changes") {
    // one statement (SCN 10) touching two tables via a trigger: the
    // other-table record between the halves must not break the pair
    val recs = Seq(
      RedoRecord(10, 0, "tx1", Ops.Delete, "T", "r1", rollback = false,
        0, Map("k" -> "1"), Map.empty),
      RedoRecord(10, 1, "tx1", Ops.Insert, "OTHER.T", "rX", rollback = false,
        0, Map.empty, Map("z" -> "9")), // interleaved, different table
      RedoRecord(10, 2, "tx1", Ops.Insert, "T", "r1", rollback = false,
        0, Map.empty, Map("k" -> "2")), // same rowId + SCN → pair
      chg(13, Ops.Delete, "r7", before = Map("k" -> "7")),
      chg(14, Ops.Insert, "r9", after = Map("k" -> "9")),  // different rowId+stmt → no pair
      commit(20))
    val out = assemble(recs, Options(collapseKeyUpdates = true))
    assert(out.map(r => (r.op, r.table)) == Seq(
      (Ops.Update, "T"), (Ops.Insert, "OTHER.T"), (Ops.Delete, "T"),
      (Ops.Insert, "T")))
    val upd = out.head
    assert(upd.before("k") == "1" && upd.after("k") == "2")
  }

  test("key-update collapse: same rowId across DIFFERENT SCNs never pairs (slot reuse)") {
    // Oracle reuses row slots: DELETE(row A) then a later statement's
    // INSERT(row B) on the recycled rowid must survive as-is — the
    // SCN-bound samePlace leg refuses the cross-statement pair
    val recs = Seq(
      chg(10, Ops.Delete, "r1", before = Map("k" -> "a")),
      chg(12, Ops.Insert, "r1", after = Map("k" -> "b")),
      commit(20))
    val out = assemble(recs, Options(collapseKeyUpdates = true))
    assert(out.map(_.op) == Seq(Ops.Delete, Ops.Insert))
  }

  test("key-update collapse: a same-table change between the halves blocks pairing") {
    // DELETE r1, then an unrelated same-table insert, then INSERT r1:
    // the intervening same-table record means these are separate
    // statements — no collapse
    val recs = Seq(
      chg(10, Ops.Delete, "r1", before = Map("k" -> "1")),
      chg(11, Ops.Insert, "r5", after = Map("k" -> "5")),
      chg(12, Ops.Insert, "r1", after = Map("k" -> "2")),
      commit(20))
    val out = assemble(recs, Options(collapseKeyUpdates = true))
    assert(out.map(_.op) == Seq(Ops.Delete, Ops.Insert, Ops.Insert))
  }

  test("key-update collapse respects partial rollback (cancelled insert never pairs)") {
    val recs = Seq(
      chg(10, Ops.Delete, "r1", before = Map("k" -> "1")),
      chg(11, Ops.Insert, "r1", after = Map("k" -> "2")),
      chg(12, Ops.Insert, "r1", rollback = true), // cancels the insert
      commit(20))
    val out = assemble(recs, Options(collapseKeyUpdates = true))
    assert(out.map(_.op) == Seq(Ops.Delete))
  }

  test("partial rollback pairs on (table, rowId) — a cross-table rowId coincidence never cancels") {
    // rowIds are producer strings in this model; T1 and T2 can carry the
    // same string. The rollback of T2's insert must cancel T2's, never
    // T1's change that happens to share the rowId
    def tchg(scn: Long, table: String, op: Int, rowId: String,
        after: Map[String, String] = Map.empty, rollback: Boolean = false) =
      RedoRecord(scn, 0, "tx1", op, table, rowId, rollback, scn * 1000,
        Map.empty, after)
    val recs = Seq(
      tchg(10, "T2", Ops.Insert, "r5", after = Map("c" -> "t2")),
      tchg(11, "T1", Ops.Insert, "r5", after = Map("c" -> "t1")),
      tchg(12, "T2", Ops.Delete, "r5", rollback = true), // cancels scn=10
      commit(20))
    val out = assemble(recs)
    assert(out.map(c => (c.table, c.scn)) == Seq(("T1", 11L)))
  }

  test("QMD-expanded delete before-images resolve LOB markers like single-row deletes") {
    val lobRef = TransactionAssembler.LobRef + "42"
    val chunk = RedoRecord(9, 0, "tx1", Ops.LobChunk, "T", "", rollback = false,
      0, Map.empty, Map("lobId" -> "42", "data" -> "lob-content"))
    val qmd = RedoRecord(10, 0, "tx1", Ops.MultiDelete, "T", "r1",
      rollback = false, 0, Map.empty, Map.empty,
      multiRows = Seq(Map("k" -> "1", "doc" -> lobRef)))
    val single = chg(11, Ops.Delete, "r2",
      before = Map("k" -> "2", "doc" -> lobRef))
    val out = assemble(Seq(chunk, qmd, single, commit(20)))
    assert(out.length == 2)
    // the invariant: identical resolution whether batched or single
    assert(out(0).before("doc") == "lob-content")
    assert(out(1).before("doc") == "lob-content")
  }

  test("in-place LOB update is never dropped as a no-op (equal locators prove nothing)") {
    val lobRef = TransactionAssembler.LobRef + "77"
    val chunk = RedoRecord(9, 0, "tx1", Ops.LobChunk, "T", "", rollback = false,
      0, Map.empty, Map("lobId" -> "77", "data" -> "new-content"))
    val upd = chg(10, Ops.Update, "r1",
      before = Map("doc" -> lobRef), after = Map("doc" -> lobRef))
    val out = assemble(Seq(chunk, upd, commit(20)),
      Options(emitAllUpdates = false))
    assert(out.map(_.op) == Seq(Ops.Update),
      "P3 must not eliminate an update whose images carry LOB markers")
    assert(out.head.after("doc") == "new-content")
    // a genuinely no-op update (no LOB columns) still drops
    val plain = chg(10, Ops.Update, "r1",
      before = Map("c" -> "1"), after = Map("c" -> "1"))
    assert(assemble(Seq(plain, commit(20)),
      Options(emitAllUpdates = false)) == Nil)
  }

  test("a data record sharing (scn, ssn) with the commit belongs to that transaction") {
    // the orderKey tie-break: data before terminals — without it, the
    // stable sort preserves arrival order and the same input can land
    // the row in the NEXT transaction on one run and this one on another
    val data = chg(20, Ops.Insert, "r1", after = Map("c" -> "1"))
    val c = commit(20)
    Seq(Seq(data, c), Seq(c, data)).foreach { arrival =>
      val sorted = arrival.sortBy(TransactionAssembler.orderKey).toIndexedSeq
      val (out, remainder) =
        TransactionAssembler.assembleSegments(sorted, Options())
      assert(out.map(_.scn) == Seq(20), s"arrival order $arrival")
      assert(remainder.isEmpty)
    }
  }
}
