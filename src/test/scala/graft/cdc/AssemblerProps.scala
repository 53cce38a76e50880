package graft.cdc

import org.scalacheck.{Gen, Prop, Properties, Test}
import Prop.forAll
import graft.cdc.TransactionAssembler.{assemble, Options}

/** Property fuzzing for the opt-in key-update collapse (SURVEY §2.2 T5,
  * `Options.collapseKeyUpdates`) over randomly interleaved transactions —
  * the reference exercises its 10.30/10.35 chain assembly with
  * `Op10_30_Test.java`/`Op10_35_Test.java` and the 1939-line
  * `PartialRollback_Test.java`; the collapse here is new hand-written
  * adjacency logic (SCN-bound same-rowId leg, one-statement moved-row
  * leg, cancelled-entry skips), so it earns trust by surviving generated
  * interleavings, not just the five example scenarios in AssemblerSpec.
  *
  * The load-bearing invariant: collapsing never changes the transaction's
  * NET ROW EFFECT. Every emitted change contributes (removed
  * before-image | added after-image) deltas — DELETE removes, INSERT
  * adds, UPDATE does both — and a DELETE+INSERT pair rewritten into one
  * UPDATE contributes exactly the same deltas. So for ANY pairing the
  * collapse chooses (right or wrong), the per-table delta multisets must
  * match the uncollapsed run's. The example specs pin WHICH pairs form;
  * these properties pin that no pairing can corrupt the row images.
  */
object AssemblerProps extends Properties("Assembler") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(1000)

  private val tables = Seq("T1", "T2")
  private val rowIds = Seq("r1", "r2", "r3")

  private def img(tag: String, n: Int): Map[String, String] =
    Map("k" -> s"$tag$n", "v" -> s"v$n")

  /** One transaction: 0-12 row changes over 2 tables × 3 rowIds with
    * clustered SCNs (several records share an SCN, like multi-row
    * statements do), ~15% rollback-flagged records, then a commit.
    * Records arrive in (scn, ssn) order — the assemble() precondition.
    */
  private val genTxn: Gen[Seq[RedoRecord]] = for {
    n <- Gen.choose(0, 12)
    ops <- Gen.listOfN(n, Gen.frequency(
      4 -> Gen.const(Ops.Insert), 4 -> Gen.const(Ops.Delete),
      2 -> Gen.const(Ops.Update)))
    tabs <- Gen.listOfN(n, Gen.oneOf(tables))
    rids <- Gen.listOfN(n, Gen.oneOf(rowIds))
    // clustered SCNs: each record either stays on the previous SCN or
    // advances — exercises same-SCN adjacency, the collapse's trigger
    advance <- Gen.listOfN(n, Gen.frequency(2 -> Gen.const(0), 3 -> Gen.const(1)))
    rb <- Gen.listOfN(n, Gen.frequency(17 -> Gen.const(false), 3 -> Gen.const(true)))
  } yield {
    var scn = 10L
    var ssn = 0
    val recs = (0 until n).map { i =>
      if (advance(i) == 1) { scn += 1; ssn = 0 } else ssn += 1
      RedoRecord(scn, ssn, "tx", ops(i), tabs(i), rids(i), rb(i),
        scn * 1000, img("b", i), img("a", i))
    }
    recs :+ RedoRecord(scn + 1, 0, "tx", Ops.Commit, "", "",
      rollback = false, 0, Map.empty, Map.empty)
  }

  /** Per-table (removed before-images, added after-images) delta
    * multisets of an emitted change stream.
    */
  private def deltas(out: Seq[EmittedChange])
      : Map[String, (Map[Map[String, String], Int], Map[Map[String, String], Int])] =
    out.groupBy(_.table).view.mapValues { cs =>
      val removed = cs.collect {
        case c if c.op == Ops.Delete || c.op == Ops.Update => c.before
      }
      val added = cs.collect {
        case c if c.op == Ops.Insert || c.op == Ops.Update => c.after
      }
      (removed.groupBy(identity).view.mapValues(_.size).toMap,
        added.groupBy(identity).view.mapValues(_.size).toMap)
    }.toMap

  private val on = Options(collapseKeyUpdates = true)

  property("collapse never changes the net row effect") =
    forAll(genTxn) { recs =>
      deltas(assemble(recs, on)) == deltas(assemble(recs))
    }

  property("collapse only merges: op counts shift DELETE+INSERT -> UPDATE, total shrinks by pairs") =
    forAll(genTxn) { recs =>
      val off = assemble(recs)
      val o = assemble(recs, on)
      val pairs = off.size - o.size
      val cnt = (s: Seq[EmittedChange], op: Int) => s.count(_.op == op)
      pairs >= 0 &&
        cnt(o, Ops.Delete) == cnt(off, Ops.Delete) - pairs &&
        cnt(o, Ops.Insert) == cnt(off, Ops.Insert) - pairs &&
        cnt(o, Ops.Update) == cnt(off, Ops.Update) + pairs
    }

  property("collapse never crosses a cancelled entry (rollback runs identically)") =
    forAll(genTxn) { recs =>
      // a rollback-flagged record cancels the same prior change whether
      // or not collapsing runs afterwards: the uncollapsed DELETE count
      // plus INSERT count of the ON run's inputs must account for every
      // pair — equivalently, the net-effect equality above restricted
      // to transactions that actually contain rollback records
      val hasRb = recs.exists(_.rollback)
      !hasRb || deltas(assemble(recs, on)) == deltas(assemble(recs))
    }

  property("keyCols guards BOTH legs: mismatched keys never collapse, matched behave like keyless") =
    forAll(genTxn) { recs =>
      // img() keys every image "k" -> "b$i"/"a$i" with i unique per
      // record, so delete-before and insert-after NEVER agree on "k":
      // with keyCols set the collapse must not fire at all, on either
      // the same-rowId leg or the moved-row leg
      val keyed = assemble(recs, Options(collapseKeyUpdates = true,
        keyCols = Seq("k")))
      val off = assemble(recs)
      keyed.map(c => (c.op, c.table, c.rowId, c.before, c.after)) ==
        off.map(c => (c.op, c.table, c.rowId, c.before, c.after))
    }

  property("absent key columns disable the collapse instead of licensing it") =
    forAll(genTxn) { recs =>
      // strip "k" from every image: None == None must NOT count as key
      // agreement, so a keyCols run over keyless images behaves exactly
      // like collapse-off
      val keyless = recs.map(r => r.copy(
        before = r.before - "k", after = r.after - "k"))
      val keyed = assemble(keyless, Options(collapseKeyUpdates = true,
        keyCols = Seq("k")))
      val off = assemble(keyless)
      keyed.map(c => (c.op, c.table, c.rowId, c.before, c.after)) ==
        off.map(c => (c.op, c.table, c.rowId, c.before, c.after))
    }

  property("collapse is idempotent: re-assembling the emitted stream changes nothing") =
    forAll(genTxn) { recs =>
      val once = assemble(recs, on)
      // reconstruct a record stream from the emitted changes (statement
      // coordinates, images and rowIds survive emission) and re-run
      val replay = once.map(c => RedoRecord(c.scn, c.ssn, c.xid, c.op,
        c.table, c.rowId, rollback = false, c.tsMicros, c.before, c.after)) :+
        RedoRecord(once.map(_.scn).maxOption.getOrElse(10L) + 1, 0, "tx",
          Ops.Commit, "", "", rollback = false, 0, Map.empty, Map.empty)
      val twice = assemble(replay, on)
      twice.map(c => (c.op, c.table, c.rowId, c.before, c.after)) ==
        once.map(c => (c.op, c.table, c.rowId, c.before, c.after))
    }
}
