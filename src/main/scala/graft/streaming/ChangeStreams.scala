package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.cdc._

/** Spark wrappers around the pure transaction assembler (SURVEY.md §2.2
  * T1/T2: XID grouping + commit/rollback resolution).
  *
  * Batch: `groupByKey(xid).flatMapGroups` — one shuffle on xid, then each
  * transaction assembles independently. At 100 TB the shuffle is keyed by
  * transaction id, so parallelism scales with concurrent transactions
  * (millions), never with table size, and no single task sees more than
  * one transaction's statements.
  *
  * Streaming: `flatMapGroupsWithState` — state per open XID holds the
  * statement buffer (reference: off-heap MMF queues, T10 — here the state
  * store gives spill + checkpoint for free). Changes are emitted only
  * when the COMMIT control record arrives; ROLLBACK clears state with no
  * emission, so uncommitted data is never decoded downstream — the same
  * "deferred work until commit" optimization the reference hand-built.
  */
object ChangeStreams {

  /** Batch assembly of a bounded change set. */
  def assembleBatch(records: Dataset[RedoRecord],
      opts: TransactionAssembler.Options = TransactionAssembler.DefaultOptions)
      : Dataset[EmittedChange] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.groupByKey(_.xid).flatMapGroups { (_, it) =>
      TransactionAssembler.assemble(
        it.toSeq.sortBy(r => (r.scn, r.ssn)), opts).iterator
    }
  }

  /** Streaming assembly: buffers per open transaction, emits at commit.
    * Use with OutputMode.Append. State lives until COMMIT/ROLLBACK or the
    * idle timeout (abandoned transactions are dropped like the
    * reference's restart bookkeeping would skip them).
    *
    * PRODUCTION: set `idleTimeoutMs` (e.g. 30 min) so transactions whose
    * terminal record is lost don't pin state forever. The default is 0
    * (no timeout) because a registered processing-time timeout makes the
    * engine run continuous no-data micro-batches to evaluate it — the
    * right setting is workload-specific, not a library default.
    *
    * XIDs are REUSED across transactions (Oracle recycles undo slots), so
    * one micro-batch may carry records past a COMMIT: each terminal
    * record closes exactly the records up to it, and the remainder stays
    * buffered as the next transaction — a later ROLLBACK must never
    * retroactively discard an earlier committed transaction.
    */
  def assembleStream(records: Dataset[RedoRecord],
      opts: TransactionAssembler.Options = TransactionAssembler.DefaultOptions,
      idleTimeoutMs: Long = 0L): Dataset[EmittedChange] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.groupByKey(_.xid)
      .flatMapGroupsWithState[Seq[RedoRecord], EmittedChange](
        OutputMode.Append,
        if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout) {
        (xid: String, it: Iterator[RedoRecord], state: GroupState[Seq[RedoRecord]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val buffered = (state.getOption.getOrElse(Seq.empty) ++ it)
              .sortBy(r => (r.scn, r.ssn))
            // emit one assembled transaction per terminal record, in order
            val out = collection.mutable.ArrayBuffer[EmittedChange]()
            var rest = buffered
            var terminalIdx = rest.indexWhere(r =>
              r.op == Ops.Commit || r.op == Ops.Rollback)
            while (terminalIdx >= 0) {
              val (txn, tail) = rest.splitAt(terminalIdx + 1)
              out ++= TransactionAssembler.assemble(txn, opts)
              rest = tail
              terminalIdx = rest.indexWhere(r =>
                r.op == Ops.Commit || r.op == Ops.Rollback)
            }
            if (rest.isEmpty) state.remove()
            else {
              state.update(rest)
              if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            }
            out.iterator
          }
      }
  }
}
