package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
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
  * Streaming: `transformWithState` with an append-only ListState per open
  * XID (reference: off-heap MMF queues, T10 — here the RocksDB state
  * store gives spill + checkpoint for free). A micro-batch WITHOUT a
  * terminal record appends its statements to the list in O(batch) state
  * IO — the buffered prefix is neither deserialized nor rewritten, so a
  * multi-GiB batch transaction (the reference's `OffHeapMmf` nightmare
  * case) costs each micro-batch only its own increment. The one full
  * materialize + sort happens at COMMIT/ROLLBACK, once per transaction.
  * Changes are emitted only at commit; rollback clears state with no
  * emission, so uncommitted data is never decoded downstream — the same
  * "deferred work until commit" optimization the reference hand-built.
  */
object ChangeStreams {

  /** Batch assembly of a bounded change set.
    *
    * The per-group buffer is bounded by the largest single transaction
    * (not the table): acceptable for the bounded gates and batch
    * backfills this entry point serves. An unbounded stream with
    * multi-GiB transactions belongs on [[assembleStream]], whose list
    * state spills through RocksDB instead of the task heap.
    */
  def assembleBatch(records: Dataset[RedoRecord],
      opts: TransactionAssembler.Options = TransactionAssembler.DefaultOptions)
      : Dataset[EmittedChange] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.groupByKey(_.xid).flatMapGroups { (_, it) =>
      val buf = collection.mutable.ArrayBuffer.empty[RedoRecord]
      it.foreach(buf += _)
      buf.sortInPlaceBy(TransactionAssembler.orderKey)
      // split at terminals (xid reuse) through the SHARED segmentation —
      // one implementation for batch and streaming, so the semantics
      // (and the data-before-terminal tie-break) cannot drift. The open
      // remainder is dropped: assemble() emits nothing for it anyway.
      TransactionAssembler.assembleSegments(buf, opts)._1.iterator
    }
  }

  /** Streaming assembly: buffers per open transaction, emits at commit.
    * Use with OutputMode.Append and the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`), which `transformWithState`
    * requires and which large transactions need for spill anyway.
    *
    * PRODUCTION: set `idleTimeoutMs` (e.g. 30 min) so transactions whose
    * terminal record is lost don't pin state forever. The default is 0
    * (no timers) because the right horizon is workload-specific, not a
    * library default.
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
      .transformWithState(
        new TxnAssemblyProcessor(opts, idleTimeoutMs),
        if (idleTimeoutMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }
}

/** Per-XID stateful processor: append-only statement log + idle timer.
  *
  * State layout:
  *  - `log` (ListState[RedoRecord]): statements of the currently-open
  *    transaction, in arrival order. Append-only between terminals —
  *    never rewritten, never sorted per batch. LOB chunk records (26.x)
  *    ride this same list, so an out-of-row LOB written across many
  *    micro-batches resolves at the commit batch (T8; ref
  *    `OraCdcTransaction.java:1991-2263` buffers LOBs with the
  *    transaction for the same reason) — LobAssemblySpec proves a LOB
  *    spanning 3 micro-batches.
  *  - `deadline` (ValueState[Long]): the registered idle-timer instant,
  *    so the previous timer can be deleted when activity arrives.
  *
  * On a terminal-bearing batch the whole log is read ONCE, sorted by
  * (scn, ssn), split at each terminal (xid reuse), assembled, and the
  * open remainder re-written — i.e. sorting cost is paid per transaction,
  * not per micro-batch, and state IO for a transaction of n statements
  * arriving over b batches is O(n + b·increment), not O(n·b).
  */
private[streaming] class TxnAssemblyProcessor(
    opts: TransactionAssembler.Options,
    idleTimeoutMs: Long)
  extends StatefulProcessor[String, RedoRecord, EmittedChange] {

  @transient private var log: ListState[RedoRecord] = _
  @transient private var deadline: ValueState[Long] = _
  @transient private var evicted: ValueState[Boolean] = _
  @transient private lazy val logger =
    org.slf4j.LoggerFactory.getLogger(classOf[TxnAssemblyProcessor])

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    log = getHandle.getListState("log", Encoders.product[RedoRecord], TTLConfig.NONE)
    if (idleTimeoutMs > 0) {
      deadline = getHandle.getValueState("deadline",
        Encoders.scalaLong, TTLConfig.NONE)
      evicted = getHandle.getValueState("evicted",
        Encoders.scalaBoolean, TTLConfig.NONE)
    }
  }

  override def handleInputRows(xid: String, rows: Iterator[RedoRecord],
      timerValues: TimerValues): Iterator[EmittedChange] = {
    val incoming = rows.toArray
    val out: Iterator[EmittedChange] =
      if (!incoming.exists(TransactionAssembler.isTerminal)) {
        // fast path: pure append, buffered prefix untouched
        if (incoming.nonEmpty) log.appendList(incoming)
        Iterator.empty
      } else {
        val all = (log.get() ++ incoming.iterator).toArray
        java.util.Arrays.sort(all,
          Ordering.by(TransactionAssembler.orderKey))
        log.clear()
        // an EVICTED transaction's first terminal must not assemble: the
        // buffered prefix is gone, and emitting the surviving tail would
        // publish a silent partial transaction (records DELAYED, not
        // lost). Drop the whole first segment loudly instead; in the
        // real xid model a genuinely new transaction on a recycled undo
        // slot carries a fresh sequence (a new key), so the segment
        // being dropped is the abandoned transaction's.
        val work =
          if (idleTimeoutMs > 0 && evicted.exists() && evicted.get()) {
            val cut = all.indexWhere(TransactionAssembler.isTerminal) + 1
            logger.warn(s"txn $xid: dropping ${cut} late records closed by " +
              "the first terminal after idle eviction — the buffered " +
              "prefix was already discarded, a partial emit would " +
              "violate transaction atomicity")
            evicted.clear()
            all.drop(cut)
          } else all
        val (o, remainder) = TransactionAssembler.assembleSegments(work, opts)
        if (remainder.nonEmpty) log.appendList(remainder.toArray)
        o.iterator
      }
    if (idleTimeoutMs > 0) {
      // timer maintenance LAST, from the now-known open/drained state:
      // arming at entry then clearing on a fully-draining commit batch
      // (the common case) would pay register+delete churn per
      // transaction on the RocksDB store
      val open = log.exists()
      if (open) {
        if (deadline.exists()) getHandle.deleteTimer(deadline.get())
        val at = timerValues.getCurrentProcessingTimeInMs() + idleTimeoutMs
        getHandle.registerTimer(at)
        deadline.update(at)
      } else if (deadline.exists()) {
        getHandle.deleteTimer(deadline.get())
        deadline.clear()
      }
    }
    out
  }

  override def handleExpiredTimer(xid: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[EmittedChange] = {
    // abandoned transaction: no terminal inside the idle window. The
    // buffered prefix is discarded (the reference's restart bookkeeping
    // skips stale XIDs the same way), but a TOMBSTONE records the
    // eviction so a late-arriving tail + terminal cannot silently
    // assemble into a partial transaction — handleInputRows drops that
    // first segment with a warning instead.
    val buffered = log.exists()
    log.clear()
    deadline.clear()
    if (buffered) {
      evicted.update(true)
      logger.warn(s"txn $xid: idle ${idleTimeoutMs} ms with no terminal — " +
        "buffered statements evicted; a late terminal for this " +
        "transaction will be dropped, not partially emitted")
    }
    Iterator.empty
  }
}
