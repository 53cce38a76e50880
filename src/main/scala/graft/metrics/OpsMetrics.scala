package graft.metrics

import java.lang.management.ManagementFactory
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong, LongAdder}
import javax.management.ObjectName

/** Operational MBeans beyond the stream-progress metrics
  * ([[CdcStreamMetrics]]): initial-load progress and source/miner
  * connection management, mirroring the reference's
  * `jmx/OraCdcInitialLoad.java` and `jmx/OraCdcSourceConnMgmt.java`
  * surfaces. Same consumption path as the reference: any JMX console
  * or exporter reads them off the platform MBean server.
  */
trait InitialLoadMetricsMBean {
  def getStartTimeMillis: Long
  def getElapsedTimeMillis: Long
  /** rows landed at the sink (send side complete) */
  def getProcessedRowsCount: Long
  def getProcessedTableCount: Int
  /** tables whose bounded SELECT is currently running */
  def getCurrentSelectTableList: Array[String]
  /** tables whose sink write is currently running */
  def getCurrentSendTableList: Array[String]
  /** most recent first, capped at 500 like the reference */
  def getLastProcessedTables: Array[String]
  def getSelectedRowsCount: Long
  def getSqlSelectTimeMillis: Long
  def getSendTimeMillis: Long
  def getRowsPerSecond: Double
}

/** Progress of the S8 initial load (bounded per-table snapshot ∪
  * change stream). The load driver brackets each table's two phases —
  * the bounded SELECT and the sink write — exactly like the
  * reference's load worker brackets its JDBC selects and Kafka sends
  * (`OraCdcInitialLoad.java:149-221`); [[timedLoad]] packages the
  * bracketing for the common select-then-send shape.
  */
class InitialLoadMetrics(name: String)
    extends InitialLoadMetricsMBean {

  private val start = System.currentTimeMillis()
  private val selecting = ConcurrentHashMap.newKeySet[String]()
  private val sending = ConcurrentHashMap.newKeySet[String]()
  private val done = new java.util.concurrent.ConcurrentLinkedDeque[String]()
  private val doneCount = new AtomicInteger(0)
  private val selectedRows = new LongAdder
  private val sentRows = new LongAdder
  private val selectMs = new LongAdder
  private val sendMs = new LongAdder

  val objectName: ObjectName =
    new ObjectName(s"graft.cdc:type=initial-load,name=$name")

  def install(): InitialLoadMetrics = {
    val mbs = ManagementFactory.getPlatformMBeanServer
    if (mbs.isRegistered(objectName)) mbs.unregisterMBean(objectName)
    mbs.registerMBean(this, objectName)
    this
  }

  def uninstall(): Unit = {
    val mbs = ManagementFactory.getPlatformMBeanServer
    if (mbs.isRegistered(objectName)) mbs.unregisterMBean(objectName)
  }

  def startSelectTable(fqn: String): Unit = selecting.add(fqn)
  def finishSelectTable(fqn: String, rows: Long, millis: Long): Unit = {
    selecting.remove(fqn)
    selectedRows.add(rows)
    selectMs.add(millis)
  }
  def startSendTable(fqn: String): Unit = sending.add(fqn)
  def finishSendTable(fqn: String, rows: Long, millis: Long): Unit = {
    sending.remove(fqn)
    sentRows.add(rows)
    sendMs.add(millis)
    done.addFirst(fqn)
    // cap like the reference's Last500ProcessedTables
    if (doneCount.incrementAndGet() > 500) { done.pollLast(); doneCount.decrementAndGet() }
  }

  /** Bracket the common select-then-send load of one table: `select`
    * builds (and by counting, materializes) the bounded snapshot;
    * `send` lands it. Counts/timings flow to the MBean even when the
    * send throws (the table stays on the in-flight list — visible as
    * stuck, the operational signal the lists exist for).
    */
  def timedLoad[T](fqn: String)(select: => (Long, T))(send: T => Unit): Unit = {
    startSelectTable(fqn)
    val t0 = System.nanoTime()
    val (rows, payload) = select
    finishSelectTable(fqn, rows, (System.nanoTime() - t0) / 1000000L)
    startSendTable(fqn)
    val t1 = System.nanoTime()
    send(payload)
    finishSendTable(fqn, rows, (System.nanoTime() - t1) / 1000000L)
  }

  override def getStartTimeMillis: Long = start
  override def getElapsedTimeMillis: Long = System.currentTimeMillis() - start
  override def getProcessedRowsCount: Long = sentRows.sum()
  override def getProcessedTableCount: Int = doneCount.get()
  override def getCurrentSelectTableList: Array[String] =
    selecting.toArray(Array.empty[String]).sorted
  override def getCurrentSendTableList: Array[String] =
    sending.toArray(Array.empty[String]).sorted
  override def getLastProcessedTables: Array[String] = {
    val it = done.iterator()
    val b = Array.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
  override def getSelectedRowsCount: Long = selectedRows.sum()
  override def getSqlSelectTimeMillis: Long = selectMs.sum()
  override def getSendTimeMillis: Long = sendMs.sum()
  override def getRowsPerSecond: Double = {
    val ms = selectMs.sum() + sendMs.sum()
    if (ms <= 0) 0.0 else sentRows.sum() * 1000.0 / ms
  }
}

trait ShipmentMetricsMBean {
  def getStartTimeMillis: Long
  def getElapsedTimeMillis: Long
  def getProcessedFilesCount: Int
  def getProcessedBytesCount: Long
  def getProcessedMiB: Double
  def getLastProcessedFile: String
  def getMiBPerSecond: Double
}

/** Redo-shipment throughput surface (`jmx/OraCdcRedoShipment.java`):
  * files/bytes shipped and MiB/s since the agent started, read
  * straight off a [[graft.redo.ShipmentServer]]'s counters. Register
  * one per agent: `new ShipmentMetrics("standby1", server).install()`.
  */
class ShipmentMetrics(name: String, server: graft.redo.ShipmentServer)
    extends ShipmentMetricsMBean {
  private val start = System.currentTimeMillis()

  val objectName: ObjectName =
    new ObjectName(s"graft.cdc:type=redo-shipment,name=$name")

  def install(): ShipmentMetrics = {
    val mbs = ManagementFactory.getPlatformMBeanServer
    if (mbs.isRegistered(objectName)) mbs.unregisterMBean(objectName)
    mbs.registerMBean(this, objectName)
    this
  }

  def uninstall(): Unit = {
    val mbs = ManagementFactory.getPlatformMBeanServer
    if (mbs.isRegistered(objectName)) mbs.unregisterMBean(objectName)
  }

  override def getStartTimeMillis: Long = start
  override def getElapsedTimeMillis: Long = System.currentTimeMillis() - start
  override def getProcessedFilesCount: Int = server.filesShipped.get()
  override def getProcessedBytesCount: Long = server.bytesShipped.get()
  override def getProcessedMiB: Double =
    server.bytesShipped.get() / (1024.0 * 1024.0)
  override def getLastProcessedFile: String = server.lastShippedFile
  override def getMiBPerSecond: Double = {
    val secs = getElapsedTimeMillis / 1000.0
    if (secs <= 0) 0.0 else getProcessedMiB / secs
  }
}

trait SourceConnMetricsMBean {
  def getTablesInProcessing: Array[String]
  def getTablesInProcessingCount: Int
  def getLastProcessedRedoLog: String
  def getLast100ProcessedRedoLogs: Array[String]
  def getLastProcessedScn: Long
  def getLastProcessedSequence: Long
  def getProcessedRedoLogsCount: Int
  /** data records whose table failed the P1 scope filter. Counted
    * where the pruning happens (the partition reader), so on a real
    * cluster this is a PER-EXECUTOR number surfaced by each executor's
    * JMX; local[] — one JVM — reads the exact total.
    */
  def getTableOutOfScopeCount: Long
}

/** Miner connection-management surface (`OraCdcSourceConnMgmt`): which
  * tables the source is scoped to, and which redo logs the stream has
  * MINED — updated when the DSv2 stream plans a batch's logs into
  * input partitions, the reference's setNowProcessed /
  * addAlreadyProcessed moment.
  */
class SourceConnMetrics private (name: String)
    extends SourceConnMetricsMBean {

  @volatile private var tables: Seq[String] = Nil
  private val processed = new java.util.concurrent.ConcurrentLinkedDeque[String]()
  private val processedCount = new AtomicInteger(0)
  private val committedTotal = new LongAdder
  private val lastScn = new AtomicLong(0L)
  private val lastSeq = new AtomicLong(Long.MinValue)
  @volatile private var lastLog: String = ""

  val objectName: ObjectName =
    new ObjectName(s"graft.cdc:type=source-conn,name=$name")

  def scopedTo(t: Seq[String]): SourceConnMetrics = { tables = t; this }

  /** Report logs just planned for mining: (fileName, seq, nextScn). */
  def logsMined(files: Seq[(String, Int, Long)]): Unit =
    files.sortBy(_._2).foreach { case (f, seq, scn) =>
      processed.addFirst(f)
      if (processedCount.incrementAndGet() > 100) {
        processed.pollLast(); processedCount.decrementAndGet()
      }
      lastLog = f
      if (seq > lastSeq.get()) lastSeq.set(seq)
      lastScn.getAndUpdate(s => math.max(s, scn))
      committedTotal.increment()
    }

  override def getTablesInProcessing: Array[String] = tables.toArray
  override def getTablesInProcessingCount: Int = tables.size
  override def getLastProcessedRedoLog: String = lastLog
  override def getLast100ProcessedRedoLogs: Array[String] = {
    val it = processed.iterator()
    val b = Array.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }
  override def getLastProcessedScn: Long = lastScn.get()
  override def getLastProcessedSequence: Long = {
    val s = lastSeq.get()
    if (s == Long.MinValue) -1L else s
  }
  override def getProcessedRedoLogsCount: Int = committedTotal.sum().toInt
  override def getTableOutOfScopeCount: Long =
    SourceConnMetrics.outOfScopeFor(name)
}

object SourceConnMetrics {
  private val registry = new ConcurrentHashMap[String, SourceConnMetrics]()
  // per-JVM out-of-scope counters, fed from the partition readers —
  // keyed by metrics name so two scoped miners in one JVM don't mix
  private val outOfScope = new ConcurrentHashMap[String, LongAdder]()

  /** Get-or-create the named instance and (re-)register its MBean. */
  def forName(name: String): SourceConnMetrics =
    registry.computeIfAbsent(name, { n =>
      val m = new SourceConnMetrics(n)
      val mbs = ManagementFactory.getPlatformMBeanServer
      if (mbs.isRegistered(m.objectName)) mbs.unregisterMBean(m.objectName)
      mbs.registerMBean(m, m.objectName)
      m
    })

  def markOutOfScope(name: String): Unit =
    outOfScope.computeIfAbsent(name, _ => new LongAdder).increment()

  private[metrics] def outOfScopeFor(name: String): Long =
    Option(outOfScope.get(name)).map(_.sum()).getOrElse(0L)
}
