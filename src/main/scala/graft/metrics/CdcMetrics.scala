package graft.metrics

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.{AtomicLong, DoubleAdder, LongAdder}
import javax.management.ObjectName

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** JMX metrics mirroring the reference's connector MBean surface
  * (`doc/JMX-METRICS.adoc:44-104` — ParsePerSecond, TotalRecordsCount,
  * ProcessedRedoLogsSizeGb et al., MBean
  * `solutions.a2.oracdc:type=...-metrics`). Here the numbers come from
  * Structured Streaming's progress events instead of a bespoke worker:
  * register the listener and the same operational questions ("how many
  * records, how fast, is it keeping up") are answerable from any JMX
  * client at `graft.cdc:type=stream-metrics,name=<name>`.
  */
trait CdcStreamMetricsMBean {
  def getTotalRecordsCount: Long
  def getBatchesCompleted: Long
  def getLastBatchId: Long
  /** avg input rows/sec over the batches seen — ParsePerSecond analogue */
  def getParsePerSecond: Double
  /** last batch's processed rows/sec */
  def getLastBatchRowsPerSecond: Double
  /** total wall ms spent in batch processing (triggerExecution) */
  def getProcessingTimeMsTotal: Long
}

/** @param queryName when set, only progress events of the streaming
  *   query with that name (`.queryName(...)`) are counted — REQUIRED
  *   whenever the session runs more than one query, or the per-name
  *   MBean silently aggregates every query's numbers (including stray
  *   debug sinks). None keeps the count-everything behavior for
  *   single-query sessions.
  */
class CdcStreamMetrics(name: String, queryName: Option[String] = None)
    extends StreamingQueryListener with CdcStreamMetricsMBean {

  private val totalRows = new LongAdder
  private val batches = new LongAdder
  private val procMs = new LongAdder
  private val inputSecs = new DoubleAdder
  private val lastBatch = new AtomicLong(-1L)
  @volatile private var lastRate: Double = 0.0
  @volatile private var installedOn: org.apache.spark.sql.SparkSession = _

  val objectName: ObjectName =
    new ObjectName(s"graft.cdc:type=stream-metrics,name=$name")

  /** Register the MBean + the listener in one call. Re-installing a
    * same-named metrics instance uninstalls the previous one's LISTENER
    * too (the MBean alone was replaced before, leaking one listener —
    * each processing every event — per restart on a long-lived
    * session). */
  def install(spark: org.apache.spark.sql.SparkSession): CdcStreamMetrics = {
    val prev = CdcStreamMetrics.installed.put(name, this)
    if (prev != null && (prev ne this) && prev.installedOn != null)
      prev.installedOn.streams.removeListener(prev)
    installedOn = spark
    val mbs = ManagementFactory.getPlatformMBeanServer
    if (mbs.isRegistered(objectName)) mbs.unregisterMBean(objectName)
    mbs.registerMBean(this, objectName)
    spark.streams.addListener(this)
    this
  }

  def uninstall(spark: org.apache.spark.sql.SparkSession): Unit = {
    CdcStreamMetrics.installed.remove(name, this)
    spark.streams.removeListener(this)
    val mbs = ManagementFactory.getPlatformMBeanServer
    if (mbs.isRegistered(objectName)) mbs.unregisterMBean(objectName)
  }

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    if (queryName.forall(_ == p.name)) {
      batches.increment()
      lastBatch.set(p.batchId)
      lastRate = p.processedRowsPerSecond
      val trigger = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue()).getOrElse(0L)
      procMs.add(trigger)
      // ParsePerSecond measures ACTIVE parse rate: idle zero-row
      // progress events (emitted every ~10 s on a quiet stream) must
      // not grow the denominator, or a night of idling decays the
      // reported rate toward zero — the reference's ParsePerSecond
      // counts parse time only
      if (p.numInputRows > 0) {
        totalRows.add(p.numInputRows)
        // floor at 1 ms: sub-millisecond batches must still grow the
        // denominator, or fast streams read as rate 0 / inflated
        inputSecs.add(math.max(trigger, 1L) / 1000.0)
      }
    }
  }

  override def getTotalRecordsCount: Long = totalRows.sum()
  override def getBatchesCompleted: Long = batches.sum()
  override def getLastBatchId: Long = lastBatch.get()
  override def getParsePerSecond: Double = {
    val secs = inputSecs.sum()
    if (secs <= 0) 0.0 else totalRows.sum() / secs
  }
  override def getLastBatchRowsPerSecond: Double = lastRate
  override def getProcessingTimeMsTotal: Long = procMs.sum()
}

object CdcStreamMetrics {
  /** name → currently-installed instance, so a re-install can remove
    * the previous listener (see [[CdcStreamMetrics.install]]). */
  private val installed =
    new java.util.concurrent.ConcurrentHashMap[String, CdcStreamMetrics]()
}
