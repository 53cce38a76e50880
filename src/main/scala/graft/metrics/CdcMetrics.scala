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

class CdcStreamMetrics(name: String)
    extends StreamingQueryListener with CdcStreamMetricsMBean {

  private val totalRows = new LongAdder
  private val batches = new LongAdder
  private val procMs = new LongAdder
  private val inputSecs = new DoubleAdder
  private val lastBatch = new AtomicLong(-1L)
  @volatile private var lastRate: Double = 0.0

  val objectName: ObjectName =
    new ObjectName(s"graft.cdc:type=stream-metrics,name=$name")

  /** Register the MBean + the listener in one call. */
  def install(spark: org.apache.spark.sql.SparkSession): CdcStreamMetrics = {
    val mbs = ManagementFactory.getPlatformMBeanServer
    if (mbs.isRegistered(objectName)) mbs.unregisterMBean(objectName)
    mbs.registerMBean(this, objectName)
    spark.streams.addListener(this)
    this
  }

  def uninstall(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.streams.removeListener(this)
    val mbs = ManagementFactory.getPlatformMBeanServer
    if (mbs.isRegistered(objectName)) mbs.unregisterMBean(objectName)
  }

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    totalRows.add(p.numInputRows)
    batches.increment()
    lastBatch.set(p.batchId)
    lastRate = p.processedRowsPerSecond
    val trigger = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    procMs.add(trigger)
    // floor at 1 ms: sub-millisecond batches must still grow the
    // denominator, or fast streams read as rate 0 / inflated
    inputSecs.add(math.max(trigger, 1L) / 1000.0)
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
