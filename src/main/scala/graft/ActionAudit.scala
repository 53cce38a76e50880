package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-gate action/job audit — the receipt generator behind the
  * BASELINE.md job-floor analysis: for each named gate it runs the
  * query once (untimed sf0.001 codegen pre-run first, like Bench) and
  * reports how many Spark JOBS the timed run launched and the wall it
  * took. Jobs ≈ driver-side actions + AQE's per-query-stage
  * materializations, i.e. the per-job overhead floor a sub-second
  * oracle comparison is really measuring.
  *
  *   tools/run.sh ActionAudit /root/testdata/sf0.1 pipe_curate,retr_rrf
  */
object ActionAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        Tables.autoSplitBytes(sfDir, cpus.toInt))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })

    val prewarm = new java.io.File(
      new java.io.File(sfDir).getParentFile, "sf0.001")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (prewarm.isDirectory)
        try fn(spark, prewarm.toString)
          .write.format("noop").mode("overwrite").save()
        catch { case scala.util.control.NonFatal(_) => () }
      Thread.sleep(300) // let queued listener events drain
      jobs.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[audit] $name%-14s jobs=${jobs.get()}%3d wall=$wall%6.2f s")
    }
    spark.stop()
  }
}
