package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Methodology:
  *  - queries execute through the `noop` DSv2 sink, which materializes
  *    every output row — `.count()` would let Catalyst prune the very
  *    projections under test (codec roundtrips, envelope shaping);
  *  - a table-scan warmup runs first so parquet footers / FS cache / JIT
  *    are warm and timings reflect steady-state execution, not JVM start;
  *  - queries run in sorted name order for run-to-run comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }

    // JIT/codegen warmup: exercise shuffle, the noop sink and the custom
    // codegen kernels on a tiny slice so the FIRST timed query measures
    // steady-state execution, not Janino/JVM compilation (measured ~7 s
    // absorbed by whichever query sorts first otherwise).
    try {
      import org.apache.spark.sql.functions._
      import graft.functions.TextFunctions._
      spark.read.parquet(s"$sfDir/documents.parquet").limit(512)
        .select(col("doc_id"), explode(shingleHashes(tokens(col("text")), 2)).as("s"))
        .groupBy(col("s")).count().orderBy(desc("count"), col("s")).limit(10)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    // dev loop: SPARK_GRAFT_ONLY=a,b,c restricts the run to named queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a broken query must be visible in the bench output (-1 marker),
      // never recorded as a suspiciously fast wall time
      val res = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          name -> -1.0
      }
      // per-query isolation: reclaim blocks a query materialized and did
      // not unpersist (iterative checkpoints, shared-subtree persists) so
      // storage-memory pressure never bleeds into later queries' timings
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      res
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = results.map(_._2).filter(_ >= 0).sum
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
