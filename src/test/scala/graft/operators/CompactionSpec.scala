package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", false)
    .appName("compaction-spec").getOrCreate()

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet"))

  test("compaction shrinks file count, preserves rows, sizes by target") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    // accrete 40 tiny files — the micro-batch-per-file shape
    (1 to 40).foreach { b =>
      (1L to 500L).map(i => (b.toLong * 10000 + i, s"row$i"))
        .toDF("id", "payload")
        .coalesce(1).write.mode("append").parquet(s"$base/small")
    }
    val src = spark.read.parquet(s"$base/small")
    assert(parquetFiles(s"$base/small").size >= 40)
    val inBytes = Compaction.inputBytes(src)
    assert(inBytes > 0, "input size must come from the file index")
    // target a quarter of the input per file → ~4 output files
    val n = Compaction.compact(src, s"$base/big", targetFileBytes = inBytes / 4)
    assert(n >= 3 && n <= 5, s"expected ~4 target-sized files, got $n")
    assert(parquetFiles(s"$base/big").size == n)
    val out = spark.read.parquet(s"$base/big")
    assert(out.count() == 40 * 500)
    assert(out.agg(sum("id")).head.getLong(0) ==
      src.agg(sum("id")).head.getLong(0))
  }

  test("clustered compaction keeps range-disjoint files") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compactc").toString
    (1L to 20000L).map(i => ((i * 2654435761L) % 100000, i))
      .toDF("k", "v")
      .repartition(20).write.mode("overwrite").parquet(s"$base/src")
    val src = spark.read.parquet(s"$base/src")
    Compaction.compact(src, s"$base/dst",
      targetFileBytes = Compaction.inputBytes(src) / 4,
      clusterBy = Some("k"))
    // per-file min/max of k must not overlap (range partitioning)
    val ranges = parquetFiles(s"$base/dst").map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min("k"), max("k")).head
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._1,
        s"overlapping key ranges across files: $a vs $b")
      case _ =>
    }
  }
}
