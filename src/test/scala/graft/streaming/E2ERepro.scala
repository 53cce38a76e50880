package graft.streaming

// Temporary flake-hunt harness (not a ScalaTest suite): loops the
// EndToEndPipelineSpec pipeline in one JVM to bound the failure rate.
// Run: tools/run.sh streaming.E2ERepro <iterations>
import java.io.File
import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.cdc.{Ops, RedoRecord}
import graft.redo.RedoLogWriter
import graft.sinks.{DerbyDialect, JdbcUpsertSink}

object E2ERepro {
  private def rr(scn: Long, xid: String, op: Int, rowId: String,
      after: Map[String, String] = Map.empty): RedoRecord =
    RedoRecord(scn, 0, xid, op, if (after.isEmpty) "" else "T.ACCTS", rowId,
      rollback = false, scn, Map.empty, after)

  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 20
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    var failures = 0
    (1 to iters).foreach { it =>
      val dir = Files.createTempDirectory(s"e2e_rep$it").toFile
      val f1 = Seq(
        rr(1, "A", Ops.Insert, "r1", Map("k" -> "1", "v" -> "a1")),
        rr(2, "B", Ops.Insert, "r3", Map("k" -> "3", "v" -> "b1")),
        rr(3, "A", Ops.Insert, "r2", Map("k" -> "2", "v" -> "a2")),
        rr(4, "B", Ops.Commit, ""))
      val f2 = Seq(
        rr(5, "A", Ops.Update, "r1", Map("k" -> "1", "v" -> "a1v2")),
        rr(6, "C", Ops.Insert, "r4", Map("k" -> "4", "v" -> "c1")),
        rr(7, "A", Ops.Commit, ""),
        rr(8, "C", Ops.Rollback, ""))
      Seq((1, f1), (2, f2)).foreach { case (seq, recs) =>
        val w = new RedoLogWriter(new File(dir, s"log_$seq.grl"), 1024, seq = seq)
        recs.foreach(w.append)
        w.close()
      }
      val url = s"jdbc:derby:memory:rep$it;create=true"
      DriverManager.getConnection(url).close()
      val records = spark.readStream.format("graft-redo")
        .option("maxFilesPerTrigger", 1)
        .load(dir.getAbsolutePath)
        .as[RedoRecord]
      val sink = JdbcUpsertSink(url, "ACCTS", keyCols = Seq("K"),
        dialect = DerbyDialect, opCol = "op",
        orderCols = Seq("commitScn", "scn"))
      val q = ChangeStreams.assembleStream(records)
        .toDF()
        .select(element_at(col("after"), "k").cast("int").as("K"),
          element_at(col("after"), "v").as("V"),
          col("op"), col("commitScn"), col("scn"))
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory(s"e2e_rck$it").toFile.getAbsolutePath)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          sink.writeBatch(df)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(300000), "timeout")
      val conn = DriverManager.getConnection(url)
      val rs = conn.createStatement()
        .executeQuery("SELECT K, V FROM ACCTS ORDER BY K")
      val got = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getInt(1), r.getString(2))).toList
      conn.close()
      val want = List((1, "a1v2"), (2, "a2"), (3, "b1"))
      if (got != want) { failures += 1; println(s"iter $it MISMATCH: $got") }
      else println(s"iter $it ok")
    }
    println(s"failures: $failures / $iters")
    spark.stop()
  }
}
