package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.RedoRecord
import graft.redo.RedoLogWriter
import graft.streaming.ChangeStreams

/** Correctness gate for the `graft-redo` DSv2 source (SURVEY.md §2.1
  * S1/S2/S5 + §7.2's end-to-end slice): the change stream is serialized
  * to binary GRL1 redo logs (distributed — each partition writes its own
  * log file, the per-redo-THREAD# analogue), then read back through the
  * DataSource V2 scan (block checksums, multi-block reassembly, topology
  * listing) and assembled to committed changes. The DuckDB oracle states
  * the expected emission from the raw events — so the ENTIRE pipeline
  * (encode → block write → scan → parse → txn assembly) is verified, not
  * just the assembler.
  */
object SourceQueries {

  /** Serialize the sf-dir's deterministic change stream as GRL logs. */
  private def writeRedoLogs(s: SparkSession, dir: String, nThreads: Int): String = {
    val out = new File(Files.createTempDirectory("graft_redo_gate").toFile,
      "logs")
    out.mkdirs()
    val path = out.getAbsolutePath
    CdcQueries.redoRecords(s, dir)
      .repartition(nThreads, col("xid"))
      .foreachPartition { (it: Iterator[RedoRecord]) =>
        val pid = TaskContext.getPartitionId()
        val w = new RedoLogWriter(new File(path, f"log_$pid%03d.grl"),
          blockSize = 1024, seq = pid + 1, thread = 0)
        try it.foreach(w.append) finally w.close()
      }
    path
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_redo_source_assembly" -> ((s, dir) => {
      import s.implicits._
      val logDir = writeRedoLogs(s, dir, nThreads = 8)
      val records = s.read.format("graft-redo").load(logDir).as[RedoRecord]
      ChangeStreams.assembleBatch(records)
        .select(col("xid"), col("commitScn").as("commit_scn"), col("scn"),
          col("op"), col("rowId").as("row_id"),
          element_at(col("after"), "value").cast("double").as("val"))
        .orderBy(col("scn"))
    })
  )

  /** Identical expected emission to t1_txn_assembly — by construction the
    * redo encode/scan round-trip must be invisible to the result.
    */
  def oracleSql: Map[String, String] = Map(
    "s1_redo_source_assembly" -> CdcQueries.oracleSql("t1_txn_assembly"))
}
