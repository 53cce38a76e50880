package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.orders
import graft.cdc.RedoRecord
import graft.logminer.SqlRedoParser
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
    }),

    // S4: LogMiner SQL_REDO text parse — redo SQL is SYNTHESIZED from
    // orders rows (distributed, with '' escaping and TO_TIMESTAMP
    // wrappers), parsed back by SqlRedoParser, and the reconstructed
    // typed columns must equal the source rows. op mix by o_orderkey%3:
    // 0→INSERT(values list) 1→UPDATE(set+where) 2→DELETE(where only).
    "s4_sqlredo_parse" -> ((s, dir) => {
      import s.implicits._
      val o = orders(s, dir)
        .withColumn("price_s", col("o_totalprice").cast("decimal(12,2)").cast("string"))
        .withColumn("odate_s",
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .withColumn("prio_esc", regexp_replace(col("o_orderpriority"), "'", "''"))
      val sqlText = o.select(
        when(col("o_orderkey") % 3 === 0, concat(
          lit("insert into \"G\".\"ORDERS\"(\"O_ORDERKEY\",\"O_CUSTKEY\"," +
            "\"O_TOTALPRICE\",\"O_ORDERDATE\",\"O_PRIO\") values ("),
          col("o_orderkey"), lit(","), col("o_custkey"), lit(","),
          col("price_s"), lit(",TO_TIMESTAMP('"), col("odate_s"),
          lit("'),'"), col("prio_esc"), lit("')")))
        .when(col("o_orderkey") % 3 === 1, concat(
          lit("update \"G\".\"ORDERS\" set \"O_TOTALPRICE\" = "), col("price_s"),
          lit(", \"O_PRIO\" = '"), col("prio_esc"),
          lit("' where \"O_ORDERKEY\" = "), col("o_orderkey"),
          lit(" and \"O_CUSTKEY\" = "), col("o_custkey"),
          lit(" and \"O_ORDERDATE\" = TO_TIMESTAMP('"), col("odate_s"), lit("')")))
        .otherwise(concat(
          lit("delete from \"G\".\"ORDERS\" where \"O_ORDERKEY\" = "),
          col("o_orderkey"), lit(" and \"O_CUSTKEY\" = "), col("o_custkey")))
        .as("sql_redo"))
      val parsed = sqlText.as[String].map { sql =>
        val c = SqlRedoParser.parse(sql)
        def g(m: Map[String, Option[String]], k: String): Option[String] =
          m.get(k).flatten
        (c.op,
          g(c.set, "O_ORDERKEY").orElse(g(c.where, "O_ORDERKEY")).map(_.toLong),
          g(c.set, "O_CUSTKEY").orElse(g(c.where, "O_CUSTKEY")).map(_.toLong),
          g(c.set, "O_TOTALPRICE"),
          g(c.set, "O_ORDERDATE").orElse(g(c.where, "O_ORDERDATE")),
          g(c.set, "O_PRIO"))
      }.toDF("op", "okey", "custkey", "price_s", "odate_s", "prio")
      parsed.select(col("op"), col("okey"), col("custkey"),
          col("price_s").cast("decimal(12,2)").as("price"),
          col("odate_s").cast("timestamp").as("odate"), col("prio"))
        .orderBy(col("okey"))
    })
  )

  /** Identical expected emission to t1_txn_assembly — by construction the
    * redo encode/scan round-trip must be invisible to the result.
    */
  def oracleSql: Map[String, String] = Map(
    "s1_redo_source_assembly" -> CdcQueries.oracleSql("t1_txn_assembly"),
    "s4_sqlredo_parse" ->
      """SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1
        |            WHEN o_orderkey % 3 = 1 THEN 3 ELSE 2 END AS op,
        |       o_orderkey AS okey, o_custkey AS custkey,
        |       CASE WHEN o_orderkey % 3 = 2 THEN NULL
        |            ELSE CAST(o_totalprice AS DECIMAL(12,2)) END AS price,
        |       CASE WHEN o_orderkey % 3 = 2 THEN NULL
        |            ELSE o_orderdate END AS odate,
        |       CASE WHEN o_orderkey % 3 = 2 THEN NULL
        |            ELSE o_orderpriority END AS prio
        |FROM orders ORDER BY okey""".stripMargin)
}
