package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Materialized-view-log snapshot polling (SURVEY.md §2.1 S7).
  *
  * Re-expresses `KafkaSnapshotLogTable.pollMVLog` (ref
  * KafkaSnapshotLogTable.java:125-480): each poll reads the MLOG$-style
  * change log, maps DMLTYPE$$ I/U/D → c/u/d, and for non-deletes joins the
  * master table by key to fetch the current row image (deletes carry only
  * the key). Rows whose master image vanished between log write and poll
  * are dropped, like the reference's missing-master warning path. The
  * delete-after-read contract (consume the log rows once delivered) is the
  * caller's foreachBatch commit hook.
  *
  * Scale: one shuffle keyed on the master key; the log side is a fresh
  * increment (small), so Spark broadcasts it under AQE when it fits.
  */
object MviewSnapshot {

  /** `log` must carry the key columns + `dmltype` ('I'/'U'/'D') + `rowscn`;
    * `master` carries key + payload columns.
    */
  def poll(log: DataFrame, master: DataFrame, keys: Seq[String]): DataFrame = {
    val opCol = when(col("dmltype") === "I", lit("c"))
      .when(col("dmltype") === "U", lit("u"))
      .otherwise(lit("d"))
    val nonDeletes = log.filter(col("dmltype") =!= "D")
      .join(master, keys) // inner: master row gone → drop (ref warning path)
    val deletes = log.filter(col("dmltype") === "D")
    nonDeletes.unionByName(deletes, allowMissingColumns = true)
      .withColumn("op", opCol)
      .drop("dmltype")
  }
}
