package graft.logminer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CSF continuation reassembly (SURVEY §2.1 S4 parity): LogMiner splits
  * a long SQL_REDO across consecutive `V$LOGMNR_CONTENTS` rows, flagging
  * every row but the last with CSF=1; the reference stitches them back
  * with a cursor-side while-loop
  * (`OraCdcLogMinerWorkerThread.java:906-913,1134-1150`). Spark-first
  * re-expression: a per-transaction window assigns statement ids from
  * the CSF run-length structure, then one ordered group-concat rebuilds
  * each statement — fully distributed, no driver cursor.
  *
  * Input columns: `xid` (transaction), `scn` (statement anchor; rows of
  * one statement share it), `seq` (chunk order within the statement),
  * `csf` (1 = continued in the next row), `part` (text chunk).
  * Output: one row per statement — (xid, scn, sql).
  *
  * Scale: the window partitions by transaction and the concat state is
  * bounded by one statement's length — never by table or log size.
  */
object CsfReassembly {

  def reassemble(parts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("xid")).orderBy(col("scn"), col("seq"))
    // a row STARTS a statement iff the previous row in the transaction
    // was not continued (lag default 0 starts the first statement)
    val marked = parts
      .withColumn("stmt",
        sum(when(lag(col("csf"), 1, 0).over(w) === 0, 1).otherwise(0)).over(w))
    marked.groupBy(col("xid"), col("stmt"))
      .agg(min(col("scn")).as("scn"),
        // ordered concat: collect_list has no ordering guarantee after a
        // shuffle, so sort the (seq, part) pairs inside the aggregate
        array_join(expr("transform(sort_array(collect_list(struct(seq, part))), x -> x.part)"), "")
          .as("sql"))
      .select(col("xid"), col("scn"), col("sql"))
  }
}
