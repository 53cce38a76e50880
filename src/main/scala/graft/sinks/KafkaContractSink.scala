package graft.sinks

import java.io.{BufferedWriter, File, FileWriter}

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** File-backed double of the Kafka delivery contract (K1).
  *
  * No Kafka broker or client exists in this environment, so the
  * delivery side is proven against the contract the reference's
  * connector relies on (`KafkaStructDataBinder.java`, SourceRecord
  * semantics):
  *
  *  - a record is (topic, partition, key, value);
  *  - all records of one (topic, partition) are appended by exactly one
  *    task per batch, in sink order — Kafka's per-partition total order;
  *  - topic names come from the K1 mappers, partitions from key hash or
  *    the RAC THREAD#−1 rule.
  *
  * Each (topic, partition) becomes one append-only `topic-partition
  * .jsonl` file of `key TAB value` lines. Swapping this for
  * `writeStream.format("kafka")` is a config change: the routing
  * columns are the same ones the Kafka connector reads.
  *
  * Scale shape: the batch is hash-repartitioned on (topic, partition) —
  * the same shuffle a real Kafka producer fan-out needs — and each task
  * streams its rows once; no driver-side collection.
  */
object KafkaContractSink {

  /** Catalyst form of `NameMappers.defaultTopic`: per-component
    * sanitation of the dotted table name, joined with the delimiter.
    * Runs codegen'd on every record — the mapper is on the hot path of
    * the whole change stream, so it must not be a driver-side lookup.
    */
  def defaultTopicColumn(table: Column, prefix: String = "",
      delimiter: String = "_"): Column = {
    val sanitized = array_join(
      transform(split(table, "\\."), c =>
        concat(
          when(c.rlike("^[A-Za-z_]"), lit("")).otherwise(lit("_")),
          regexp_replace(c, "[^A-Za-z0-9_]", "_"))),
      delimiter)
    if (prefix.isEmpty) sanitized
    else concat(lit(NameMappers.sanitize(prefix) + delimiter), sanitized)
  }

  /** Kafka's default partitioner shape: hash(key) mod numPartitions. */
  def keyHashPartition(key: Column, numPartitions: Int): Column =
    pmod(hash(key), lit(numPartitions)).cast("int")

  /** RAC rule: partition = redo THREAD# − 1 (`NameMappers.racPartition`). */
  def racPartitionColumn(thread: Column): Column =
    (thread - 1).cast("int")

  /** Append one micro-batch. `batch` must carry string `topic`, int
    * `partition`, string `key`, string `value`; `orderCols` defines the
    * in-partition order (commit SCN first, like the reference's
    * delivery order).
    *
    * Pass the foreachBatch `batchId` to make checkpoint REPLAYS
    * idempotent: a batch whose done-marker exists is skipped. This
    * covers the common failure mode (crash after delivery, before
    * checkpoint commit). A crash in the middle of the file appends
    * still duplicates that batch's prefix on replay — the same
    * at-least-once contract a real Kafka producer without
    * transactions has; exactly-once needs the transactional producer
    * this double stands in for.
    */
  def writeBatch(batch: DataFrame, dir: String, orderCols: Seq[String],
      batchId: Long = -1L): Unit = {
    val required = Seq("topic", "partition", "key", "value")
    val missing = required.filterNot(batch.columns.contains)
    require(missing.isEmpty, s"kafka contract batch lacks columns: $missing")
    new File(dir).mkdirs()
    val marker =
      if (batchId >= 0) Some(new File(dir, s".batch-$batchId.done")) else None
    if (marker.exists(_.exists())) return // replayed batch: already delivered
    batch
      .repartition(col("topic"), col("partition"))
      .sortWithinPartitions(
        (Seq(col("topic"), col("partition")) ++ orderCols.map(col)): _*)
      .select(col("topic"), col("partition"), col("key"), col("value"))
      .foreachPartition { rows: Iterator[Row] =>
        // after the sort, each (topic, partition) run is consecutive:
        // one open file at a time, pure append
        var current: (String, Int) = null
        var out: BufferedWriter = null
        try {
          rows.foreach { r =>
            val tp = (r.getString(0), r.getInt(1))
            if (tp != current) {
              if (out != null) out.close()
              current = tp
              // explicit UTF-8: a real Kafka producer delivers UTF-8
              // bytes; the platform-default charset would corrupt
              // non-ASCII payloads on non-UTF-8 JVMs
              out = java.nio.file.Files.newBufferedWriter(
                new File(dir, s"${tp._1}-${tp._2}.jsonl").toPath,
                java.nio.charset.StandardCharsets.UTF_8,
                java.nio.file.StandardOpenOption.CREATE,
                java.nio.file.StandardOpenOption.APPEND)
            }
            out.write(r.getString(2))
            out.write('\t')
            out.write(r.getString(3))
            out.write('\n')
          }
        } finally if (out != null) out.close()
      }
    marker.foreach(_.createNewFile())
  }
}
