package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Small-file compaction — the other half of table maintenance next to
  * z-order layout ([[ZOrderLayout]]): a CDC-fed table accretes one file
  * per micro-batch per partition, and scan planning cost grows with the
  * FILE count, not the byte count. Compaction rewrites a directory into
  * ~size-targeted files.
  *
  * Scale design: file sizing derives from the INPUT's on-disk footprint
  * (sum of file lengths via the scan's own file index — metadata only,
  * no data pass, no driver collect of rows). The rewrite itself is one
  * `repartition(n)` — a single round-robin shuffle sized so each output
  * file lands near the target; with an optional cluster column it
  * becomes `repartitionByRange` so compaction and layout clustering
  * happen in the same shuffle.
  */
object Compaction {

  /** Total on-disk bytes feeding `df` — the scan's own file index when
    * the plan is a V1 file relation (metadata only, exact), otherwise
    * the optimizer's size estimate (DSv2/catalog tables), so a
    * non-file-backed frame never silently sizes to one file.
    */
  def inputBytes(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    // SUM over every file relation — a compaction input is often a
    // union of the base directory plus newly accreted files, and sizing
    // from the first relation alone would double the output file size
    val fileBytes = df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation
          if r.relation.isInstanceOf[HadoopFsRelation] =>
        r.relation.asInstanceOf[HadoopFsRelation].location.sizeInBytes
    }
    if (fileBytes.nonEmpty) fileBytes.sum
    else {
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      if (est.isValidLong) est.toLong else Long.MaxValue
    }
  }

  /** Rewrite `src` (a parquet directory) into `dst` with files sized
    * near `targetFileBytes`. Returns the chosen output file count.
    */
  def compact(df: DataFrame, dst: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      clusterBy: Option[String] = None): Int = {
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive, got $targetFileBytes")
    val bytes = inputBytes(df)
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .min(1 << 20).toInt
    val shaped = clusterBy match {
      case Some(c) => df.repartitionByRange(n, col(c))
      case None => df.repartition(n)
    }
    shaped.write.mode(SaveMode.Overwrite).parquet(dst)
    n
  }
}
