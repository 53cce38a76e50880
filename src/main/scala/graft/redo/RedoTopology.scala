package graft.redo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S5 — distributed log-topology gap audit (SURVEY.md §2.1).
  *
  * The reference checks archived-redo continuity while building its
  * mining range: a missing sequence aborts the range so no change is
  * silently skipped (`OraCdcV$ArchivedLogImpl.java:189`). GRL1's
  * driver-side equivalent (`RedoLogReader.listLogs`) likewise throws on
  * the FIRST per-thread gap. This operator is the cluster-sized variant
  * of the same invariant: audit an entire archive catalog (at 100 TB,
  * millions of (thread, seq) segment coordinates) in one distributed
  * pass and report EVERY missing run, not just the first.
  *
  * Plan shape: one shuffle keyed by thread (the window partition); the
  * lag-window pass is linear per partition. A catalog is tiny relative
  * to the data it indexes, so this is never the bottleneck — the value
  * is that the report comes from the same engine (and the same listing
  * snapshot) as the scan it gates.
  */
object RedoTopology {

  /** Per-thread sequence-gap report over a (thread, seq) topology frame:
    * each missing run becomes one row (thread, gap_start, gap_end,
    * missing), where [gap_start, gap_end] are the absent sequence
    * numbers. Duplicate coordinates are tolerated WITHOUT a distinct
    * pass (e.g. multiplexed archive destinations listing a segment
    * twice): under the sorted window a duplicate's lag equals its own
    * seq, so it can neither emit a spurious gap nor emit one twice —
    * and dropping the distinct drops a whole extra exchange, keeping
    * the operator at the ONE shuffle its scaladoc promises.
    */
  def gapReport(topology: DataFrame, threadCol: String,
      seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(threadCol)).orderBy(col(seqCol))
    topology
      .select(col(threadCol), col(seqCol))
      .withColumn("__prev", lag(col(seqCol), 1).over(w))
      .filter(col("__prev").isNotNull && col(seqCol) > col("__prev") + 1)
      .select(col(threadCol),
        (col("__prev") + 1).as("gap_start"),
        (col(seqCol) - 1).as("gap_end"),
        (col(seqCol) - col("__prev") - 1).as("missing"))
  }
}
