package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the end-to-end curation pipeline (`pipe_curate`) that
  * the DuckDB gate can't state directly: stage containment, filter
  * floors, exact-dedup uniqueness, and near-dedup idempotence (the
  * curated set contains no verified near-dup pair, so re-running the
  * sweep on its own output is a fixpoint).
  */
class PipelineSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", false)
    .appName("pipeline-spec").getOrCreate()

  private lazy val curated =
    PipelineQueries.queries("pipe_curate")(spark, dir).cache()

  test("pipeline keeps a non-trivial subset and every row passes the filters") {
    val n = curated.count()
    val total = graft.Tables.documents(spark, dir).count()
    assert(n > 0 && n < total, s"curated $n of $total")
    assert(curated.filter(col("n_tok") < 20 || col("q") < 3.0).count() === 0)
  }

  test("exact dedup: curated normalized texts are unique") {
    import graft.functions.TextFunctions._
    // recompute norms for the curated ids straight from the source table
    val norms = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm"))
      .join(curated.select("doc_id"), "doc_id")
    assert(norms.groupBy(col("norm")).count().filter(col("count") > 1)
      .count() === 0)
    // and no curated doc's bigram shingle set near-duplicates another's:
    // the verified-pair sweep over the curated subset must come back empty
    // (fixpoint — rerunning curation drops nothing)
    val hashes = norms
      .select(col("doc_id"), shingleHashes(tokens(col("norm")), 2).as("hs"))
      .persist()
    val pairs = DedupQueries.jaccardOnCandidates(
      hashes.filter(size(col("hs")) > 0))
    assert(pairs.count() === 0, "curated set still contains near-dup pairs")
    hashes.unpersist(blocking = false)
  }
}
