package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Graph-centrality operators (§2.65) — the quality-prior side of corpus
  * curation: web-scale pipelines (CCNet, RefinedWeb, the Common Crawl
  * host ranking) use link-graph centrality as a document quality signal,
  * and a CDC-fed lakehouse computes it over the interaction graph its
  * change streams accrete. PageRank (Brin & Page, WWW 1998) is the
  * canonical member and the canonical ITERATIVE dataflow: rank mass
  * flows along edges for a fixed number of supersteps.
  *
  * Scale design (100 TB):
  *  - the edge list is built ONCE, hash-partitioned on `src`, and
  *    persisted; every superstep's contribution join reuses that
  *    partitioning (cached frames keep their outputPartitioning, so
  *    Catalyst plans the per-iteration join with the rank side alone
  *    shuffling — rank rows are node-sized, edges never move again).
  *  - each superstep is one node-sized equi-join + one map-side-combined
  *    aggregate keyed by `dst`; nothing in the loop scales with the raw
  *    event count after the initial distinct.
  *  - the driver holds NOTHING but the loop counter — ranks stay
  *    distributed end to end (contrast with collect-based "iterate on
  *    the driver" formulations that die at web scale).
  *  - arithmetic is INTEGER micro-units with floor division (rank 1.0 ≡
  *    1 000 000; damping 0.85 as ×85 div 100) so five supersteps land
  *    bit-identically on any engine — float mass diverges across
  *    engines after one iteration. Domain: 85 · Σ(r div d) stays in
  *    int64 while a single node's in-flowing mass is < ~10^17 micro-units
  *    (total graph mass is conserved at ~nodes × 10^6, so this holds to
  *    ~10^11-node graphs — beyond that, widen to DECIMAL(38)).
  */
object GraphQueries {

  /** Damped integer-exact PageRank over a pre-partitioned edge list.
    * `edges` must be (src, dst) with every node present as a source
    * (symmetrize the graph or pre-add self-loops for dangling nodes —
    * the caller owns dangling-mass policy, as reference implementations
    * do). Returns (node, r) after `iters` supersteps.
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d"))
    var ranks = deg.select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ranks.join(deg, "node")
        .select(col("node").as("src"), expr("r div d").as("c"))
      ranks = edges.join(contrib, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("cin"))
        .select(col("node"),
          (lit(150000L) + expr("85 * cin div 100")).as("r"))
    }
    ranks
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Interaction-graph centrality: users and items (the event's
    // props.k) form a bipartite graph, symmetrized so every node has
    // out-degree ≥ 1 (no dangling mass), item nodes offset to their own
    // id space; 5 integer-exact supersteps. The oracle restates the
    // SAME fixed-point chain as 5 chained CTEs — two independent
    // executions of the iterative dataflow must agree on every node's
    // exact rank.
    "q_pagerank" -> ((s, dir) => {
      val pairs = events(s, dir)
        .select(col("user_id").as("u"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k").isNotNull)
        .distinct()
      val edges = pairs
        .select(col("u").as("src"), (col("k") + 100000L).as("dst"))
        .unionAll(pairs
          .select((col("k") + 100000L).as("src"), col("u").as("dst")))
        .repartition(col("src"))
        .persist()
      try {
        val out = pageRank(edges, iters = 5).orderBy(col("node"))
          .localCheckpoint(true)
        out
      } finally edges.unpersist(blocking = false)
    })
  )

  def oracleSql: Map[String, String] = {
    val iter = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT e.dst AS node,
         |         CAST(150000 + 85 * SUM(r.r // d.d) // 100 AS BIGINT) AS r
         |  FROM r${i - 1} r
         |  JOIN deg d ON d.node = r.node
         |  JOIN edges e ON e.src = r.node
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    Map(
      "q_pagerank" ->
        s"""WITH pairs AS (
           |  SELECT DISTINCT user_id AS u,
           |         CAST(props::JSON->>'k' AS BIGINT) AS k
           |  FROM events WHERE props::JSON->>'k' IS NOT NULL),
           |edges AS (
           |  SELECT u AS src, 100000 + k AS dst FROM pairs
           |  UNION ALL
           |  SELECT 100000 + k AS src, u AS dst FROM pairs),
           |deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY 1),
           |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
           |$iter
           |SELECT node, r FROM r5 ORDER BY node""".stripMargin
    )
  }
}
