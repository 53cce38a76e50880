package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Relational operator battery.
  *
  * The reference (oracdc) has no relational executor — SURVEY.md §2.7
  * documents joins/aggs/windows/sorts as explicitly absent and mandates we
  * provide them via stock Spark SQL. Every query here is a declarative
  * DataFrame plan so Catalyst gets predicate pushdown / column pruning /
  * join selection for free, and AQE re-plans at runtime on a real cluster.
  *
  * Scale notes (100 TB design):
  *  - dimension joins (region/nation/supplier/part at TPC-H proportions)
  *    are explicitly `broadcast(...)` — no shuffle of the fact table;
  *  - fact-fact joins (lineitem⋈orders) shuffle on the join key only after
  *    filters have reduced the sides; AQE handles skew;
  *  - money aggregates are computed in DecimalType so results are
  *    order-independent (exact arithmetic) — double sums differ between
  *    partial-aggregation orders at 1000 executors.
  */
object RelationalQueries {
  private val D = DecimalType(18, 2)
  private def dec(c: org.apache.spark.sql.Column) = c.cast(D)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: single scan + partial agg; the
    // canonical map-side-combine aggregation. (ref: none — SURVEY §2.7)
    "q1_agg" -> ((s, dir) => {
      lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast(DecimalType(38, 2)).as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast(DecimalType(38, 2)).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
            .cast(DecimalType(38, 4)).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(38,4)) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
