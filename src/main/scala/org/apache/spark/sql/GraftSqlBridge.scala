package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters in Spark 4
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Lives in the
  * org.apache.spark.sql package purely for access; no Spark internals are
  * modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The given one-row/one-column frame as a scalar-subquery expression —
    * the shape Spark's own runtime-filter injection uses: the subquery
    * plan executes ONCE and its value is bound into the outer plan as a
    * per-task constant (a codegen reference object, not a per-row column
    * read). Carrying a large value (e.g. a bloom bitset) as a joined
    * column instead costs one defensive array copy per probed row.
    */
  def scalarSubquery(df: Dataset[_]): Expression =
    catalyst.expressions.ScalarSubquery(df.queryExecution.analyzed)
}
