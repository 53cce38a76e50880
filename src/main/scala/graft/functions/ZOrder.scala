package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave — the clustering key behind
  * multi-dimensional data skipping: laying a 100 TB table out in z-value
  * order makes parquet row-group min/max statistics selective on BOTH
  * dimensions at once, so a 2-D predicate prunes file ranges instead of
  * scanning everything. The expression is pure integer arithmetic,
  * reproducible across engines (the DuckDB oracle states the same bit
  * spread explicitly).
  */
object ZOrderKernel {
  /** Interleave the low `bits` bits: x at even positions, y at odd. */
  def interleave2(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >>> i) & 1L) << (2 * i)
      z |= ((y >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

object ZOrderOps {
  private def c(e: Expression): Column = GraftSqlBridge.column(e)
  private def e(col: Column): Expression = GraftSqlBridge.expression(col)

  /** z-value of two non-negative long dims, `bits` bits each (≤ 31). */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column =
    c(ZValue2(e(x), e(y), bits))
}

case class ZValue2(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression with ExpectsInputTypes {

  require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernel.interleave2(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.ZOrderKernel.interleave2($x, $y, $bits)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZValue2 = copy(left = l, right = r)
}
