package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Tight-loop vector kernels + their codegen Catalyst expressions.
  *
  * The HOF formulations (`aggregate(zip_with(a,b,…))`) build a struct per
  * element and call an interpreted lambda per element — for an ANN scan
  * that is |pairs|·dim allocations. Each expression here is one static
  * call inside WholeStageCodegen. Semantics are identical to the HOF
  * versions and the DuckDB oracles (exact integer arithmetic on 1e-6
  * quantized floats — see VectorFunctions).
  */
object VectorNative {

  def quantize(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(v.getFloat(i).toDouble * 1000000d).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  def dotQ(a: ArrayData, b: ArrayData): Long = {
    // min-length bound: a malformed shorter vector must not read past
    // its buffer (UnsafeArrayData would return garbage, not throw)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Random-hyperplane LSH bucket; plane p component i is the
    * deterministic pseudo-random ((p·131 + i·7919 + 17) mod 1000) − 500,
    * matching VectorFunctions.lshBucket and the DuckDB oracle.
    */
  def lshBucket(q: ArrayData, planes: Int): Long = {
    val n = q.numElements()
    var out = 0L
    var p = 0
    while (p < planes) {
      var dp = 0L
      var i = 0
      while (i < n) {
        dp += q.getLong(i) * (((p * 131 + i * 7919 + 17) % 1000) - 500)
        i += 1
      }
      if (dp > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** SQ8 decode on the fixed-point domain: out[i] = mn[i] +
    * ((q[i] − mn[i]) / s[i]) · s[i] — the grid value the 8-bit code
    * represents. Integer arithmetic with q[i] ≥ mn[i] (mn is the corpus
    * minimum) and s[i] ≥ 1, so `/` truncation matches SQL DIV and the
    * oracle's `//` exactly.
    */
  def sq8Decode(q: ArrayData, mns: ArrayData, steps: ArrayData): ArrayData = {
    val n = math.min(q.numElements(),
      math.min(mns.numElements(), steps.numElements()))
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val mn = mns.getLong(i)
      val s = steps.getLong(i)
      out(i) = mn + ((q.getLong(i) - mn) / s) * s
      i += 1
    }
    new GenericArrayData(out)
  }

  case class QuantizeExpr(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      VectorNative.quantize(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.VectorNative.quantize($a)")
    override protected def withNewChildInternal(nc: Expression): Expression = copy(child = nc)
  }

  case class DotQExpr(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      VectorNative.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorNative.dotQ($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class Sq8DecodeExpr(first: Expression, second: Expression,
      third: Expression)
      extends TernaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(LongType), ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(q: Any, mns: Any, steps: Any): Any =
      VectorNative.sq8Decode(q.asInstanceOf[ArrayData],
        mns.asInstanceOf[ArrayData], steps.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b, c) =>
        s"graft.functions.VectorNative.sq8Decode($a, $b, $c)")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  case class LshBucketExpr(child: Expression, planes: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def nullSafeEval(v: Any): Any =
      VectorNative.lshBucket(v.asInstanceOf[ArrayData], planes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.VectorNative.lshBucket($a, $planes)")
    override protected def withNewChildInternal(nc: Expression): Expression = copy(child = nc)
  }

  private def c(e: Expression): Column = GraftSqlBridge.column(e)
  private def e(col: Column): Expression = GraftSqlBridge.expression(col)

  def quantize_native(col: Column): Column = c(QuantizeExpr(e(col)))
  def dotq_native(a: Column, b: Column): Column = c(DotQExpr(e(a), e(b)))
  def lsh_bucket_native(q: Column, planes: Int): Column = c(LshBucketExpr(e(q), planes))
  def sq8_decode_native(q: Column, mns: Column, steps: Column): Column =
    c(Sq8DecodeExpr(e(q), e(mns), e(steps)))
}
