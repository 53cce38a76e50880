package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise (min, max) over an `array<long>` column as ONE mergeable
  * aggregate — the scalar-quantizer training pass.
  *
  * The explode formulation (`posexplode(q) → groupBy(dim) → min/max →
  * collect back to arrays`) multiplies every row by its dimension count
  * BEFORE the shuffle: at 100 TB of 1024-dim embeddings that is a
  * 1024× row blowup through an exchange, to compute 2·dim longs. This
  * aggregate keeps one (mins, maxs) pair per partition and merges them
  * — partial aggregation reduces the exchange to |partitions| buffers
  * of 2·dim longs, and the plan loses an entire shuffle + re-collect
  * stage.
  *
  * Result: struct<mns: array<long>, mxs: array<long>>. Vectors of
  * differing lengths fold to the SHORTEST seen (the quantizer trains on
  * the common prefix; malformed rows must not widen the codebook).
  */
case class VecBoundsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecBoundsBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = StructType(Seq(
    StructField("mns", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("mxs", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): VecBoundsBuffer = new VecBoundsBuffer

  override def update(buffer: VecBoundsBuffer, input: InternalRow): VecBoundsBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: VecBoundsBuffer, other: VecBoundsBuffer): VecBoundsBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: VecBoundsBuffer): Any = {
    require(buffer.nonEmpty, "vec_bounds over zero vectors")
    InternalRow(new GenericArrayData(buffer.mins),
      new GenericArrayData(buffer.maxs))
  }

  override def serialize(buffer: VecBoundsBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): VecBoundsBuffer =
    VecBoundsBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): VecBoundsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecBoundsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(nc: Expression): VecBoundsAgg =
    copy(child = nc)
}

/** Mutable (mins, maxs) fold state; `n < 0` marks the empty buffer. */
final class VecBoundsBuffer {
  private[functions] var n: Int = -1
  var mins: Array[Long] = _
  var maxs: Array[Long] = _

  def nonEmpty: Boolean = n >= 0

  private def shrinkTo(m: Int): Unit = if (m < n) {
    mins = java.util.Arrays.copyOf(mins, m)
    maxs = java.util.Arrays.copyOf(maxs, m)
    n = m
  }

  def add(v: ArrayData): Unit = {
    val m = v.numElements()
    if (n < 0) {
      n = m
      mins = new Array[Long](m)
      maxs = new Array[Long](m)
      var i = 0
      while (i < m) { val x = v.getLong(i); mins(i) = x; maxs(i) = x; i += 1 }
    } else {
      shrinkTo(m)
      var i = 0
      while (i < n) {
        val x = v.getLong(i)
        if (x < mins(i)) mins(i) = x
        if (x > maxs(i)) maxs(i) = x
        i += 1
      }
    }
  }

  def mergeFrom(other: VecBoundsBuffer): Unit = if (other.nonEmpty) {
    if (n < 0) {
      n = other.n
      mins = other.mins.clone()
      maxs = other.maxs.clone()
    } else {
      shrinkTo(other.n)
      var i = 0
      while (i < n) {
        if (other.mins(i) < mins(i)) mins(i) = other.mins(i)
        if (other.maxs(i) > maxs(i)) maxs(i) = other.maxs(i)
        i += 1
      }
    }
  }

  def toBytes: Array[Byte] = {
    val m = math.max(n, 0)
    val bb = ByteBuffer.allocate(4 + 16 * m)
    bb.putInt(n)
    var i = 0
    while (i < m) { bb.putLong(mins(i)); bb.putLong(maxs(i)); i += 1 }
    bb.array()
  }
}

object VecBoundsBuffer {
  def fromBytes(bytes: Array[Byte]): VecBoundsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val b = new VecBoundsBuffer
    if (m >= 0) {
      b.n = m
      b.mins = new Array[Long](m)
      b.maxs = new Array[Long](m)
      var i = 0
      while (i < m) { b.mins(i) = bb.getLong; b.maxs(i) = bb.getLong; i += 1 }
    }
    b
  }
}

/** Element-wise SUM over an `array<long>` column as one mergeable
  * aggregate — the centroid-recompute pass of quantized k-means. Exact
  * long arithmetic, so `sum[i] / count` (floor) restates identically in
  * any engine; the same no-explode argument as [[VecBoundsAgg]] applies.
  * Vectors of differing lengths fold to the shortest seen.
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buffer: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: VecSumBuffer): Any = {
    require(buffer.nonEmpty, "vec_sum over zero vectors")
    new GenericArrayData(buffer.sums)
  }

  override def serialize(buffer: VecSumBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): VecSumBuffer =
    VecSumBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(nc: Expression): VecSumAgg =
    copy(child = nc)
}

/** Mutable element-wise sum fold state; `n < 0` marks the empty buffer. */
final class VecSumBuffer {
  private[functions] var n: Int = -1
  var sums: Array[Long] = _

  def nonEmpty: Boolean = n >= 0

  private def shrinkTo(m: Int): Unit = if (m < n) {
    sums = java.util.Arrays.copyOf(sums, m)
    n = m
  }

  def add(v: ArrayData): Unit = {
    val m = v.numElements()
    if (n < 0) {
      n = m
      sums = new Array[Long](m)
      var i = 0
      while (i < m) { sums(i) = v.getLong(i); i += 1 }
    } else {
      shrinkTo(m)
      var i = 0
      while (i < n) { sums(i) += v.getLong(i); i += 1 }
    }
  }

  def mergeFrom(other: VecSumBuffer): Unit = if (other.nonEmpty) {
    if (n < 0) {
      n = other.n
      sums = other.sums.clone()
    } else {
      shrinkTo(other.n)
      var i = 0
      while (i < n) { sums(i) += other.sums(i); i += 1 }
    }
  }

  def toBytes: Array[Byte] = {
    val m = math.max(n, 0)
    val bb = ByteBuffer.allocate(4 + 8 * m)
    bb.putInt(n)
    var i = 0
    while (i < m) { bb.putLong(sums(i)); i += 1 }
    bb.array()
  }
}

object VecSumBuffer {
  def fromBytes(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getInt
    val b = new VecSumBuffer
    if (m >= 0) {
      b.n = m
      b.sums = new Array[Long](m)
      var i = 0
      while (i < m) { b.sums(i) = bb.getLong; i += 1 }
    }
    b
  }
}

object VecBoundsFunctions {
  /** struct<mns,mxs> of element-wise bounds over an array<long> column. */
  def vec_bounds(v: Column): Column =
    GraftSqlBridge.column(
      VecBoundsAgg(GraftSqlBridge.expression(v)).toAggregateExpression())

  /** array<long> element-wise sum over an array<long> column. */
  def vec_sum(v: Column): Column =
    GraftSqlBridge.column(
      VecSumAgg(GraftSqlBridge.expression(v)).toAggregateExpression())
}
