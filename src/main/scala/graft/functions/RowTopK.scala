package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Generalized bounded top-k aggregate: keeps the k first rows of each
  * group under an arbitrary multi-key sort order, carrying an arbitrary
  * payload row. The generalization of [[TopKByScore]] (score/id/payload
  * longs) that [[graft.plans.TopKRewrite]] needs to replace
  * `row_number() OVER (...) <= k` windows: the window formulation
  * shuffles and fully sorts EVERY row of every group; this aggregate is
  * a k-entry bounded heap that participates in partial aggregation
  * (ObjectHashAggregate), so each map partition forwards at most k
  * entries per group and nothing is ever globally sorted.
  *
  * `sortKeys` are evaluated per input row into a key record ordered by
  * `directions`/`nullOrderings` (the window's ORDER BY, including null
  * ordering); `payload` is typically `struct(child.output)`. Result:
  * array<payload> best-first — exactly rows ranked 1..k.
  */
case class RowTopK(
    k: Int,
    sortKeys: Seq[Expression],
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RowTopKBuffer] {

  require(k > 0, s"row_topk needs k > 0, got $k")
  require(sortKeys.nonEmpty && sortKeys.size == ascending.size &&
    sortKeys.size == nullsFirst.size)

  override def children: Seq[Expression] = sortKeys :+ payload

  override def dataType: DataType = ArrayType(payload.dataType,
    containsNull = false)
  override def nullable: Boolean = false

  private lazy val keyTypes = sortKeys.map(_.dataType).toArray
  private lazy val payloadType = payload.dataType.asInstanceOf[StructType]

  // best-first total order over key records (the window's ORDER BY)
  private lazy val ordering: Ordering[InternalRow] = {
    val orders = sortKeys.indices.map { i =>
      val dir = if (ascending(i)) Ascending else Descending
      val no = if (nullsFirst(i)) NullsFirst else NullsLast
      SortOrder(BoundReference(i, keyTypes(i), nullable = true), dir, no, Seq.empty)
    }
    new InterpretedOrdering(orders)
  }

  private lazy val keyProj = UnsafeProjection.create(keyTypes)
  private lazy val payloadProj = UnsafeProjection.create(Array[DataType](payloadType))

  override def createAggregationBuffer(): RowTopKBuffer =
    new RowTopKBuffer(k, ordering)

  override def update(buffer: RowTopKBuffer, input: InternalRow): RowTopKBuffer = {
    val keyVals = new GenericInternalRow(sortKeys.length)
    var i = 0
    while (i < sortKeys.length) {
      keyVals.update(i, sortKeys(i).eval(input))
      i += 1
    }
    val key = keyProj(keyVals)
    if (buffer.admits(key)) {
      val pv = payload.eval(input)
      // loud, like TopKByScore: a null payload would surface as a null
      // element inside an array whose dataType promises
      // containsNull=false — downstream UnsafeWriter paths trusting
      // that schema would NPE or read garbage much later
      if (pv == null) throw new IllegalArgumentException(
        "row_topk: null payload struct (wrap nullable inputs in a " +
          "non-null struct or filter nulls before the aggregate)")
      val p = new GenericInternalRow(1)
      p.update(0, pv)
      buffer.add(key.copy(), payloadProj(p).copy())
    }
    buffer
  }

  override def merge(buffer: RowTopKBuffer, other: RowTopKBuffer): RowTopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: RowTopKBuffer): Any =
    new GenericArrayData(buffer.sortedBestFirst.map(_.getStruct(0,
      payloadType.size): Any))

  override def serialize(buffer: RowTopKBuffer): Array[Byte] =
    buffer.toBytes

  override def deserialize(bytes: Array[Byte]): RowTopKBuffer =
    RowTopKBuffer.fromBytes(k, ordering, sortKeys.length, bytes)

  override def withNewMutableAggBufferOffset(o: Int): RowTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RowTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RowTopK =
    copy(sortKeys = newChildren.dropRight(1), payload = newChildren.last)
}

/** k-bounded heap of (sort-key row, payload row); the heap root is the
  * WORST kept entry so admission is one comparison.
  */
final class RowTopKBuffer(k: Int, ordering: Ordering[InternalRow]) {
  // worst-first: reverse of best-first
  private val heap = new java.util.PriorityQueue[(UnsafeRow, UnsafeRow)](
    k, (a, b) => ordering.compare(b._1, a._1))

  /** cheap pre-check so callers can skip key/payload copies */
  def admits(key: InternalRow): Boolean =
    heap.size < k || ordering.compare(key, heap.peek()._1) < 0

  def add(key: UnsafeRow, payload: UnsafeRow): Unit = {
    if (heap.size < k) heap.add((key, payload))
    else if (ordering.compare(key, heap.peek()._1) < 0) {
      heap.poll()
      heap.add((key, payload))
    }
  }

  def mergeFrom(other: RowTopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val (key, p) = it.next()
      add(key, p)
    }
  }

  /** payload single-field rows, rank 1..n order */
  def sortedBestFirst: Array[UnsafeRow] = {
    val entries = heap.toArray(new Array[(UnsafeRow, UnsafeRow)](heap.size))
    java.util.Arrays.sort(entries,
      (a: (UnsafeRow, UnsafeRow), b: (UnsafeRow, UnsafeRow)) =>
        ordering.compare(a._1, b._1))
    entries.map(_._2)
  }

  def toBytes: Array[Byte] = {
    val entries = heap.toArray(new Array[(UnsafeRow, UnsafeRow)](heap.size))
    var size = 4
    entries.foreach { case (key, p) =>
      size += 8 + key.getSizeInBytes + p.getSizeInBytes
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (key, p) =>
      bb.putInt(key.getSizeInBytes); bb.put(key.getBytes)
      bb.putInt(p.getSizeInBytes); bb.put(p.getBytes)
    }
    bb.array()
  }
}

object RowTopKBuffer {
  def fromBytes(k: Int, ordering: Ordering[InternalRow], numKeyFields: Int,
      bytes: Array[Byte]): RowTopKBuffer = {
    val buf = new RowTopKBuffer(k, ordering)
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val key = new UnsafeRow(numKeyFields)
      val klen = bb.getInt
      val kbytes = new Array[Byte](klen)
      bb.get(kbytes)
      key.pointTo(kbytes, klen)
      val p = new UnsafeRow(1)
      val plen = bb.getInt
      val pbytes = new Array[Byte](plen)
      bb.get(pbytes)
      p.pointTo(pbytes, plen)
      buf.add(key, p)
      i += 1
    }
    buf
  }
}
