package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a typed imperative aggregate.
  *
  * The window formulation (`row_number() over (partition by qid order by
  * cos desc)`) shuffles and sorts EVERY candidate row — |Q|·|N| rows for
  * a brute-force ANN pass. This aggregate keeps a k-entry min-heap per
  * group and participates in partial aggregation (ObjectHashAggregate),
  * so the map side reduces each partition to at most k entries per
  * group before the shuffle: traffic drops from |Q|·|N| rows to
  * |partitions|·|Q|·k, and no sort is ever materialized. That is the
  * difference between a window and an aggregate at 100 TB.
  *
  * Entries are (score double, id long, payload long); ordering is score
  * DESC then id ASC (ties break to the smaller id — identical to the
  * `ORDER BY cos DESC, vec_id` convention the DuckDB oracles use).
  * Result: array<struct<score,id,payload>> best-first.
  */
case class TopKByScore(
    k: Int,
    score: Expression,
    id: Expression,
    payload: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with TernaryLike[Expression] {

  require(k > 0, s"topk needs k > 0, got $k")

  override def first: Expression = score
  override def second: Expression = id
  override def third: Expression = payload

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val p = payload.eval(input)
      // fail loudly: substituting 0 would make a null payload look like
      // a legitimate id/pointer in the (non-nullable) result struct
      if (p == null) throw new IllegalArgumentException(
        "row_topk_by_score: null payload (coalesce it or filter nulls first)")
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long],
        p.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedBestFirst.map { e =>
      InternalRow(e.score, e.id, e.payload): Any
    })

  override def serialize(buffer: TopKHeap): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKHeap = TopKHeap.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TopKByScore =
    copy(score = f, id = s, payload = t)
}

/** k-bounded min-heap: the root is the WORST kept entry, so admission is
  * one compare against the root and O(log k) on replace.
  */
final class TopKHeap(k: Int) {
  final case class Entry(score: Double, id: Long, payload: Long)

  // worse-first ordering: lower score first; equal scores put the LARGER
  // id first (it loses the tie)
  private val worstFirst = new java.util.Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    }
  }
  private val heap = new java.util.PriorityQueue[Entry](k, worstFirst)

  // Double.compare ordering, NOT primitive >: primitive comparisons are
  // always false for NaN, which would admit a NaN while the heap is
  // filling but never afterwards — results would then depend on arrival
  // order across partial merges. Double.compare ranks NaN greatest,
  // consistently with the heap comparator and with Spark's and DuckDB's
  // NaN-sorts-greatest semantics.
  private def beats(s: Double, i: Long, worst: Entry): Boolean = {
    val c = java.lang.Double.compare(s, worst.score)
    c > 0 || (c == 0 && i < worst.id)
  }

  def add(score: Double, id: Long, payload: Long): Unit = {
    if (heap.size < k) heap.add(Entry(score, id, payload))
    else if (beats(score, id, heap.peek())) {
      heap.poll()
      heap.add(Entry(score, id, payload))
    }
  }

  def mergeFrom(other: TopKHeap): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      add(e.score, e.id, e.payload)
    }
  }

  def sortedBestFirst: Array[Entry] = {
    val out = heap.toArray(new Array[Entry](heap.size))
    java.util.Arrays.sort(out, worstFirst.reversed())
    out
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + heap.size * 24)
    bb.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.score); bb.putLong(e.id); bb.putLong(e.payload)
    }
    bb.array()
  }
}

object TopKHeap {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) {
      h.add(bb.getDouble, bb.getLong, bb.getLong)
      i += 1
    }
    h
  }
}

object TopKFunctions {
  /** array<struct<score,id,payload>> of the k best (score desc, id asc). */
  def topk_by_score(k: Int, score: Column, id: Column, payload: Column): Column =
    GraftSqlBridge.column(TopKByScore(k,
      GraftSqlBridge.expression(score),
      GraftSqlBridge.expression(id),
      GraftSqlBridge.expression(payload)).toAggregateExpression())
}
