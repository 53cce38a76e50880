package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a mergeable typed aggregate.
  *
  * Exact top-k terms over a 100 TB corpus means shuffling every token to
  * a per-token reducer — the token stream is the corpus. This sketch
  * caps state at `capacity` counters per partial; partials merge by
  * summing shared counters and re-trimming, so the shuffle carries
  * `partitions × capacity` entries total, independent of corpus size.
  *
  * Guarantees (standard MG bounds): stored counts are LOWER bounds;
  * true_count − N/capacity ≤ stored ≤ true_count, and any token with
  * true_count > N/capacity is guaranteed present. With capacity ≥
  * distinct-token count no decrement ever fires and counts are exact —
  * the regime the correctness gate pins (31-token vocab vs 1024 cap);
  * the approximation regime is spec-tested separately.
  */
object FreqSketchOps {
  private def c(e: Expression): Column = GraftSqlBridge.column(e)
  private def e(col: Column): Expression = GraftSqlBridge.expression(col)

  /** array<struct<token,cnt>> of surviving counters, cnt desc, token asc. */
  def freqSketch(token: Column, capacity: Int): Column =
    c(FreqSketchAgg(e(token), capacity).toAggregateExpression(isDistinct = false))
}

/** MG summary state: counters + cumulative decrement offset. */
final class FreqSketchBuf(val cap: Int) {
  val counts = new scala.collection.mutable.HashMap[String, Long]
  /** total decrement applied so far (error bound witness, 0 ⇒ exact). */
  var dropped: Long = 0L

  def add(tok: String, by: Long): Unit = {
    counts.get(tok) match {
      case Some(n) => counts.update(tok, n + by)
      case None if counts.size < cap => counts.update(tok, by)
      case None =>
        // MG decrement step: subtract min(by, current minimum) from every
        // counter (dropping zeros); any remainder of `by` survives as the
        // new key's counter
        val m = math.min(by, counts.valuesIterator.min)
        dropped += m
        counts.filterInPlace((_, n) => n > m)
        counts.mapValuesInPlace((_, n) => n - m)
        if (by > m) counts.update(tok, by - m)
    }
  }

  def mergeFrom(other: FreqSketchBuf): Unit = {
    other.counts.foreach { case (t, n) =>
      counts.update(t, counts.getOrElse(t, 0L) + n)
    }
    dropped += other.dropped
    if (counts.size > cap) {
      // trim to capacity: subtract the (cap+1)-th largest count from all
      val sorted = counts.values.toArray.sorted(Ordering[Long].reverse)
      val t = sorted(cap)
      dropped += t
      counts.filterInPlace((_, n) => n > t)
      counts.mapValuesInPlace((_, n) => n - t)
    }
  }
}

case class FreqSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSketchBuf] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): FreqSketchBuf =
    new FreqSketchBuf(capacity)

  override def update(buffer: FreqSketchBuf, input: InternalRow): FreqSketchBuf = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(buffer: FreqSketchBuf, other: FreqSketchBuf): FreqSketchBuf = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: FreqSketchBuf): Any = {
    // ties break by UTF-8 BYTE order, not Java's UTF-16 string order:
    // Spark's UTF8String binary collation and DuckDB's byte collation
    // both sort supplementary code points above U+E000..U+FFFF chars,
    // where UTF-16 comparison flips them — the exact divergence
    // BpeTrainer.utf8Compare fixed (r7); the documented
    // "cnt desc, token asc" array order must mean the engines' asc
    val entries = buffer.counts.toArray
      .sortWith { case ((ta, na), (tb, nb)) =>
        if (na != nb) na > nb
        else graft.operators.BpeTrainer.utf8Compare(ta, tb) < 0
      }
    new GenericArrayData(entries.map { case (t, n) =>
      InternalRow(UTF8String.fromString(t), n): Any
    })
  }

  override def serialize(buffer: FreqSketchBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.dropped)
    out.writeInt(buffer.counts.size)
    buffer.counts.foreach { case (t, n) =>
      val b = t.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketchBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new FreqSketchBuf(capacity)
    buf.dropped = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.counts.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(nc: Expression): FreqSketchAgg =
    copy(child = nc)
}
