package graft.codec

import java.nio.{ByteBuffer, ByteOrder}

/** LOB locator codec (SURVEY.md §2.4 F12).
  *
  * The reference distinguishes inline ("data in row") LOBs, whose bytes
  * sit directly in the row image, from out-of-row LOBs referenced by a
  * LobId that the chunk assembler (T8) resolves at emit time
  * (`GenericDecoders.java:137-169`; `OraCdcTransaction.getLob`). Wire
  * form here: flag u8 (1 = inline) | inline: u32 length + payload,
  * out-of-row: u64 lobId.
  */
object LobLocator {

  sealed trait Locator
  case class Inline(data: Array[Byte]) extends Locator {
    override def equals(o: Any): Boolean = o match {
      case Inline(d) => java.util.Arrays.equals(data, d)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(data)
  }
  case class OutOfRow(lobId: Long) extends Locator

  def encode(l: Locator): Array[Byte] = l match {
    case Inline(data) =>
      val bb = ByteBuffer.allocate(5 + data.length).order(ByteOrder.BIG_ENDIAN)
      bb.put(1.toByte); bb.putInt(data.length); bb.put(data)
      bb.array()
    case OutOfRow(id) =>
      val bb = ByteBuffer.allocate(9).order(ByteOrder.BIG_ENDIAN)
      bb.put(0.toByte); bb.putLong(id)
      bb.array()
  }

  def decode(bytes: Array[Byte]): Locator = {
    // validate against the buffer instead of trusting wire lengths: a
    // truncated/corrupt locator must fail with a codec diagnosis, not a
    // raw BufferUnderflow or a near-2GB allocation attempt
    require(bytes != null && bytes.length >= 1, "empty LOB locator")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    bb.get() match {
      case 1 =>
        require(bb.remaining() >= 4, "truncated inline LOB locator")
        val n = bb.getInt
        require(n >= 0 && n <= bb.remaining(),
          s"corrupt inline LOB length $n (have ${bb.remaining()} bytes)")
        val a = new Array[Byte](n)
        bb.get(a)
        Inline(a)
      case 0 =>
        require(bb.remaining() >= 8, "truncated out-of-row LOB locator")
        OutOfRow(bb.getLong)
      case f => throw new IllegalArgumentException(s"bad locator flag $f")
    }
  }

  def isInline(bytes: Array[Byte]): Boolean = bytes.nonEmpty && bytes(0) == 1

  /** Inline payload or null (out-of-row → resolved by the assembler). */
  def inlineData(bytes: Array[Byte]): Array[Byte] = decode(bytes) match {
    case Inline(d) => d
    case _ => null
  }

  def lobId(bytes: Array[Byte]): java.lang.Long = decode(bytes) match {
    case OutOfRow(id) => id
    case _ => null
  }
}
