package graft.codec

import java.nio.{ByteBuffer, ByteOrder}

/** VECTOR wire codec (SURVEY.md §2.4 F10).
  *
  * The reference decodes Oracle 23ai VECTOR columns into a struct of four
  * optional arrays B/I/F/D (bool / int8 / float32 / float64 — ref
  * `data/OraVector.java:43-72`), dispatching on a magic byte 0xDB
  * (`GenericDecoders.java:122`). Same surface here: magic 0xDB, a format
  * tag, u32 dimension count, then packed elements big-endian.
  */
object OraVector {
  val Magic: Int = 0xDB
  val TagBool: Byte = 'B'
  val TagInt8: Byte = 'I'
  val TagFloat32: Byte = 'F'
  val TagFloat64: Byte = 'D'

  def encodeFloats(v: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(6 + 4 * v.length).order(ByteOrder.BIG_ENDIAN)
    bb.put(Magic.toByte); bb.put(TagFloat32); bb.putInt(v.length)
    v.foreach(bb.putFloat)
    bb.array()
  }

  def encodeDoubles(v: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(6 + 8 * v.length).order(ByteOrder.BIG_ENDIAN)
    bb.put(Magic.toByte); bb.put(TagFloat64); bb.putInt(v.length)
    v.foreach(bb.putDouble)
    bb.array()
  }

  def encodeInt8(v: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(6 + v.length).order(ByteOrder.BIG_ENDIAN)
    bb.put(Magic.toByte); bb.put(TagInt8); bb.putInt(v.length)
    bb.put(v)
    bb.array()
  }

  def encodeBools(v: Array[Boolean]): Array[Byte] = {
    val bb = ByteBuffer.allocate(6 + v.length).order(ByteOrder.BIG_ENDIAN)
    bb.put(Magic.toByte); bb.put(TagBool); bb.putInt(v.length)
    v.foreach(b => bb.put(if (b) 1.toByte else 0.toByte))
    bb.array()
  }

  sealed trait Decoded
  case class Bools(v: Array[Boolean]) extends Decoded
  case class Int8s(v: Array[Byte]) extends Decoded
  case class Float32s(v: Array[Float]) extends Decoded
  case class Float64s(v: Array[Double]) extends Decoded

  def decode(bytes: Array[Byte]): Decoded = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val magic = bb.get() & 0xff
    require(magic == Magic, f"bad VECTOR magic 0x$magic%02x")
    val tag = bb.get()
    val n = bb.getInt
    tag match {
      case TagBool => Bools(Array.fill(n)(bb.get() != 0))
      case TagInt8 => val a = new Array[Byte](n); bb.get(a); Int8s(a)
      case TagFloat32 => Float32s(Array.fill(n)(bb.getFloat))
      case TagFloat64 => Float64s(Array.fill(n)(bb.getDouble))
      case other => throw new IllegalArgumentException(s"bad VECTOR tag $other")
    }
  }

  /** Decode straight to float32 payload; throws on other formats. */
  def decodeFloats(bytes: Array[Byte]): Array[Float] = decode(bytes) match {
    case Float32s(v) => v
    case other => throw new IllegalArgumentException(
      s"VECTOR is ${other.getClass.getSimpleName}, not float32")
  }
}
