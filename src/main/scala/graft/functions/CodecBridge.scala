package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Static forwarders between Spark runtime array types and the pure
  * codecs — single call targets for generated code.
  */
object CodecBridge {
  def vectorEncodeFloats(a: ArrayData): Array[Byte] =
    graft.codec.OraVector.encodeFloats(a.toFloatArray())
  def vectorDecodeFloats(b: Array[Byte]): ArrayData =
    new GenericArrayData(graft.codec.OraVector.decodeFloats(b))

  def lobInline(data: Array[Byte]): Array[Byte] =
    graft.codec.LobLocator.encode(graft.codec.LobLocator.Inline(data))
  def lobOutOfRow(id: Long): Array[Byte] =
    graft.codec.LobLocator.encode(graft.codec.LobLocator.OutOfRow(id))
}
