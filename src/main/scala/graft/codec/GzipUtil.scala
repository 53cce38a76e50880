package graft.codec

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** GZIP helper (SURVEY.md §2.4 F14; ref `utils/GzipUtil.java:37`). */
object GzipUtil {
  def compress(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(data.length / 2 + 32)
    val gz = new GZIPOutputStream(bos)
    gz.write(data)
    gz.close()
    bos.toByteArray
  }

  def decompress(data: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(data))
    val bos = new ByteArrayOutputStream(data.length * 2 + 32)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      bos.write(buf, 0, n)
      n = in.read(buf)
    }
    in.close()
    bos.toByteArray
  }
}
