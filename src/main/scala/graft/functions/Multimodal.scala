package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column plumbing (BASELINE.json mandate): image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs batched per partition on executors.
  *
  * The actual media codecs are NOT in this container, so `decodeStub` is
  * a clearly-marked deterministic FAKE standing in for an image decoder —
  * the Spark-side contract (binary column in, fixed-schema features out,
  * partition-batched execution, no driver involvement) is real and is
  * what a production codec would plug into.
  */
object Multimodal {

  /** Decoded "image" features. */
  case class DecodedMedia(doc_id: Long, byte_len: Int, width: Int,
      height: Int, sig: String)

  /** A sampled "video frame" fingerprint. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_sig: String)

  private def md5Hex(md: MessageDigest, bytes: Array[Byte]): String =
    md.digest(bytes).map(b => f"$b%02x").mkString

  /** STUB image decode — stands in for e.g. JPEG decode + resize.
    * Deterministic: dimensions derived from payload length, signature
    * from the payload digest.
    */
  def decodeStub(md: MessageDigest, id: Long, payload: Array[Byte]): DecodedMedia = {
    val len = payload.length
    DecodedMedia(id, len, len % 640, (len * 7) % 480,
      md5Hex(md, payload).substring(0, 8))
  }

  /** Batched decode over (doc_id, payload) — one codec instance per
    * partition, rows streamed; the shape a JNI/native decoder needs.
    */
  def decodeBatch(df: DataFrame): Dataset[DecodedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, payload) => decodeStub(md, id, payload) }
      }
  }

  /** STUB video frame sampling: fixed-size 16-byte "frames", every
    * `step`-th frame fingerprinted (stands in for keyframe extraction).
    */
  def sampleFrames(df: DataFrame, frameBytes: Int = 16, step: Int = 4): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (id, payload) =>
          val nFrames = payload.length / frameBytes
          (0 until nFrames by step).iterator.map { j =>
            val frame = java.util.Arrays.copyOfRange(
              payload, j * frameBytes, (j + 1) * frameBytes)
            Frame(id, j, md5Hex(md, frame).substring(0, 8))
          }
        }
      }
  }
}
