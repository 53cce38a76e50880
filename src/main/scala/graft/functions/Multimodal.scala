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

  /** Resized "image": fixed target resolution by strided byte sampling. */
  case class Resized(doc_id: Long, out_len: Int, pixels: Seq[Int])

  /** STUB resize — stands in for bilinear downsampling: `target` samples
    * taken at stride len/target. The Spark contract (binary in, fixed-dim
    * output, partition-batched) matches a real resizer.
    */
  def resize(df: DataFrame, target: Int = 32): Dataset[Resized] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val len = payload.length
          if (len == 0) Resized(id, 0, Nil)
          else {
            val stride = math.max(1, len / target)
            val px = (0 until math.min(target, len)).map(i =>
              payload(math.min(i * stride, len - 1)) & 0xff)
            Resized(id, px.length, px)
          }
        }
      }
  }

  /** Fixed-dimension features: 16-bin byte-value histogram (b >>> 4). */
  case class Features(doc_id: Long, hist: Seq[Int])

  /** STUB feature extraction — stands in for an embedding model forward
    * pass; deterministic integer histogram so any engine can verify it.
    */
  def extractFeatures(df: DataFrame): Dataset[Features] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val hist = new Array[Int](16)
          payload.foreach(b => hist((b & 0xff) >>> 4) += 1)
          Features(id, hist.toSeq)
        }
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
