package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column plumbing (BASELINE.json mandate): image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs batched per partition on executors.
  *
  * The image path is REAL: `syntheticPng` renders deterministic RGB
  * images and encodes them with the JDK's `javax.imageio` PNG writer;
  * `decodePng` / `resizePng` decode those bytes back and compute pixel
  * statistics / a box-filter downsample. Because PNG is lossless and
  * the pixel function is closed-form in (doc_id, x, y), a SQL oracle
  * can state the expected output WITHOUT decoding — the gate match
  * proves the whole encode→bytes→decode roundtrip is pixel-exact.
  * Audio/video codecs are NOT in this container, so the frame-sample
  * and feature-histogram kernels remain clearly-marked deterministic
  * stand-ins over the same partition-batched plumbing.
  */
object Multimodal {

  /** Decoded image: dimensions + per-channel pixel sums. */
  case class DecodedImage(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** A sampled "video frame" fingerprint. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_sig: String)

  private def md5Hex(md: MessageDigest, bytes: Array[Byte]): String =
    md.digest(bytes).map(b => f"$b%02x").mkString

  /** Deterministic synthetic image dimensions/channels for doc `id` —
    * the closed form the SQL oracle restates. All arithmetic stays in
    * Long and every term is non-negative, so `%` is a true mod.
    */
  def imgWidth(id: Long): Int = (16 + id % 17).toInt
  def imgHeight(id: Long): Int = (16 + (id * 7) % 13).toInt
  def red(id: Long, x: Int, y: Int): Int = ((id + 31L * x + 7L * y) % 256).toInt
  def green(id: Long, x: Int, y: Int): Int = ((3 * id + 5L * x + 11L * y) % 256).toInt
  def blue(id: Long, x: Int, y: Int): Int = ((7 * id + 13L * x + 3L * y) % 256).toInt

  /** REAL PNG bytes for doc `id` (fixture generator, runs on executors):
    * renders the closed-form RGB image and encodes it with the JDK
    * ImageIO PNG writer. In production this column arrives from
    * storage; here the generator doubles as the proof fixture.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val (w, h) = (imgWidth(id), imgHeight(id))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y,
          (red(id, x, y) << 16) | (green(id, x, y) << 8) | blue(id, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(w * h / 2 + 128)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode over (doc_id, payload) binary PNG columns —
    * `javax.imageio` per partition batch (ImageIO disk cache off: an
    * executor thread must never stage decodes through temp files), rows
    * streamed, fixed-schema features out, no driver involvement.
    */
  def decodePng(df: DataFrame): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null, s"doc $id: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >>> 16) & 0xff; sg += (rgb >>> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          DecodedImage(id, w, h, sr, sg, sb)
        }
      }
  }

  /** Box-filter resize output: `target`×`target` red-channel pixels in
    * row-major order.
    */
  case class Resized(doc_id: Long, out_w: Int, out_h: Int, pixels: Seq[Int])

  /** REAL box-filter downsample of the decoded red channel to a fixed
    * `target`×`target` grid: output (j,i) is the floored mean of the
    * source block [i·w/t,(i+1)·w/t) × [j·h/t,(j+1)·h/t). Integer
    * arithmetic end-to-end so any engine can restate it exactly.
    * Requires source dimensions ≥ `target` (the synthetic fixtures'
    * minimum 16×16 with the default target 8).
    */
  def resizePng(df: DataFrame, target: Int = 8): Dataset[Resized] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null, s"doc $id: payload is not a decodable image")
          val (w, h) = (img.getWidth, img.getHeight)
          val px = for {
            j <- 0 until target
            i <- 0 until target
          } yield {
            val (x0, x1) = (i * w / target, (i + 1) * w / target)
            val (y0, y1) = (j * h / target, (j + 1) * h / target)
            var sum = 0L
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { sum += (img.getRGB(x, y) >>> 16) & 0xff; x += 1 }
              y += 1
            }
            (sum / ((x1 - x0).toLong * (y1 - y0))).toInt
          }
          Resized(id, target, target, px)
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
