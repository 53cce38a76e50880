package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property coverage for the multimodal fixture codecs — the
  * gates verify per-doc SUMS (which compensating pixel errors could in
  * principle satisfy); these tests pin EVERY pixel / sample / frame to
  * the closed form across many ids, and stress the thread-local
  * reader/writer reuse the SPI fix introduced (a state leak between
  * clips in the stateful GIF sequence writer would corrupt later clips
  * on the same executor thread).
  */
class MultimodalCodecProps extends AnyFunSuite {

  private def ids(n: Int, seed: Long): Seq[Long] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(math.abs(r.nextLong()) % 1000000L)
  }

  private def decodePixels(png: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null)
    img
  }

  test("PNG roundtrip is pixel-exact for every channel across random ids") {
    ids(100, 1L).foreach { id =>
      val img = decodePixels(Multimodal.syntheticPng(id))
      assert(img.getWidth == Multimodal.imgWidth(id))
      assert(img.getHeight == Multimodal.imgHeight(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >>> 16) & 0xff) == Multimodal.red(id, x, y),
          s"id=$id R($x,$y)")
        assert(((rgb >>> 8) & 0xff) == Multimodal.green(id, x, y),
          s"id=$id G($x,$y)")
        assert((rgb & 0xff) == Multimodal.blue(id, x, y), s"id=$id B($x,$y)")
      }
    }
  }

  test("GIF container holds every frame pixel-exact, not just sum-exact") {
    ids(60, 2L).foreach { id =>
      val reader =
        javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(Multimodal.syntheticGif(id))))
      val n = reader.getNumImages(true)
      assert(n == Multimodal.vidFrames(id), s"id=$id frame count")
      for (f <- 0 until n) {
        val img = reader.read(f)
        assert(img.getWidth == Multimodal.VidW && img.getHeight == Multimodal.VidH)
        for (y <- 0 until Multimodal.VidH; x <- 0 until Multimodal.VidW)
          assert((img.getRGB(x, y) & 0xff) == Multimodal.gray(id, f, x, y),
            s"id=$id frame=$f px($x,$y)")
      }
      reader.dispose()
    }
  }

  test("WAV PCM is sample-exact on both channels across random ids") {
    ids(60, 3L).foreach { id =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.syntheticWav(id)))
      val fmt = in.getFormat
      assert(fmt.getChannels == 2 && fmt.getSampleSizeInBits == 16)
      val n = Multimodal.audioFrames(id)
      val buf = in.readAllBytes()
      assert(buf.length == n * 4, s"id=$id byte length")
      for (t <- 0 until n) {
        val s0 = ((buf(4 * t + 1) << 8) | (buf(4 * t) & 0xff)).toShort.toInt
        val s1 = ((buf(4 * t + 3) << 8) | (buf(4 * t + 2) & 0xff)).toShort.toInt
        assert(s0 == Multimodal.audioSample(id, 0, t), s"id=$id ch0 t=$t")
        assert(s1 == Multimodal.audioSample(id, 1, t), s"id=$id ch1 t=$t")
      }
    }
  }

  test("thread-local codec reuse leaks no state between clips or threads") {
    // the SPI fix reuses one GIF sequence writer / PNG writer per thread
    // via reset(); encode many clips per thread concurrently and verify
    // every payload still decodes pixel-exact (a leaked palette, frame
    // buffer or sequence state would corrupt subsequent clips)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val perThread = 40
    val futures = (0 until 8).map { t =>
      Future {
        ids(perThread, 100L + t).foreach { id =>
          val img = decodePixels(Multimodal.syntheticPng(id))
          assert(img.getWidth == Multimodal.imgWidth(id), s"thread=$t id=$id")
          val gif = Multimodal.syntheticGif(id)
          val reader =
            javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(gif)))
          assert(reader.getNumImages(true) == Multimodal.vidFrames(id),
            s"thread=$t id=$id")
          val f0 = reader.read(0)
          for (y <- 0 until Multimodal.VidH; x <- 0 until Multimodal.VidW)
            assert((f0.getRGB(x, y) & 0xff) == Multimodal.gray(id, 0, x, y),
              s"thread=$t id=$id px($x,$y)")
          reader.dispose()
        }
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
  }
}
