package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit fixtures for the LLM-pipeline function layer: known-value hash
  * folds, shingles, simhash determinism, quantized vector math, and the
  * multimodal stub plumbing.
  */
class PipelineFunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def one[T](c: org.apache.spark.sql.Column): T = {
    import spark.implicits._
    spark.range(1).select(c.as("v")).collect()(0).getAs[T]("v")
  }

  private def oneSeq[T](c: org.apache.spark.sql.Column): Seq[T] =
    one[scala.collection.Seq[T]](c).toSeq

  test("stringHash matches the documented fold ((0*31+c0)...)") {
    // 'abc': ((97*31)+98)*31+99 = 96354
    assert(one[Long](TextFunctions.stringHash(lit("abc"))) == 96354L)
  }

  test("tokens filters empty strings, shingles window correctly") {
    val toks = TextFunctions.tokens(lit("a  b c"))
    assert(oneSeq[String](toks) == Seq("a", "b", "c"))
    assert(oneSeq[String](TextFunctions.wordShingles(toks, 2)) ==
      Seq("a b", "b c"))
    // fewer tokens than n → empty, not a descending-sequence artifact
    assert(oneSeq[String](TextFunctions.wordShingles(
      TextFunctions.tokens(lit("solo")), 2)) == Seq.empty)
  }

  test("quantize/dot are exact integers") {
    val a = typedLit(Seq(0.5f, -0.25f))
    val b = typedLit(Seq(1.0f, 1.0f))
    assert(oneSeq[Long](VectorFunctions.quantize(a)) == Seq(500000L, -250000L))
    // 500000·1000000 + (−250000)·1000000 = 2.5e11 (exact in Long)
    assert(one[Long](VectorFunctions.dotQ(
      VectorFunctions.quantize(a), VectorFunctions.quantize(b))) == 250000000000L)
  }

  test("simhash16 is stable and within 16 bits") {
    val hs = TextFunctions.simHash16(
      transform(TextFunctions.tokens(lit("spark table spark")),
        t => TextFunctions.stringHash(t)))
    val v = one[Long](hs)
    assert(v >= 0 && v < 65536)
    assert(v == one[Long](hs)) // deterministic
  }

  test("multimodal stub decode shape") {
    import spark.implicits._
    val df = Seq((1L, "hello world! padding to make it longer 123"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("payload"))
    val out = Multimodal.decodeBatch(df).collect()
    assert(out.length == 1)
    assert(out(0).byte_len == 42)
    assert(out(0).width == 42 % 640 && out(0).height == (42 * 7) % 480)
    assert(out(0).sig.length == 8)
    val frames = Multimodal.sampleFrames(df).collect()
    assert(frames.map(_.frame_idx).toSeq == Seq(0)) // 2 frames, step 4 → idx 0
  }
}
