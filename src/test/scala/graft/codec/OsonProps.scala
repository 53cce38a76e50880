package graft.codec

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import org.scalacheck.{Gen, Prop, Properties, Test}
import Prop.forAll
import Oson._

/** Property fuzzing for the clean-room OSON binary-JSON codec (SURVEY
  * §2.4 F9). The reference's coverage is one hand-built vector
  * (`OsonTest.java:76`); these properties drive generated trees through
  * nested objects/arrays, duplicate keys, hash-colliding key orders and
  * unicode names/values.
  */
object OsonProps extends Properties("Oson") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(1000)

  // a small key pool forces duplicate keys and repeated dictionary
  // entries; unicode exercises the UTF-8 name segment
  private val genKey: Gen[String] = Gen.oneOf(
    "a", "b", "key", "k1", "k2", "идентификатор", "名前", "x-long-field-name",
    "nested", "v")

  private val genStr: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'Z', '0', ' ', 'ß', '中', '\n', '"', '\\'))
      .map(_.take(24).mkString)

  private val genNum: Gen[JBigDecimal] = for {
    nd <- Gen.choose(1, 20)
    d0 <- Gen.choose(1, 9)
    rest <- Gen.listOfN(nd - 1, Gen.choose(0, 9))
    neg <- Gen.oneOf(true, false)
    scale <- Gen.choose(-20, 30)
  } yield new JBigDecimal(
    new BigInteger((if (neg) "-" else "") + (d0 :: rest).mkString), scale)

  private val genLeaf: Gen[J] = Gen.frequency(
    1 -> Gen.const(JNull),
    2 -> Gen.oneOf(JBool(true), JBool(false)),
    4 -> genStr.map(JStr),
    3 -> genNum.map(JNum))

  private def genJ(depth: Int): Gen[J] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      4 -> genLeaf,
      2 -> Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, genJ(depth - 1)).map(is => JArr(is.toVector))),
      3 -> Gen.choose(0, 5).flatMap(n =>
        Gen.listOfN(n, Gen.zip(genKey, genJ(depth - 1)))
          .map(fs => JObj(fs.toVector))))

  private val genTree: Gen[J] = Gen.choose(0, 4).flatMap(genJ)

  property("encode∘decode∘encode is byte-stable (canonical form)") =
    forAll(genTree) { j =>
      val e = encode(j)
      encode(decode(e)).sameElements(e)
    }

  property("decode never loses scalar values (strings survive verbatim)") =
    forAll(genStr) { s =>
      decode(encode(JStr(s))) == JStr(s)
    }

  property("numbers roundtrip with numeric equality") =
    forAll(genNum) { n =>
      decode(encode(JNum(n))) match {
        case JNum(got) => got.compareTo(n) == 0
        case _ => false
      }
    }

  property("duplicate keys: last occurrence wins") =
    forAll(genKey, Gen.choose(2, 5), genStr) { (k, n, last) =>
      val fields = (0 until n - 1).map(i => k -> (JStr(s"v$i"): J)) :+
        (k -> (JStr(last): J))
      decode(encode(JObj(fields.toVector))) match {
        case JObj(fs) => fs == Vector(k -> JStr(last))
        case _ => false
      }
    }

  property("object key order never changes the bytes") =
    forAll(Gen.listOfN(4, Gen.zip(genKey, genLeaf))) { fs0 =>
      // distinct keys, two different insertion orders → same canonical bytes
      val fs = fs0.toMap.toVector
      encode(JObj(fs)).sameElements(encode(JObj(fs.reverse)))
    }

  property("decodeText emits parseable scalars for every tree") =
    forAll(genTree) { j =>
      // decodeText must at minimum produce a non-empty rendering and be
      // deterministic for the canonical bytes
      val e = encode(j)
      val t = decodeText(e)
      t.nonEmpty && t == decodeText(e)
    }
}
