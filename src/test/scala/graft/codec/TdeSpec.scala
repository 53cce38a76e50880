package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

class TdeSpec extends AnyFunSuite {

  private val dataKey = Array.tabulate[Byte](0x10 + 32)(i => (i * 13 + 5).toByte)

  private val samples = Seq(
    "hello TDE", "", "x", "0123456789abcdef", // exact block boundary
    "a longer plaintext value that spans multiple cipher blocks easily",
    new String(Array.tabulate(100)(i => ('a' + i % 26).toChar)))

  test("roundtrip across all enc algorithms, salted and unsalted") {
    for {
      enc <- Seq(Tde.Enc3Des168, Tde.EncAes128, Tde.EncAes192, Tde.EncAes256)
      salted <- Seq(true, false)
      s <- samples
    } {
      val plain = s.getBytes(UTF_8)
      val wire = Tde.encrypt(plain, dataKey, enc, Tde.IntNoMac, salted)
      assert(Tde.decrypt(wire, dataKey, enc, Tde.IntNoMac, salted).toSeq == plain.toSeq,
        s"enc=$enc salted=$salted value='$s'")
    }
  }

  test("SHA-1 MAC framing: 20 extra bytes, stripped on decrypt") {
    val plain = "mac framed".getBytes(UTF_8)
    val noMac = Tde.encrypt(plain, dataKey, Tde.EncAes256, Tde.IntNoMac, salted = true)
    val mac = Tde.encrypt(plain, dataKey, Tde.EncAes256, Tde.IntSha1, salted = true)
    assert(mac.length == noMac.length + 20)
    assert(Tde.decrypt(mac, dataKey, Tde.EncAes256, Tde.IntSha1, salted = true).toSeq
      == plain.toSeq)
  }

  test("SHA-1 MAC is verified: corrupted ciphertext fails loudly") {
    val plain = "integrity".getBytes(UTF_8)
    val wire = Tde.encrypt(plain, dataKey, Tde.EncAes256, Tde.IntSha1, salted = true)
    wire(0) = (wire(0) ^ 0x01).toByte // flip a ciphertext bit
    intercept[Tde.TdeException] {
      Tde.decrypt(wire, dataKey, Tde.EncAes256, Tde.IntSha1, salted = true)
    }
  }

  test("GCM roundtrip (standard JCE tag layout)") {
    for (salted <- Seq(true, false); s <- samples) {
      val plain = s.getBytes(UTF_8)
      val wire = Tde.encrypt(plain, dataKey, Tde.EncAes256, Tde.IntGcm, salted)
      assert(Tde.decrypt(wire, dataKey, Tde.EncAes256, Tde.IntGcm, salted).toSeq
        == plain.toSeq, s"salted=$salted value='$s'")
    }
  }

  test("salted wire carries the IV in the trailing block") {
    val plain = "iv carrier".getBytes(UTF_8)
    val wire = Tde.encrypt(plain, dataKey, Tde.EncAes128, Tde.IntNoMac, salted = true)
    // same plaintext, same deterministic IV derivation → same wire
    val again = Tde.encrypt(plain, dataKey, Tde.EncAes128, Tde.IntNoMac, salted = true)
    assert(wire.toSeq == again.toSeq)
    // corrupting the IV breaks the roundtrip
    wire(wire.length - 1) = (wire(wire.length - 1) ^ 0x55).toByte
    val out = Tde.decrypt(wire, dataKey, Tde.EncAes128, Tde.IntNoMac, salted = true)
    assert(out.toSeq != plain.toSeq)
  }

  test("wrong key fails loudly under GCM, silently garbles under CBC") {
    val plain = "secret".getBytes(UTF_8)
    val other = Array.tabulate[Byte](0x10 + 32)(i => (i * 31 + 1).toByte)
    val gcm = Tde.encrypt(plain, dataKey, Tde.EncAes256, Tde.IntGcm, salted = false)
    intercept[Tde.TdeException] {
      Tde.decrypt(gcm, other, Tde.EncAes256, Tde.IntGcm, salted = false)
    }
    val cbc = Tde.encrypt(plain, dataKey, Tde.EncAes256, Tde.IntNoMac, salted = false)
    assert(Tde.decrypt(cbc, other, Tde.EncAes256, Tde.IntNoMac, salted = false).toSeq
      != plain.toSeq)
  }

  test("truncated ciphertext and short keys are rejected") {
    intercept[Tde.TdeException] {
      Tde.decrypt(Array[Byte](1, 2, 3), dataKey, Tde.EncAes256, Tde.IntSha1, salted = true)
    }
    intercept[Tde.TdeException] {
      Tde.encrypt("x".getBytes(UTF_8), new Array[Byte](8), Tde.EncAes128,
        Tde.IntNoMac, salted = false)
    }
  }

  test("wallet wraps and unwraps data keys by master-key id") {
    val master = Array.tabulate[Byte](32)(i => (i * 3 + 11).toByte)
    val wallet = new TdeWallet(Map("MK01" -> master))
    val wrapped = wallet.wrapDataKey("MK01", dataKey)
    assert(wrapped.toSeq != dataKey.toSeq)
    assert(wallet.decryptDataKey("MK01", wrapped).toSeq == dataKey.toSeq)
    // id is trimmed like the reference's trailing-zero-stripped MKEYID
    assert(wallet.decryptDataKey(" MK01 ", wrapped).toSeq == dataKey.toSeq)
    intercept[Tde.TdeException] { wallet.decryptDataKey("MK02", wrapped) }
    // a tampered blob fails the GCM tag
    wrapped(wrapped.length - 1) = (wrapped(wrapped.length - 1) ^ 1).toByte
    intercept[Tde.TdeException] { wallet.decryptDataKey("MK01", wrapped) }
  }

  test("end-to-end: wallet-unwrapped key drives the column decrypt") {
    val master = Array.tabulate[Byte](32)(i => (i + 42).toByte)
    val wallet = new TdeWallet(Map("CDB$MK" -> master))
    val wrapped = wallet.wrapDataKey("CDB$MK", dataKey)
    val plain = "column value".getBytes(UTF_8)
    val wire = Tde.encrypt(plain, dataKey, Tde.EncAes192, Tde.IntSha1, salted = true)
    val unwrapped = wallet.decryptDataKey("CDB$MK", wrapped)
    assert(Tde.decrypt(wire, unwrapped, Tde.EncAes192, Tde.IntSha1, salted = true).toSeq
      == plain.toSeq)
  }
}
