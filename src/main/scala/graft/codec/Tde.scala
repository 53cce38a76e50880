package graft.codec

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, IvParameterSpec, SecretKeySpec}

/** TDE column-encryption codec (F11).
  *
  * Clean-room re-expression of the reference's column decrypter
  * (`internals/OraCdcTdeColumnDecrypter.java:31-197`, composed into the
  * decode path at `runtime/data/GenericDecoders.java:449-455`):
  *
  *  - enc algorithm codes 1=3DES168, 2=AES128, 3=AES192, 4=AES256;
  *    integrity codes 1=SHA-1 MAC (20 bytes), 2=NOMAC, 3=GCM (16-byte tag);
  *  - wire layout `[ciphertext][mac?][iv?]`: a salted column carries its
  *    IV in the trailing 8 (3DES) / 16 (AES) bytes; unsalted uses the
  *    all-zero IV;
  *  - the cipher key is `dataKey[0x10, 0x10+keyLen)` — the unwrapped
  *    data-key blob carries 16 bytes of header first;
  *  - plaintext is padded with n bytes of value n (n = 1..blockSize),
  *    stripped after decrypt by suffix inspection (the reference's
  *    `padOrclBytes`).
  *
  * GCM deviation, on purpose: the reference inits GCM with the tag
  * region passed as AAD and the ciphertext WITHOUT the tag, which the
  * JCE rejects (JCE GCM requires ciphertext||tag as cipher input). This
  * codec uses the standard JCE layout `[ciphertext||tag][iv?]` instead,
  * with no AAD — interoperable with any JCE writer.
  *
  * Ciphers are cached per-thread: a 100 TB scan decrypting a column on
  * every row must not allocate a `Cipher` per value.
  */
object Tde {

  final class TdeException(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  val Enc3Des168 = 1
  val EncAes128 = 2
  val EncAes192 = 3
  val EncAes256 = 4
  val IntSha1 = 1
  val IntNoMac = 2
  val IntGcm = 3

  private def keyLen(encAlg: Int): Int = encAlg match {
    case Enc3Des168 => 24
    case EncAes128 => 16
    case EncAes192 => 24
    case EncAes256 => 32
    case other => throw new TdeException(s"unknown TDE enc algorithm $other")
  }

  private def blockLen(encAlg: Int): Int = if (encAlg == Enc3Des168) 8 else 16

  private def jceName(encAlg: Int, intAlg: Int): String =
    if (encAlg == Enc3Des168) "DESede/CBC/NoPadding"
    else if (intAlg == IntGcm) "AES/GCM/NoPadding"
    else "AES/CBC/NoPadding"

  private val ciphers = new ThreadLocal[java.util.HashMap[String, Cipher]] {
    override def initialValue() = new java.util.HashMap[String, Cipher]()
  }

  private def cipher(encAlg: Int, intAlg: Int, forEncrypt: Boolean): Cipher = {
    // JCE refuses to re-init a GCM cipher for ENCRYPT with a repeated
    // key+IV; deterministic IVs are the point here (reproducible
    // fixtures), so GCM encryption gets a fresh instance per call
    if (intAlg == IntGcm && forEncrypt)
      return Cipher.getInstance(jceName(encAlg, intAlg))
    val name = jceName(encAlg, intAlg)
    val cache = ciphers.get()
    var c = cache.get(name)
    if (c == null) { c = Cipher.getInstance(name); cache.put(name, c) }
    c
  }

  private def secretKey(dataKey: Array[Byte], encAlg: Int): SecretKeySpec = {
    val kl = keyLen(encAlg)
    if (dataKey.length < 0x10 + kl)
      throw new TdeException(s"data key too short: ${dataKey.length} < ${0x10 + kl}")
    new SecretKeySpec(dataKey, 0x10, kl,
      if (encAlg == Enc3Des168) "DESede" else "AES")
  }

  /** Decrypt one encrypted column value. Mirrors
    * `OraCdcTdeColumnDecrypter.decrypt:157-196`.
    */
  def decrypt(data: Array[Byte], dataKey: Array[Byte], encAlg: Int,
      intAlg: Int, salted: Boolean): Array[Byte] = {
    val bl = blockLen(encAlg)
    val overhead = (if (salted) bl else 0) + (if (intAlg == IntSha1) 20 else 0)
    if (data.length <= overhead)
      throw new TdeException(s"ciphertext too short (${data.length} bytes)")
    var ctLen = data.length
    val iv: Array[Byte] =
      if (salted) {
        ctLen -= bl
        java.util.Arrays.copyOfRange(data, ctLen, ctLen + bl)
      } else new Array[Byte](bl)
    if (intAlg == IntSha1) {
      ctLen -= 20
      // VERIFY the MAC, don't just strip it (the reference strips
      // without checking — `decrypt:170-171` — which makes the
      // integrity mode a no-op; this codec's writer defines
      // mac = SHA-1(ciphertext), so corruption must fail loudly)
      val expect = MessageDigest.getInstance("SHA-1").digest(
        java.util.Arrays.copyOfRange(data, 0, ctLen))
      if (!MessageDigest.isEqual(expect,
          java.util.Arrays.copyOfRange(data, ctLen, ctLen + 20)))
        throw new TdeException("TDE SHA-1 MAC mismatch (corrupt ciphertext)")
    }
    try {
      val c = cipher(encAlg, intAlg, forEncrypt = false)
      if (intAlg == IntGcm)
        c.init(Cipher.DECRYPT_MODE, secretKey(dataKey, encAlg),
          new GCMParameterSpec(128, iv))
      else
        c.init(Cipher.DECRYPT_MODE, secretKey(dataKey, encAlg),
          new IvParameterSpec(iv))
      val plain = c.doFinal(data, 0, ctLen)
      if (intAlg == IntGcm) plain // GCM is unpadded
      else stripPad(plain)
    } catch {
      case e: java.security.GeneralSecurityException =>
        throw new TdeException(s"TDE decrypt failed: ${e.getMessage}", e)
    }
  }

  /** Encrypt one column value into the wire layout `decrypt` accepts.
    * A salted value derives its IV deterministically from the plaintext
    * (SHA-256 prefix), so encode∘decode is reproducible across engines
    * and partitionings.
    *
    * SECURITY NOTE — unsalted mode: the NO SALT wire layout carries NO
    * IV (the reference's decrypter reads the same layout with a fixed
    * IV), so every unsalted value under one data key encrypts under the
    * SAME nonce. For GCM that is textbook nonce reuse: keystream XORs
    * leak and the GHASH key is recoverable. That weakness is a property
    * of the FORMAT this codec reproduces, not a choice this writer can
    * fix without breaking format fidelity — this encrypt side exists to
    * produce reference-format test fixtures; do NOT use it as a
    * general-purpose encryption API, and prefer `salted = true`
    * whenever the consuming layout permits.
    */
  def encrypt(plain: Array[Byte], dataKey: Array[Byte], encAlg: Int,
      intAlg: Int, salted: Boolean): Array[Byte] = {
    val bl = blockLen(encAlg)
    val iv: Array[Byte] =
      if (salted)
        java.util.Arrays.copyOf(
          MessageDigest.getInstance("SHA-256").digest(plain), bl)
      else new Array[Byte](bl)
    try {
      val c = cipher(encAlg, intAlg, forEncrypt = true)
      val ct =
        if (intAlg == IntGcm) {
          c.init(Cipher.ENCRYPT_MODE, secretKey(dataKey, encAlg),
            new GCMParameterSpec(128, iv))
          c.doFinal(plain) // JCE appends the 16-byte tag
        } else {
          c.init(Cipher.ENCRYPT_MODE, secretKey(dataKey, encAlg),
            new IvParameterSpec(iv))
          c.doFinal(pad(plain, bl))
        }
      val mac: Array[Byte] =
        if (intAlg == IntSha1) MessageDigest.getInstance("SHA-1").digest(ct)
        else Array.emptyByteArray
      val out = new Array[Byte](ct.length + mac.length + (if (salted) bl else 0))
      System.arraycopy(ct, 0, out, 0, ct.length)
      System.arraycopy(mac, 0, out, ct.length, mac.length)
      if (salted) System.arraycopy(iv, 0, out, ct.length + mac.length, bl)
      out
    } catch {
      case e: java.security.GeneralSecurityException =>
        throw new TdeException(s"TDE encrypt failed: ${e.getMessage}", e)
    }
  }

  /** Oracle pad: n bytes of value n. Always pads (a full block when the
    * plaintext is already aligned), like PKCS#5/7 with Oracle's codes.
    */
  private def pad(plain: Array[Byte], block: Int): Array[Byte] = {
    val n = block - (plain.length % block)
    val out = java.util.Arrays.copyOf(plain, plain.length + n)
    java.util.Arrays.fill(out, plain.length, out.length, n.toByte)
    out
  }

  /** The reference's `padOrclBytes`: a valid suffix of n bytes of value
    * n (n ≤ block) is padding; anything else means unpadded data.
    */
  private def stripPad(plain: Array[Byte]): Array[Byte] = {
    val last = plain(plain.length - 1) & 0xff
    if (last < 1 || last > 16 || last > plain.length) return plain
    var i = plain.length - last
    while (i < plain.length) {
      if ((plain(i) & 0xff) != last) return plain
      i += 1
    }
    java.util.Arrays.copyOfRange(plain, 0, plain.length - last)
  }
}

/** Synthetic wallet double: master keys by id, data-key blobs wrapped
  * AES/GCM under a master key. Mirrors the shape of the reference's
  * `OraCdcTdeWallet.decryptDataKey` (`internals/OraCdcTdeWallet.java`,
  * used from `OraCdcTdeColumnDecrypter.get:90-115`) without the
  * PKCS#12 wallet file, which cannot exist in this environment.
  */
final class TdeWallet(masterKeys: Map[String, Array[Byte]]) {
  import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

  private def master(id: String): SecretKeySpec = {
    val k = masterKeys.getOrElse(id.trim,
      throw new Tde.TdeException(s"no master key '$id' in wallet"))
    new SecretKeySpec(k, "AES")
  }

  /** Wrap a data key under a master key: [iv(12)][ct||tag]. */
  def wrapDataKey(masterKeyId: String, dataKey: Array[Byte]): Array[Byte] = {
    val iv = java.util.Arrays.copyOf(
      java.security.MessageDigest.getInstance("SHA-256").digest(dataKey), 12)
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, master(masterKeyId), new GCMParameterSpec(128, iv))
    val ct = c.doFinal(dataKey)
    val out = new Array[Byte](12 + ct.length)
    System.arraycopy(iv, 0, out, 0, 12)
    System.arraycopy(ct, 0, out, 12, ct.length)
    out
  }

  def decryptDataKey(masterKeyId: String, wrapped: Array[Byte]): Array[Byte] =
    // init + parameter construction INSIDE the try: a short blob throws
    // IllegalArgumentException from GCMParameterSpec and a bad master
    // key throws InvalidKeyException from init — both must surface as
    // TdeException like every other failure of this codec
    try {
      val c = Cipher.getInstance("AES/GCM/NoPadding")
      c.init(Cipher.DECRYPT_MODE, master(masterKeyId),
        new GCMParameterSpec(128, wrapped, 0, 12))
      c.doFinal(wrapped, 12, wrapped.length - 12)
    } catch {
      case e @ (_: java.security.GeneralSecurityException |
                _: IllegalArgumentException) =>
        throw new Tde.TdeException(s"data-key unwrap failed: ${e.getMessage}", e)
    }
}
