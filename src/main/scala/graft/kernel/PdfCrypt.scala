package graft.kernel

/** PDF standard security handler (ISO 32000-1 §7.6.3) for documents with
  * an EMPTY user password — the common "encrypted but openable" shape
  * (Tika opens these transparently; reference behavior via delegation).
  * Supports V1/V2 RC4 (40-128 bit, revisions 2-3) and V4 AESV2
  * (AES-128-CBC, revision 4). Password-protected documents (user
  * password verification fails) are rejected by the caller.
  *
  * All algorithms follow the public spec: Algorithm 2 (file key from
  * padded password + /O + /P + /ID), Algorithms 4/5 (user-password
  * verification), Algorithm 1 (per-object key = MD5(fileKey || objnum
  * || gennum [|| sAlT]) truncated to min(n+5, 16)). RC4 is implemented
  * directly (20 lines, public algorithm); MD5/AES come from the JRE.
  *
  * private[graft]: the corpus writer encrypts with the same primitives
  * (RC4 itself is pinned by the public Wikipedia test vectors in
  * KernelSpec, MD5/AES by the JRE).
  */
private[graft] object PdfCrypt {

  /** The spec's 32-byte password padding string (Algorithm 2 step a). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  // getInstance does a provider lookup per call; the R6 KDF makes 64+
  // digest + cipher calls PER DOCUMENT, so executor threads cache their
  // instances (all are stateful-but-resettable; threads never share)
  private val digests = new ThreadLocal[java.util.HashMap[String, java.security.MessageDigest]] {
    override def initialValue() = new java.util.HashMap()
  }
  private def digest(alg: String): java.security.MessageDigest = {
    val m = digests.get()
    var d = m.get(alg)
    if (d == null) { d = java.security.MessageDigest.getInstance(alg); m.put(alg, d) }
    d.reset()
    d
  }
  private val aesCbc = new ThreadLocal[javax.crypto.Cipher] {
    override def initialValue() = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
  }

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = digest("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 stream cipher (symmetric: same call encrypts and decrypts). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0
    j = 0
    var x = 0
    while (x < data.length) {
      i = (i + 1) & 0xff
      j = (j + (s(i) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(x) = (data(x) ^ s((s(i) & 0xff) + (s(j) & 0xff) & 0xff)).toByte
      x += 1
    }
    out
  }

  private def pLe(p: Int): Array[Byte] =
    Array((p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)

  /** Algorithm 2: file encryption key for the EMPTY user password. */
  def fileKey(o: Array[Byte], p: Int, id0: Array[Byte], rev: Int,
      lengthBits: Int, encryptMetadata: Boolean = true): Array[Byte] = {
    val n = math.max(5, math.min(16, lengthBits / 8))
    var extra = Array.emptyByteArray
    if (rev >= 4 && !encryptMetadata)
      extra = Array(0xff, 0xff, 0xff, 0xff).map(_.toByte)
    var h = md5(Pad, o, pLe(p), id0, extra)
    if (rev >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(n)); i += 1 }
    }
    h.take(n)
  }

  /** Algorithm 3: the /O entry for empty owner AND user passwords. */
  def oEntry(rev: Int, lengthBits: Int): Array[Byte] = {
    val n = math.max(5, math.min(16, lengthBits / 8))
    var h = md5(Pad) // empty owner password, padded
    if (rev >= 3) {
      var i = 0
      while (i < 50) { h = md5(h); i += 1 }
    }
    val key = h.take(n)
    var out = rc4(key, Pad) // empty user password, padded
    if (rev >= 3) {
      var i = 1
      while (i <= 19) {
        out = rc4(key.map(b => (b ^ i).toByte), out)
        i += 1
      }
    }
    out
  }

  /** Algorithms 4/5: the /U entry for the given file key. R2 gives 32
    * significant bytes; R>=3 gives 16 (padded to 32 with zeros here).
    */
  def uEntry(key: Array[Byte], rev: Int, id0: Array[Byte]): Array[Byte] = {
    if (rev == 2) rc4(key, Pad)
    else {
      var out = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        out = rc4(key.map(b => (b ^ i).toByte), out)
        i += 1
      }
      out ++ new Array[Byte](16)
    }
  }

  /** Does the EMPTY user password open this document? (Algorithm 6:
    * recompute U and compare — all 32 bytes for R2, first 16 for R>=3.)
    */
  def verifyEmptyUser(key: Array[Byte], rev: Int, id0: Array[Byte],
      u: Array[Byte]): Boolean = {
    val expect = uEntry(key, rev, id0)
    val cmp = if (rev == 2) 32 else 16
    u.length >= cmp && expect.take(cmp).sameElements(u.take(cmp))
  }

  // ---------------- R6 / AES-256 (PDF 2.0, Algorithm 2.A/2.B) ----------

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = digest(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private def aesCbcNoPad(encrypt: Boolean, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = aesCbc.get()
    c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
      else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Algorithm 2.B: the R6 hardened hash (SHA-256/384/512 rounds driven
    * by AES-128-CBC of the repeated input). `udata` = the 48-byte /U for
    * owner-password hashes, empty for user-password hashes.
    */
  def hash2B(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", password, salt, udata)
    var round = 0
    var lastE = 0
    var done = false
    while (!done) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      val e = aesCbcNoPad(encrypt = true, k.take(16), k.slice(16, 32), k1)
      var mod = 0
      i = 0
      while (i < 16) { mod += e(i) & 0xff; i += 1 }
      k = (mod % 3) match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case _ => sha("SHA-512", e)
      }
      lastE = e(e.length - 1) & 0xff
      round += 1
      done = round >= 64 && lastE <= round - 32
    }
    k.take(32)
  }

  /** R6 empty-user-password check + file key recovery: U = hash(32) ||
    * validationSalt(8) || keySalt(8); UE = AES-256-CBC(iv=0) of the file
    * key under the intermediate key. None when the password is real.
    */
  def r6FileKey(u: Array[Byte], ue: Array[Byte]): Option[Array[Byte]] = {
    if (u.length < 48 || ue.length < 32) return None
    val valSalt = u.slice(32, 40)
    val keySalt = u.slice(40, 48)
    if (!hash2B(Array.emptyByteArray, valSalt, Array.emptyByteArray)
        .sameElements(u.take(32))) return None
    val inter = hash2B(Array.emptyByteArray, keySalt, Array.emptyByteArray)
    Some(aesCbcNoPad(encrypt = false, inter, new Array[Byte](16), ue.take(32)))
  }

  /** Writer-side R6 credentials for the empty password: deterministic
    * salts from `seed`; returns (U, UE, O, OE, fileKey).
    */
  def r6Credentials(seed: Array[Byte]): (Array[Byte], Array[Byte],
      Array[Byte], Array[Byte], Array[Byte]) = {
    val fileKey = sha("SHA-256", seed, Array[Byte]('f', 'k'))
    val uValSalt = sha("SHA-256", seed, Array[Byte]('u', 'v')).take(8)
    val uKeySalt = sha("SHA-256", seed, Array[Byte]('u', 'k')).take(8)
    val u = hash2B(Array.emptyByteArray, uValSalt, Array.emptyByteArray) ++
      uValSalt ++ uKeySalt
    val uInter = hash2B(Array.emptyByteArray, uKeySalt, Array.emptyByteArray)
    val ue = aesCbcNoPad(encrypt = true, uInter, new Array[Byte](16), fileKey)
    val oValSalt = sha("SHA-256", seed, Array[Byte]('o', 'v')).take(8)
    val oKeySalt = sha("SHA-256", seed, Array[Byte]('o', 'k')).take(8)
    val o = hash2B(Array.emptyByteArray, oValSalt, u) ++ oValSalt ++ oKeySalt
    val oInter = hash2B(Array.emptyByteArray, oKeySalt, u)
    val oe = aesCbcNoPad(encrypt = true, oInter, new Array[Byte](16), fileKey)
    (u, ue, o, oe, fileKey)
  }

  private val AesSalt = Array('s', 'A', 'l', 'T').map(_.toByte)

  /** Per-document decryptor/encryptor state. v5 = AES-256 (AESV3): the
    * file key is used directly, with no per-object derivation.
    */
  /** `strings = false` when /StrF is Identity (ISO 32000 §7.6.5): stream
    * payloads decrypt with StdCF but string objects pass through verbatim.
    */
  final case class Crypt(key: Array[Byte], aes: Boolean, v5: Boolean = false,
      strings: Boolean = true) {

    /** Algorithm 1: the per-object key (identity for AESV3). */
    def objKey(num: Int, gen: Int): Array[Byte] = {
      if (v5) return key
      val tail = Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
      val h = md5(key, tail, if (aes) AesSalt else Array.emptyByteArray)
      h.take(math.min(key.length + 5, 16))
    }

    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val k = objKey(num, gen)
      if (!aes) rc4(k, data)
      else {
        if (data.length < 32 || data.length % 16 != 0) return data // malformed
        val cipher = aesCbc.get()
        cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(k, "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        val plain = cipher.doFinal(data, 16, data.length - 16)
        val padLen = plain.last & 0xff // PKCS#5
        if (padLen >= 1 && padLen <= 16 && padLen <= plain.length)
          plain.dropRight(padLen)
        else plain
      }
    }

    /** Writer-side encrypt (AES prepends a deterministic IV + PKCS#5). */
    def encrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val k = objKey(num, gen)
      if (!aes) rc4(k, data)
      else {
        val padLen = 16 - (data.length % 16)
        val padded = data ++ Array.fill(padLen)(padLen.toByte)
        val iv = md5(k, Array(num.toByte, gen.toByte)).take(16) // deterministic
        val cipher = aesCbc.get()
        cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(k, "AES"),
          new javax.crypto.spec.IvParameterSpec(iv))
        iv ++ cipher.doFinal(padded)
      }
    }
  }
}
