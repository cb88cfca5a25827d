package graft

import graft.sources.{BinaryText, PdfCrypto, Sources}
import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.security.MessageDigest
import java.util.zip.Deflater
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Encrypted-PDF extraction against fixtures built by an INDEPENDENT
  * re-implementation of the standard security handler's writer side
  * (ISO 32000 Algorithms 2/3/4/5 and the 32000-2 2.A/2.B family),
  * deliberately NOT sharing code with PdfCrypto: the /U verification
  * step only passes when both sides derive identical keys, so a
  * mirrored orchestration bug cannot self-cancel silently.
  */
class PdfCryptoSpec extends AnyFunSuite {

  // ---- writer-side crypto (test-local on purpose) ----

  private val Pad: Array[Byte] =
    ("28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E80" +
      "2F0CA9FE6453697A").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    parts.foreach(md.update)
    md.digest()
  }

  private def sha(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val md = MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(md.update)
    md.digest()
  }

  private def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = (0 until 256).toArray
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) % 256
      val t = s(i); s(i) = s(j); s(j) = t
    }
    var (x, y) = (0, 0)
    data.map { b =>
      x = (x + 1) % 256
      y = (y + s(x)) % 256
      val t = s(x); s(x) = s(y); s(y) = t
      (b ^ s((s(x) + s(y)) % 256)).toByte
    }
  }

  private def aes(mode: Int, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  private def padded(pass: String): Array[Byte] =
    (pass.getBytes(ISO_8859_1) ++ Pad).take(32)

  /** Algorithm 3: the /O entry. */
  private def computeO(ownerPass: String, userPass: String, r: Int, n: Int): Array[Byte] = {
    var h = md5(padded(ownerPass))
    if (r >= 3) for (_ <- 1 to 50) h = md5(h)
    val key = h.take(n)
    var o = rc4(key, padded(userPass))
    if (r >= 3) for (i <- 1 to 19) o = rc4(key.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithm 2: the file key. */
  private def fileKey(userPass: String, o: Array[Byte], p: Int,
      id0: Array[Byte], r: Int, n: Int): Array[Byte] = {
    val ple = Array(p, p >> 8, p >> 16, p >> 24).map(v => (v & 0xff).toByte)
    var h = md5(padded(userPass), o, ple, id0)
    if (r >= 3) for (_ <- 1 to 50) h = md5(h.take(n))
    h.take(n)
  }

  /** Algorithm 4 (R=2) / 5 (R≥3): the /U entry. */
  private def computeU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] = {
    if (r == 2) rc4(key, Pad)
    else {
      var x = rc4(key, md5(Pad, id0))
      for (i <- 1 to 19) x = rc4(key.map(b => (b ^ i).toByte), x)
      x ++ new Array[Byte](16)
    }
  }

  /** 32000-2 Algorithm 2.B, written loop-shape-differently from the
    * reader side. `udata` is the 48-byte /U string for owner-side
    * hashes, empty for user-side.
    */
  private def hash2B(pass: Array[Byte], salt: Array[Byte],
      udata: Array[Byte] = Array.empty): Array[Byte] = {
    var k = sha(256, pass, salt, udata)
    var round = 0
    var last = 256
    while (round < 64 || last > round - 32) {
      val block = pass ++ k ++ udata
      val k1 = Iterator.fill(64)(block).flatten.toArray
      val e = aes(Cipher.ENCRYPT_MODE, k.take(16), k.slice(16, 32), k1)
      k = sha(Seq(256, 384, 512)(e.take(16).foldLeft(0)((a, b) => a + (b & 0xff)) % 3), e)
      last = e.last & 0xff
      round += 1
    }
    k.take(32)
  }

  private def pkcs7(data: Array[Byte]): Array[Byte] = {
    val p = 16 - data.length % 16
    data ++ Array.fill(p)(p.toByte)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](8192)
    val bos = new ByteArrayOutputStream()
    while (!d.finished()) { val n = d.deflate(buf); bos.write(buf, 0, n) }
    d.end(); bos.toByteArray
  }

  private def hex(b: Array[Byte]): String =
    "<" + b.map("%02X".format(_)).mkString + ">"

  // ---- fixture assembly ----

  private val Text = "Vault text decrypts fine"
  private val P = -44
  private val Id0 = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)

  /** Content stream obj 4 + /Encrypt dict obj 7 + trailer. The stream
    * is deflated THEN encrypted (spec order: encryption is outermost).
    */
  private def assemble(encStream: Array[Byte], encDict: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.7\n".getBytes(ISO_8859_1))
    bos.write((s"4 0 obj << /Length ${encStream.length} /Filter /FlateDecode >>\n" +
      "stream\n").getBytes(ISO_8859_1))
    bos.write(encStream)
    bos.write(("\nendstream\nendobj\n" +
      s"7 0 obj $encDict endobj\n" +
      s"trailer << /Size 8 /Root 1 0 R /Encrypt 7 0 R /ID [${hex(Id0)} ${hex(Id0)}] >>\n" +
      "%%EOF\n").getBytes(ISO_8859_1))
    bos.toByteArray
  }

  private def objKeyMd5(key: Array[Byte], objNum: Int, aes: Boolean): Array[Byte] =
    md5(key, Array[Byte](objNum.toByte, 0, 0, 0, 0) ++
      (if (aes) "sAlT".getBytes(ISO_8859_1) else Array.empty[Byte]))
      .take(math.min(key.length + 5, 16))

  private def rc4Pdf(v: Int, r: Int, lengthBits: Int, userPass: String = ""): Array[Byte] = {
    val n = if (r == 2) 5 else lengthBits / 8
    val o = computeO("owner-secret", userPass, r, n)
    val key = fileKey(userPass, o, P, Id0, r, n)
    val u = computeU(key, Id0, r)
    val enc = rc4(objKeyMd5(key, 4, aes = false), deflate(s"BT ($Text) Tj ET".getBytes(ISO_8859_1)))
    val lengthEntry = if (v == 1) "" else s"/Length $lengthBits "
    assemble(enc, s"<< /Filter /Standard /V $v /R $r $lengthEntry" +
      s"/O ${hex(o)} /U ${hex(u)} /P $P >>")
  }

  private def aes128Pdf(userPass: String = ""): Array[Byte] = {
    val n = 16
    val o = computeO("owner-secret", userPass, 4, n)
    val key = fileKey(userPass, o, P, Id0, 4, n)
    val u = computeU(key, Id0, 4)
    val iv = Array.tabulate[Byte](16)(i => (i * 5 + 1).toByte)
    val enc = iv ++ aes(Cipher.ENCRYPT_MODE, objKeyMd5(key, 4, aes = true), iv,
      pkcs7(deflate(s"BT ($Text) Tj ET".getBytes(ISO_8859_1))))
    assemble(enc, "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
      "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O ${hex(o)} /U ${hex(u)} /P $P >>")
  }

  private def rc4CryptFilterPdf(): Array[Byte] = {
    val n = 16
    val o = computeO("owner-secret", "", 4, n)
    val key = fileKey("", o, P, Id0, 4, n)
    val u = computeU(key, Id0, 4)
    // /CFM /V2 = RC4 behind the V4 crypt-filter indirection: same object
    // key as V2/R3 but WITHOUT the AES sAlT suffix
    val enc = rc4(objKeyMd5(key, 4, aes = false), deflate(s"BT ($Text) Tj ET".getBytes(ISO_8859_1)))
    assemble(enc, "<< /Filter /Standard /V 4 /R 4 /Length 128 " +
      "/CF << /StdCF << /CFM /V2 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O ${hex(o)} /U ${hex(u)} /P $P >>")
  }

  private def aes256Pdf(userPass: String = "", r: Int = 6,
      ownerPass: String = "owner-secret"): Array[Byte] = {
    val key256 = Array.tabulate[Byte](32)(i => (i * 7 + 11).toByte)
    val vsalt = Array.tabulate[Byte](8)(i => (i + 1).toByte)
    val ksalt = Array.tabulate[Byte](8)(i => (i + 9).toByte)
    val pass = userPass.getBytes(ISO_8859_1)
    // R=5 (the deprecated AESV3 revision) hashes with single SHA-256;
    // R=6 with the Algorithm-2.B loop
    def h(salt: Array[Byte]) = if (r >= 6) hash2B(pass, salt) else sha(256, pass, salt)
    val u = h(vsalt) ++ vsalt ++ ksalt
    val ue = aes(Cipher.ENCRYPT_MODE, h(ksalt), new Array[Byte](16), key256)
    // real owner entries (Algorithm 12 writer side): the 48-byte /U
    // string joins the hash input, /OE wraps the same file key
    val opass = ownerPass.getBytes(ISO_8859_1)
    val ovsalt = Array.tabulate[Byte](8)(i => (i + 21).toByte)
    val oksalt = Array.tabulate[Byte](8)(i => (i + 31).toByte)
    def ho(salt: Array[Byte]) =
      if (r >= 6) hash2B(opass, salt, u) else sha(256, opass, salt, u)
    val o48 = ho(ovsalt) ++ ovsalt ++ oksalt
    val oe = aes(Cipher.ENCRYPT_MODE, ho(oksalt), new Array[Byte](16), key256)
    val iv = Array.tabulate[Byte](16)(i => (i * 9 + 4).toByte)
    val enc = iv ++ aes(Cipher.ENCRYPT_MODE, key256, iv,
      pkcs7(deflate(s"BT ($Text) Tj ET".getBytes(ISO_8859_1))))
    assemble(enc, s"<< /Filter /Standard /V 5 /R $r /Length 256 " +
      "/CF << /StdCF << /CFM /AESV3 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O ${hex(o48)} /OE ${hex(oe)} /U ${hex(u)} /UE ${hex(ue)} /P $P >>")
  }

  // ---- the tests ----

  test("RC4 40-bit (V1 R2): empty user password unlocks and text extracts") {
    assert(BinaryText.extract(rc4Pdf(v = 1, r = 2, lengthBits = 40)) == Text)
  }

  test("RC4 128-bit (V2 R3): 50-round key derivation and Algorithm-5 /U verify") {
    assert(BinaryText.extract(rc4Pdf(v = 2, r = 3, lengthBits = 128)) == Text)
  }

  test("AES-128 (V4 R4 /AESV2): sAlT-salted object key, IV prefix, PKCS#7 strip") {
    assert(BinaryText.extract(aes128Pdf()) == Text)
  }

  test("AES-256 (V5 R6): Algorithm-2.B hash validates /U and unwraps /UE") {
    assert(BinaryText.extract(aes256Pdf()) == Text)
  }

  test("AES-256 (V5 R5): single-SHA-256 revision also unlocks") {
    assert(BinaryText.extract(aes256Pdf(r = 5)) == Text)
  }

  test("V4 /CFM /V2: RC4 behind crypt filters (no sAlT in the object key)") {
    assert(BinaryText.extract(rc4CryptFilterPdf()) == Text)
  }

  test("non-empty user password: unlock fails, extraction degrades to salvage") {
    for (locked <- Seq(rc4Pdf(v = 2, r = 3, lengthBits = 128, userPass = "secret"),
        aes256Pdf(userPass = "secret"))) {
      val out = BinaryText.extract(locked)
      assert(!out.contains(Text), "locked file must not leak plaintext")
      // salvage output only — printable runs, no ciphertext control bytes
      assert(!out.exists(c => c != '\n' && c != '\t' && (c < ' ' || c > '~')))
    }
  }

  test("user password unlocks RC4 R3 / AES-128 / AES-256 R5+R6; wrong or " +
    "missing password degrades to salvage") {
    val fixtures = Seq(
      rc4Pdf(v = 2, r = 3, lengthBits = 128, userPass = "hunter2"),
      aes128Pdf(userPass = "hunter2"),
      aes256Pdf(userPass = "hunter2", r = 5),
      aes256Pdf(userPass = "hunter2", r = 6))
    for (locked <- fixtures) {
      assert(BinaryText.extract(locked, "hunter2") == Text,
        "right password must extract the exact text")
      for (bad <- Seq(BinaryText.extract(locked), BinaryText.extract(locked, "wrong"))) {
        assert(!bad.contains(Text), "locked file must not leak plaintext")
        assert(!bad.exists(c => c != '\n' && c != '\t' && (c < ' ' || c > '~')),
          "failed unlock must fall to printable salvage, not ciphertext")
      }
    }
  }

  test("R2 pads a short password with the spec constant (Algorithm 2 path)") {
    assert(BinaryText.extract(
      rc4Pdf(v = 1, r = 2, lengthBits = 40, userPass = "pw"), "pw") == Text)
  }

  test("OWNER password unlocks R2/R3/R4 via Algorithm 7 (recovered user padding) " +
    "and AES-256 R5/R6 via Algorithm 12 (/O validate, /OE unwrap)") {
    val fixtures = Seq(
      rc4Pdf(v = 1, r = 2, lengthBits = 40, userPass = "hunter2"),
      rc4Pdf(v = 2, r = 3, lengthBits = 128, userPass = "hunter2"),
      aes128Pdf(userPass = "hunter2"),
      aes256Pdf(userPass = "hunter2", r = 5),
      aes256Pdf(userPass = "hunter2", r = 6))
    for (locked <- fixtures) {
      assert(BinaryText.extract(locked, "owner-secret") == Text,
        "owner password must unlock without knowing the user password")
      val bad = BinaryText.extract(locked, "owner-wrong")
      assert(!bad.contains(Text), "wrong owner password must not leak plaintext")
    }
  }

  test("loadDocuments threads the password through to the security handler") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_pdfpw").toString
    Files.write(Paths.get(dir, "locked.pdf"),
      rc4Pdf(v = 2, r = 3, lengthBits = 128, userPass = "hunter2"))
    val unlocked = Sources.loadDocuments(TestSpark.spark, s"$dir/*.pdf",
        password = Some("hunter2"))
      .collect().map(r => r.getString(3)).toSeq
    assert(unlocked == Seq(Text))
    val locked = Sources.loadDocuments(TestSpark.spark, s"$dir/*.pdf")
      .collect().map(r => r.getString(3)).toSeq
    assert(!locked.head.contains(Text), "passwordless load must stay salvage")
  }

  test("stringValue: literal strings with escapes and hex strings parse to bytes") {
    val dict = "<< /O (ab\\051c\\\\d) /U <41424344> /UE (x) >>"
    assert(PdfCrypto.stringValue(dict, "O").get.sameElements("ab)c\\d".getBytes(ISO_8859_1)))
    assert(PdfCrypto.stringValue(dict, "U").get.sameElements("ABCD".getBytes(ISO_8859_1)))
    // /U must not match the /UE entry's value
    assert(PdfCrypto.stringValue(dict, "UE").get.sameElements("x".getBytes(ISO_8859_1)))
  }
}
