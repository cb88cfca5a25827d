package graft.sources

import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import scala.util.Try

/** Standard security handler for encrypted PDFs (ISO 32000-1 §7.6.3 /
  * 32000-2 §7.6.4 — public spec), pure JVM. The reference reads
  * encrypted files transparently through PyMuPDF
  * (`/root/reference/utils.py:12-13`); here the same capability is a
  * user-password unlock whose empty-password default covers the
  * overwhelmingly common case in the wild — owner-password-restricted
  * files whose user password is empty — and whose explicit form opens
  * genuinely password-protected files:
  *
  *  - V=1/2, R=2/3: RC4 with a 40–128-bit key from Algorithm 2
  *    (padded password → MD5 → 50×MD5 for R≥3), verified against /U
  *    via Algorithm 4/5.
  *  - V=4, R=4: crypt filters; /CFM /V2 → RC4, /AESV2 → AES-128-CBC
  *    with the per-object key salted by "sAlT".
  *  - V=5, R=5/6: AES-256; the file key is unwrapped from /UE with a
  *    key hashed from the password and /U's key salt (SHA-256 for
  *    R=5, the Algorithm-2.B iterated SHA-256/384/512 loop for R=6).
  *
  * A supplied password is tried BOTH ways, as real readers do: as the
  * user password first, then as the owner password (Algorithm 7 for
  * R≤4 — /O decrypts back to the padded user password; Algorithm 12
  * for R≥5 — /O validates with the 48-byte /U appended to the hash
  * input and the file key unwraps from /OE).
  *
  * `context` returns None when the file cannot be unlocked (wrong
  * user password, unsupported /Filter, malformed entries) — the caller
  * degrades to printable-ASCII salvage exactly as before. RC4 is
  * implemented inline (15 lines, public algorithm); MD5/SHA/AES come
  * from the JDK.
  */
object PdfCrypto {

  /** §7.6.3.3 Algorithm 2 padding constant. */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Unlocked decryption context. `aes` selects AES-CBC vs RC4 for
    * stream content; `v5` keys are used directly (no per-object MD5).
    */
  final case class Ctx(fileKey: Array[Byte], r: Int, aes: Boolean,
      encryptMetadata: Boolean) {

    private def objectKey(objNum: Int, genNum: Int): Array[Byte] = {
      if (r >= 5) return fileKey
      val md = MessageDigest.getInstance("MD5")
      md.update(fileKey)
      md.update(Array((objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte,
        ((objNum >> 16) & 0xff).toByte, (genNum & 0xff).toByte,
        ((genNum >> 8) & 0xff).toByte))
      if (aes) md.update(Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte)) // "sAlT"
      md.digest().take(math.min(fileKey.length + 5, 16))
    }

    /** Decrypt one stream's raw bytes; Array.empty when malformed
      * (wrong AES block length) so the caller's inflate-failure path
      * handles it uniformly.
      */
    def decryptStream(objNum: Int, genNum: Int, data: Array[Byte]): Array[Byte] = {
      val key = objectKey(objNum, genNum)
      if (!aes) return rc4(key, data)
      if (data.length < 16 || (data.length - 16) % 16 != 0) return Array.empty
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
        new IvParameterSpec(data.take(16)))
      val out = c.doFinal(data, 16, data.length - 16)
      // strip PKCS#7 padding leniently: a bad final block yields a bad
      // pad byte — return the unpadded payload rather than aborting
      val padLen = if (out.nonEmpty) out.last & 0xff else 0
      if (padLen >= 1 && padLen <= 16 && padLen <= out.length)
        out.dropRight(padLen)
      else out
    }
  }

  /** Parse the /Encrypt dictionary, derive the file key with the given
    * user password (empty by default — the common owner-restricted
    * case), verify it against /U; None when the password is wrong or
    * the handler unsupported.
    */
  def context(bytes: Array[Byte], password: Array[Byte] = Array.empty): Option[Ctx] =
    Try(contextImpl(bytes, password)).toOption.flatten

  private val EncRefPat = java.util.regex.Pattern.compile("/Encrypt\\s+(\\d+)\\s+(\\d+)\\s+R\\b")
  private val IdPat = java.util.regex.Pattern.compile("/ID\\s*\\[\\s*<([0-9A-Fa-f]*)>")
  private val NumPat = java.util.regex.Pattern.compile("/(V|R|Length|P)\\s+(-?\\d+)\\b")
  private val CfmPat = java.util.regex.Pattern.compile("/CFM\\s*/(\\w+)")

  private def contextImpl(bytes: Array[Byte], password: Array[Byte]): Option[Ctx] = {
    val whole = new String(bytes, Ascii)
    // last /Encrypt reference wins (incremental updates append trailers)
    val em = EncRefPat.matcher(whole)
    var encObj = -1
    while (em.find()) encObj = em.group(1).toInt
    if (encObj < 0) return None
    val dict = objectDict(whole, encObj).getOrElse(return None)
    if (!dict.contains("/Standard")) return None // only the standard handler

    var v = 0; var r = 2; var lengthBits = 40; var p = 0
    val nm = NumPat.matcher(dict)
    while (nm.find()) nm.group(1) match {
      case "V" => v = nm.group(2).toInt
      case "R" => r = nm.group(2).toInt
      case "Length" => lengthBits = nm.group(2).toInt
      case "P" => p = nm.group(2).toInt
    }
    val o = stringValue(dict, "O").getOrElse(return None)
    val u = stringValue(dict, "U").getOrElse(return None)
    val encryptMetadata = !dict.contains("/EncryptMetadata false")
    // V=4 crypt filters: /StmF names the stream filter; absent → Identity
    // (streams unencrypted). Any declared AESV2 CFM → AES-128.
    val cm = CfmPat.matcher(dict)
    var cfm = ""
    while (cm.find()) cfm = cm.group(1)
    val aes = v >= 5 || (v == 4 && cfm == "AESV2")
    if (v == 4 && !dict.contains("/StmF")) return None // Identity streams: unsupported edge

    if (v >= 5) {
      // AES-256: U and O are each hash(32) ++ validationSalt(8) ++ keySalt(8)
      if (u.length < 48) return None
      // R≥6 truncates the password to 127 bytes (§7.6.4.3.3); R=5 is the
      // plain salted SHA-256 of the original Adobe extension
      val pw = password.take(127)
      def hashed(salt: Array[Byte], udata: Array[Byte]) =
        if (r >= 6) hash2B(pw, salt, udata) else sha256(pw ++ salt ++ udata)
      def unwrap(wrapped: Array[Byte], ik: Array[Byte]): Option[Ctx] = {
        if (wrapped.length != 32) return None
        val c = Cipher.getInstance("AES/CBC/NoPadding")
        c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(ik, "AES"),
          new IvParameterSpec(new Array[Byte](16)))
        Some(Ctx(c.doFinal(wrapped), r, aes = true, encryptMetadata))
      }
      // Algorithm 11: password as USER password against /U, key from /UE
      if (java.util.Arrays.equals(hashed(u.slice(32, 40), Array.empty), u.take(32)))
        return unwrap(stringValue(dict, "UE").getOrElse(return None),
          hashed(u.slice(40, 48), Array.empty))
      // Algorithm 12: password as OWNER password — the 2.B/SHA input takes
      // the 48-byte /U string appended; key unwraps from /OE
      if (o.length >= 48 &&
          java.util.Arrays.equals(hashed(o.slice(32, 40), u.take(48)), o.take(32)))
        return unwrap(stringValue(dict, "OE").getOrElse(return None),
          hashed(o.slice(40, 48), u.take(48)))
      return None // wrong password (neither user nor owner)
    }

    // R 2/3/4 — Algorithm 2: password truncated/padded to 32 bytes with
    // the spec constant (the empty password is the fully-padded case)
    val id0 = { val m = IdPat.matcher(whole); if (m.find()) hexBytes(m.group(1)) else Array.empty[Byte] }
    val n = if (r == 2) 5 else math.max(5, math.min(16, lengthBits / 8))

    /** Algorithm 2 from an already-padded 32-byte password, verified
      * against /U via Algorithm 4 (R=2) / 5 (R≥3).
      */
    def algo2Ctx(padded32: Array[Byte]): Option[Ctx] = {
      val md = MessageDigest.getInstance("MD5")
      md.update(padded32)
      md.update(o.take(32))
      md.update(Array(p, p >> 8, p >> 16, p >> 24).map(b => (b & 0xff).toByte))
      md.update(id0)
      if (r >= 4 && !encryptMetadata)
        md.update(Array(0xff, 0xff, 0xff, 0xff).map(_.toByte))
      var key = md.digest()
      if (r >= 3) for (_ <- 0 until 50) key = md5(key.take(n))
      key = key.take(n)
      val ok =
        if (r == 2) java.util.Arrays.equals(rc4(key, Pad), u.take(32))
        else {
          var x = rc4(key, md5(Pad ++ id0))
          for (i <- 1 to 19) x = rc4(key.map(b => (b ^ i).toByte), x)
          java.util.Arrays.equals(x, u.take(16))
        }
      if (ok) Some(Ctx(key, r, aes, encryptMetadata)) else None
    }

    val padded = (password.take(32) ++ Pad).take(32)
    algo2Ctx(padded).orElse {
      // Algorithm 7: the password as the OWNER password — the Algorithm 3
      // key decrypts /O back to the PADDED user password (RC4 is its own
      // inverse; the R≥3 19-round XOR chain unwinds in reverse), and
      // Algorithm 2 reruns with that recovered padding. Verification
      // against /U makes a wrong owner password fail exactly like a
      // wrong user password.
      var h = md5(padded)
      if (r >= 3) for (_ <- 0 until 50) h = md5(h)
      val okey = h.take(n)
      var rec = o.take(32)
      if (r == 2) rec = rc4(okey, rec)
      else for (i <- 19 to 0 by -1)
        rec = rc4(okey.map(b => (b ^ i).toByte), rec)
      algo2Ctx(rec)
    }
  }

  /** §7.6.4.3.4 Algorithm 2.B (R=6): iterated SHA-256/384/512 over
    * AES-128-CBC blocks until the convergence condition, yielding the
    * 32-byte hash. For OWNER-password hashes the 48-byte /U string is
    * appended to both the seed and every K1 block (`udata`); user-side
    * hashes pass it empty.
    */
  private def hash2B(password: Array[Byte], salt: Array[Byte],
      udata: Array[Byte] = Array.empty): Array[Byte] = {
    var k = sha256(password ++ salt ++ udata)
    var i = 0
    var done = false
    var e = Array.empty[Byte]
    while (!done) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      for (j <- 0 until 64) System.arraycopy(block, 0, k1, j * block.length, block.length)
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(k.take(16), "AES"),
        new IvParameterSpec(k.slice(16, 32)))
      e = c.doFinal(k1)
      // first 16 bytes of E as a big-endian integer mod 3 == byte-sum mod 3
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = MessageDigest.getInstance(
        if (mod == 0) "SHA-256" else if (mod == 1) "SHA-384" else "SHA-512").digest(e)
      i += 1
      done = i >= 64 && (e.last & 0xff) <= i - 32
    }
    k.take(32)
  }

  /** The `<< … >>` dictionary of top-level object `objNum` (forward
    * scan balancing nested delimiters). The Encrypt dictionary may not
    * live inside an ObjStm (its strings are the only unencrypted ones),
    * so the uncompressed view always contains it.
    */
  private def objectDict(whole: String, objNum: Int): Option[String] = {
    val hm = java.util.regex.Pattern.compile("(?m)^\\s*" + objNum + "\\s+\\d+\\s+obj\\b").matcher(whole)
    if (!hm.find()) return None
    var i = whole.indexOf("<<", hm.end())
    if (i < 0) return None
    val start = i
    var depth = 0
    while (i < whole.length - 1) {
      if (whole(i) == '<' && whole(i + 1) == '<') { depth += 1; i += 2 }
      else if (whole(i) == '>' && whole(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return Some(whole.substring(start, i))
      }
      else i += 1
    }
    None
  }

  /** Binary value of `/key (literal)` or `/key <hex>` in a dictionary —
    * O/U/OE/UE entries are binary strings, so escapes decode to raw
    * bytes via the byte-preserving ISO-8859-1 view.
    */
  private[graft] def stringValue(dict: String, key: String): Option[Array[Byte]] = {
    val m = java.util.regex.Pattern.compile("/" + key + "\\s*([(<])").matcher(dict)
    var res: Option[Array[Byte]] = None
    while (m.find()) {
      // /U must not match /UE: the char after the key must not extend the name
      val after = m.start() + 1 + key.length
      if (after >= dict.length || "(< \t\r\n".contains(dict(after))) {
        val at = m.end() - 1
        res =
          if (dict(at) == '(') Some(literal(dict, at))
          else {
            val j = dict.indexOf('>', at)
            if (j < 0) None else Some(hexBytes(dict.substring(at + 1, j)))
          }
      }
    }
    res
  }

  private def literal(s: String, start: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = start + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s(i) match {
        case '\\' if i + 1 < s.length =>
          s(i + 1) match {
            case 'n' => out.write('\n'); i += 2
            case 'r' => out.write('\r'); i += 2
            case 't' => out.write('\t'); i += 2
            case 'b' => out.write('\b'); i += 2
            case 'f' => out.write('\f'); i += 2
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0; var k = 0
              while (j < s.length && k < 3 && s(j) >= '0' && s(j) <= '7') {
                v = v * 8 + (s(j) - '0'); j += 1; k += 1
              }
              out.write(v); i = j
            case '\r' => i += 2; if (i < s.length && s(i) == '\n') i += 1
            case '\n' => i += 2
            case other => out.write(other.toInt); i += 2
          }
        case '(' => depth += 1; out.write('('); i += 1
        case ')' => depth -= 1; if (depth > 0) out.write(')'); i += 1
        case ch => out.write(ch.toInt); i += 1
      }
    }
    out.toByteArray
  }

  private def hexBytes(h0: String): Array[Byte] = {
    val h = if (h0.length % 2 == 1) h0 + "0" else h0
    Array.tabulate(h.length / 2)(k =>
      Integer.parseInt(h.substring(k * 2, k * 2 + 2), 16).toByte)
  }

  private def md5(b: Array[Byte]): Array[Byte] = MessageDigest.getInstance("MD5").digest(b)
  private def sha256(b: Array[Byte]): Array[Byte] = MessageDigest.getInstance("SHA-256").digest(b)

  /** RC4 (public algorithm, §7.6.2 note) — used both to decrypt and,
    * in tests, to build fixtures.
    */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    for (k <- data.indices) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xff)).toByte
    }
    out
  }
}
