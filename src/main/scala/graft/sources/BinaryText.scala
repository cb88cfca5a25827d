package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{Inflater, ZipInputStream}
import scala.collection.mutable
import scala.util.Try

/** Pure-JVM text extraction for the binary document formats the reference
  * loads through external codecs (`/root/reference/utils.py:12-15`,
  * PyMuPDF / docx2txt) — implemented here against the published PDF 1.7
  * and OOXML container formats with zero non-JDK dependencies:
  *
  *  - PDF: locate `stream … endstream` segments, inflate /FlateDecode
  *    ones via java.util.zip, and interpret the text-showing content
  *    operators (Tj, TJ, ', ") over literal `(…)` and hex `<…>` strings,
  *    with Td, TD, T-star, BT, ET treated as line breaks. ToUnicode CMaps
  *    (PDF 1.7 §9.10.3) ARE handled, scoped PER FONT via Tf tracking:
  *    the object graph is resolved name → font object (`/Font <<
  *    /F1 5 0 R >>` resource dicts) → `/ToUnicode` stream, and each
  *    `/F<n> Tf` operator switches the active code→text tables, so two
  *    fonts with CONFLICTING tables decode correctly. /ObjStm compressed
  *    object streams (PDF 1.5+) are burst open, so font/resource
  *    dictionaries that modern writers store only in compressed form
  *    still resolve. Show-strings
  *    resolve 2-byte codes first (the Identity-H case) then 1-byte,
  *    falling back to the merged-table view (fonts without their own
  *    CMap, or no Tf seen) and then to single-byte ISO-8859-1. Resource
  *    names are resolved file-wide (last binding wins): per-page
  *    re-binding of the SAME name to different fonts is not
  *    distinguished. Encrypted files unlock via the standard security
  *    handler with the empty user password (PdfCrypto: RC4-40/128,
  *    AES-128, AES-256 — the owner-password-restricted case);
  *    anything unreadable falls back to printable-ASCII salvage.
  *  - DOCX: read `word/header*.xml`, `word/document.xml` and
  *    `word/footer*.xml` out of the zip container (docx2txt's part
  *    order), emit `<w:t>` runs, break on paragraph ends / tabs /
  *    breaks, decode the five XML entities.
  *
  * `extract` dispatches on magic bytes (%PDF / PK), so one function
  * serves any binary document column.
  */
object BinaryText {

  /** Sniff-and-extract: real parser when the magic bytes identify the
    * format and the parse yields text; printable-ASCII salvage otherwise.
    */
  def extract(bytes: Array[Byte]): String = extract(bytes, "")

  /** Password-aware form: `password` (PDFDocEncoding/latin-1 bytes) is
    * offered to the standard security handler when the file is
    * encrypted; the empty string is the default empty-user-password
    * unlock. A wrong password degrades to salvage, never to ciphertext.
    */
  def extract(bytes: Array[Byte], password: String): String = {
    if (bytes == null || bytes.length < 4) return Sources.extractTextStub(bytes)
    val isPdf = bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'
    val isZip = bytes(0) == 'P' && bytes(1) == 'K'
    val primary =
      if (isPdf) Try(pdfText(bytes, password)).getOrElse("")
      else if (isZip) Try(docxText(bytes)).getOrElse("")
      else ""
    if (primary.nonEmpty) primary else Sources.extractTextStub(bytes)
  }

  /** Parse a digit run as Int; None when it exceeds Int range — corrupt
    * input skips the reference instead of throwing into whole-document
    * salvage.
    */
  private def intOpt(s: String): Option[Int] =
    if (s.length <= 10 && s.toLong <= Int.MaxValue) Some(s.toLong.toInt) else None

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1
  private val StreamKw = "stream".getBytes(Ascii)
  private val EndstreamKw = "endstream".getBytes(Ascii)

  /** Text of every content stream in the PDF, one paragraph per stream.
    * First pass collects the decoded streams and parses every
    * CMap-bearing one; the object graph (resource name → font object →
    * /ToUnicode stream) scopes each table to its font, and the merged
    * view of all tables remains the fallback for fonts without their
    * own CMap. Second pass interprets ALL streams with those tables
    * available. CMap streams are not excluded from the text pass — their
    * syntax has no text-showing operators, so they contribute nothing —
    * which means a CONTENT stream whose shown text merely mentions
    * "begincmap" still extracts normally instead of being misclassified
    * and dropped.
    */
  def pdfText(bytes: Array[Byte]): String = pdfText(bytes, "")

  def pdfText(bytes: Array[Byte], password: String): String = {
    // Encrypted PDFs (trailer carries /Encrypt): PdfCrypto unlocks the
    // standard security handler with the supplied user password (empty
    // by default — the owner-password-restricted case real readers open
    // transparently; RC4 and AES) and every stream decrypts before its
    // filters apply. A file that cannot be unlocked — wrong password,
    // unsupported handler — yields an empty parse, which routes
    // `extract` to printable-ASCII salvage instead of ciphertext noise.
    val crypto =
      if (isEncrypted(bytes)) PdfCrypto.context(bytes, password.getBytes(Ascii))
      else None
    if (isEncrypted(bytes) && crypto.isEmpty) return ""
    // Cross-reference-guided generation filter: when the xref chain
    // parses and validates, streams belonging to SUPERSEDED object
    // generations (incremental updates, freed objects) are dropped
    // before any interpretation — matching what an xref-following
    // reader renders. Any inconsistency keeps the full scan.
    val allStreams = decodedStreams(bytes, crypto)
    val streams = liveStreamPred(bytes) match {
      case Some(pred) => allStreams.filter { case (pos, _) => pred(pos) }
      case None => allStreams
    }
    // Burst /ObjStm containers (PDF 1.5+ compressed object streams —
    // where modern writers put ALL non-stream objects: page dicts, font
    // dicts, resource dicts) into (objNum, body) views, so the font
    // resolution below sees dictionaries that never appear uncompressed
    // in the file. Stream objects themselves (content, CMaps) may not
    // live inside an ObjStm (PDF 32000-1 §7.5.7), so decodedStreams
    // already sees every one of those.
    val embedded = streams.flatMap { case (pos, d) =>
      val dict = dictBefore(bytes, pos)
      if (dict.contains("/ObjStm")) objStmObjects(dict, d) else Nil
    }
    val cmaps = streams.collect {
      case (pos, d) if isCMapStream(d) => (pos, parseCMap(new String(d, Ascii)))
    }
    val (map1, map2) = cmaps.map(_._2)
      .foldLeft((Map.empty[Int, String], Map.empty[Int, String])) {
        case ((a1, a2), (b1, b2)) => (a1 ++ b1, a2 ++ b2)
      }
    val fonts =
      if (cmaps.isEmpty) Map.empty[String, (Map[Int, String], Map[Int, String])]
      else fontTables(new String(bytes, Ascii), embedded, cmaps)
    streams.map { case (_, d) => contentText(d, map1, map2, fonts) }
      .filter(_.nonEmpty).mkString("\n").trim
  }

  /** /Encrypt lives in the trailer dictionary, which the spec puts at
    * the file end (conventional or xref-stream form) — scanning the tail
    * window avoids false positives from the token appearing inside
    * compressed stream bytes earlier in the file.
    */
  private def isEncrypted(bytes: Array[Byte]): Boolean = {
    val n = math.min(bytes.length, 2048)
    new String(bytes, bytes.length - n, n, Ascii).contains("/Encrypt")
  }

  private val IntKeyPat = java.util.regex.Pattern.compile("/(N|First)\\s+(\\d+)\\b")

  /** Parse one decompressed /ObjStm payload into its embedded objects.
    * Layout (PDF 32000-1 §7.5.7): the first /First bytes hold N pairs of
    * integers `objNum offset` (offset relative to /First, increasing);
    * each object's body runs from its offset to the next object's (or
    * the payload end). Malformed headers yield no objects rather than
    * aborting the document.
    */
  private def objStmObjects(dict: String, data: Array[Byte]): Seq[(Int, String)] = {
    var n = -1
    var first = -1
    // over-Int numerals mark the object stream corrupt — yield no
    // objects (per the contract above), never throw into the
    // whole-document salvage fallback
    def intOr(s: String, bad: Int): Int =
      if (s.length <= 10 && s.toLong <= Int.MaxValue) s.toLong.toInt else bad
    val m = IntKeyPat.matcher(dict)
    while (m.find()) {
      if (m.group(1) == "N") n = intOr(m.group(2), -1)
      else first = intOr(m.group(2), -1)
    }
    val s = new String(data, Ascii)
    if (n <= 0 || first < 0 || first > s.length) return Nil
    val nums = mutable.Buffer[Int]()
    val nm = java.util.regex.Pattern.compile("\\d+").matcher(s.substring(0, first))
    while (nm.find() && nums.length < 2 * n) {
      // an over-Int numeral in the pair table marks the whole stream
      // corrupt (suppression is sound, invention is not: substituting 0
      // would fabricate an (objNum=0, offset=0) pair and extract a
      // bogus object body at offset `first`)
      val v = intOr(nm.group(), -1)
      if (v < 0) return Nil
      nums += v
    }
    val pairs = nums.grouped(2).collect { case mutable.Buffer(o, off) => (o, off) }.toSeq
    pairs.zipWithIndex.map { case ((objNum, off), i) =>
      val start = math.min(first + off, s.length)
      val end =
        if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, s.length)
        else s.length
      (objNum, s.substring(start, math.max(end, start)))
    }
  }

  private val ObjHeaderPat =
    java.util.regex.Pattern.compile("(\\d+)\\s+\\d+\\s+obj\\b")
  private val ToUniPat =
    java.util.regex.Pattern.compile("/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R\\b")
  private val FontResPat =
    java.util.regex.Pattern.compile("(?s)/Font\\s*<<(.*?)>>")
  private val FontEntryPat =
    java.util.regex.Pattern.compile("/([^\\s/<>\\[\\]()]+)\\s+(\\d+)\\s+\\d+\\s+R\\b")

  /** Resource-name → (1-byte, 2-byte) ToUnicode tables, by walking the
    * object graph: `/Font << /F1 5 0 R >>` resource entries name font
    * objects; a font object's `/ToUnicode N 0 R` names the CMap stream
    * object; `cmaps` carries each parsed CMap keyed by the byte offset
    * of its `stream` keyword, matched to the nearest preceding object
    * header. Both halves of the walk scan the uncompressed file text AND
    * the `embedded` (objNum, body) views burst out of /ObjStm containers
    * — in a modern PDF the font and resource dictionaries live ONLY in
    * the latter. Entries without a resolvable chain are simply absent
    * (the caller falls back to the merged tables).
    */
  private def fontTables(whole: String, embedded: Seq[(Int, String)],
      cmaps: Seq[(Int, (Map[Int, String], Map[Int, String]))])
      : Map[String, (Map[Int, String], Map[Int, String])] = {
    if (cmaps.isEmpty) return Map.empty
    // object headers in file order: (offset, objNum)
    val headers = mutable.Buffer[(Int, Int)]()
    val hm = ObjHeaderPat.matcher(whole)
    // same skip-not-throw contract as trustedObjHeaders: an over-Int
    // header numeral in corrupt input must not salvage the whole doc
    while (hm.find()) {
      val numStr = hm.group(1)
      if (numStr.length <= 10 && numStr.toLong <= Int.MaxValue)
        headers += ((hm.start(), numStr.toLong.toInt))
    }
    def objAt(pos: Int): Option[Int] =
      headers.takeWhile(_._1 < pos).lastOption.map(_._2)
    val cmapByObj = cmaps.flatMap { case (pos, maps) =>
      objAt(pos).map(_ -> maps)
    }.toMap
    // font object → its ToUnicode stream object (scan per object span,
    // plus each ObjStm-embedded object body)
    val fontToUni = mutable.Map[Int, Int]()
    for (k <- headers.indices) {
      val (start, objNum) = headers(k)
      val end = if (k + 1 < headers.length) headers(k + 1)._1 else whole.length
      val tm = ToUniPat.matcher(whole).region(start, end)
      if (tm.find()) intOpt(tm.group(1)).foreach(fontToUni(objNum) = _)
    }
    for ((objNum, body) <- embedded) {
      val tm = ToUniPat.matcher(body)
      if (tm.find()) intOpt(tm.group(1)).foreach(fontToUni(objNum) = _)
    }
    // resource name → font object (file-wide, last binding wins; ObjStm
    // bodies scan after the raw text, so a compressed re-binding of the
    // same name wins over a stale uncompressed one)
    val out = mutable.Map[String, (Map[Int, String], Map[Int, String])]()
    def scanResources(text: String): Unit = {
      val fm = FontResPat.matcher(text)
      while (fm.find()) {
        val em = FontEntryPat.matcher(fm.group(1))
        while (em.find()) {
          val maps = intOpt(em.group(2)).flatMap(fontToUni.get).flatMap(cmapByObj.get)
          maps.foreach(out(em.group(1)) = _)
        }
      }
    }
    scanResources(whole)
    embedded.foreach { case (_, body) => scanResources(body) }
    out.toMap
  }

  private val ObjHeaderGenPat =
    java.util.regex.Pattern.compile("(\\d+)\\s+(\\d+)\\s+obj\\b")

  /** All stream segments with the byte offset of their `stream` keyword,
    * decrypted when an unlock context is present (per-object key from
    * the nearest preceding `N G obj` header; cross-reference streams
    * and — under /EncryptMetadata false — metadata streams are exempt
    * per spec), then run through the full `/Filter` chain
    * (Flate/LZW/ASCII85/ASCIIHex/RunLength, single name or array).
    */
  private def decodedStreams(bytes: Array[Byte],
      crypto: Option[PdfCrypto.Ctx] = None): Seq[(Int, Array[Byte])] = {
    // (offset, objNum, genNum) of every object header, only when needed
    val headers: IndexedSeq[(Int, Int, Int)] = crypto match {
      case Some(_) =>
        val m = ObjHeaderGenPat.matcher(new String(bytes, Ascii))
        val buf = mutable.Buffer[(Int, Int, Int)]()
        while (m.find()) buf += ((m.start(), m.group(1).toInt, m.group(2).toInt))
        buf.toIndexedSeq
      case None => IndexedSeq.empty
    }
    def objGenAt(pos: Int): (Int, Int) = {
      var res = (0, 0)
      headers.foreach { case (off, o, g) => if (off < pos) res = (o, g) }
      res
    }
    def decrypted(streamAt: Int, dict: String, raw: Array[Byte]): Array[Byte] =
      crypto match {
        case Some(ctx) if !dict.contains("/XRef") &&
            (ctx.encryptMetadata || !dict.contains("/Metadata")) =>
          val (o, g) = objGenAt(streamAt)
          Try(ctx.decryptStream(o, g, raw)).getOrElse(Array.empty[Byte])
        case _ => raw
      }
    val parts = mutable.Buffer[(Int, Array[Byte])]()
    var pos = 0
    var done = false
    while (!done) {
      val s = indexOfBytes(bytes, StreamKw, pos)
      if (s < 0) done = true
      else {
        // a match inside "endstream" (or a name like /MyStream) is
        // preceded by a letter; a real stream keyword is not
        val validStart = s == 0 || !Character.isLetter(bytes(s - 1) & 0xff)
        var ds = s + StreamKw.length
        if (ds < bytes.length && bytes(ds) == '\r') ds += 1
        if (ds < bytes.length && bytes(ds) == '\n') ds += 1
        if (!validStart) pos = s + StreamKw.length
        else {
          val e = indexOfBytes(bytes, EndstreamKw, ds)
          if (e < 0) done = true
          else {
            // strip at most ONE EOL before endstream — further 0x0A/0x0D
            // bytes may be real (e.g. deflate) stream data
            var de = e
            if (de > ds && bytes(de - 1) == '\n') de -= 1
            if (de > ds && bytes(de - 1) == '\r') de -= 1
            val raw = java.util.Arrays.copyOfRange(bytes, ds, de)
            val dict = dictBefore(bytes, s)
            val plain = decrypted(s, dict, raw)
            parts += ((s, Try(applyFilters(dict, plain)).getOrElse(Array.empty[Byte])))
            pos = e + EndstreamKw.length
          }
        }
      }
    }
    parts.toSeq
  }

  private val FilterPat =
    java.util.regex.Pattern.compile("/Filter\\s*(\\[[^\\]]*\\]|/[A-Za-z0-9]+)")
  private val FilterNamePat = java.util.regex.Pattern.compile("/([A-Za-z0-9]+)")
  private val DecodeParmsPat =
    java.util.regex.Pattern.compile("/(?:DecodeParms|DP)\\s*(\\[|<<|/)")

  /** Per-filter decode-parameter dictionaries, aligned with the filter
    * chain (ISO 32000-1 §7.3.8 Table 5): `/DecodeParms` is a single
    * dict when `/Filter` is a single name, or an ARRAY of
    * (dict | null) entries matched to the filter array by position.
    * Returns `None` when the stream dict carries NO `/DecodeParms` (or
    * `/DP`) key at all — callers may then fall back to a legacy
    * whole-dict scan — and `Some(one string per chain position)` when
    * the key is present, with "" where the entry is an explicit `null`
    * (or the array is shorter than the chain). The distinction is
    * load-bearing: an explicit `null` for a Flate/LZW stage means "this
    * stage has NO parms", so the predictor regexes must not pick up a
    * /Predictor that belongs to ANOTHER stage of the same chain via the
    * whole-dict fallback.
    */
  private[graft] def decodeParmsOf(dict: String, filters: Seq[String]): Option[Seq[String]] = {
    val nFilters = math.max(filters.length, 1)
    val m = DecodeParmsPat.matcher(dict)
    if (!m.find()) return None
    val start = m.start(1)
    m.group(1) match {
      case "<<" =>
        // A single dict with a filter ARRAY is spec-disallowed (the
        // entry should be an array), so writer intent is ambiguous:
        // attribute the lone dict to the first predictor-capable stage
        // (Flate/LZW — the only consumers of /Predictor//EarlyChange),
        // not blindly to position 0, where an ASCII transport filter
        // would swallow it and leave the Flate stage un-unpredicted.
        val d = balancedDict(dict, start)
        val capable = Set("FlateDecode", "Fl", "LZWDecode", "LZW")
        val at = math.max(filters.indexWhere(capable), 0)
        Some(Seq.tabulate(nFilters)(j => if (j == at) d else ""))
      case "/" => // a name where a dict/array belongs — malformed; treat
        // the key as absent (legacy whole-dict behavior)
        None
      case _ => // array of null | dict, in filter order
        val out = mutable.Buffer[String]()
        var i = start + 1
        while (i < dict.length && dict(i) != ']' && out.length < nFilters) {
          if (dict.startsWith("<<", i)) {
            val d = balancedDict(dict, i)
            out += d; i += math.max(d.length, 2)
          } else if (dict.startsWith("null", i)) { out += ""; i += 4 }
          else i += 1
        }
        Some(out.toSeq.padTo(nFilters, ""))
    }
  }

  /** The balanced `<< … >>` substring starting at `start` ("" if
    * malformed).
    */
  private def balancedDict(s: String, start: Int): String = {
    var depth = 0
    var i = start
    while (i < s.length - 1) {
      if (s.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (s.startsWith(">>", i)) {
        depth -= 1; i += 2
        if (depth == 0) return s.substring(start, i)
      }
      else i += 1
    }
    ""
  }

  /** Walk the stream dictionary's `/Filter` entry — a single name OR an
    * array of names applied in listed order, e.g.
    * `[/ASCII85Decode /FlateDecode]` (ISO 32000-1 §7.4.1: the first
    * filter decodes the stored bytes, each next one the previous
    * output). Decompression filters (Flate, LZW) run the shared
    * /DecodeParms predictor pass; the ASCII transport filters
    * (ASCII85/ASCIIHex) and RunLength take no parms. Unrecognized
    * filters (the image codecs — DCT, JPX, CCITT) pass bytes through:
    * their payloads carry no text operators, so downstream
    * interpretation yields nothing rather than garbage. A filter that
    * throws on malformed data aborts THIS stream only (the caller maps
    * it to empty), which is what routes a corrupt document to
    * printable-ASCII salvage.
    */
  private[graft] def applyFilters(dict: String, data: Array[Byte]): Array[Byte] = {
    val fm = FilterPat.matcher(dict)
    if (!fm.find()) return data
    val names = {
      val nm = FilterNamePat.matcher(fm.group(1))
      val buf = mutable.Buffer[String]()
      while (nm.find()) buf += nm.group(1)
      buf.toSeq
    }
    // per-filter parms: when /DecodeParms is PRESENT its per-position
    // entry is authoritative (an explicit null = empty parms — never
    // another stage's dict); only a stream with no /DecodeParms key at
    // all falls back to the legacy whole-dict scan
    val parms = decodeParmsOf(dict, names)
    def parmsOr(i: Int): String = parms match {
      case None     => dict
      case Some(ps) => ps(i)
    }
    names.zipWithIndex.foldLeft(data) { case (d, (name, i)) =>
      name match {
        case "FlateDecode" | "Fl" => unpredict(parmsOr(i), inflate(d))
        case "LZWDecode" | "LZW" =>
          unpredict(parmsOr(i), lzwDecode(d, earlyChangeOf(parmsOr(i))))
        case "ASCII85Decode" | "A85" => ascii85Decode(d)
        case "ASCIIHexDecode" | "AHx" => asciiHexDecode(d)
        case "RunLengthDecode" | "RL" => runLengthDecode(d)
        case _ => d
      }
    }
  }

  /** /ASCIIHexDecode (ISO 32000-1 §7.4.2): hex digit pairs to bytes,
    * whitespace ignored, `>` is EOD (data past it ignored), an odd
    * trailing digit behaves as if followed by 0. Any other character
    * before EOD is an error (throws — the caller salvages).
    */
  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var hi = -1
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else if (!c.isWhitespace) {
        val v = Character.digit(c, 16)
        if (v < 0) throw new IllegalArgumentException(s"bad hex char '$c'")
        if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** /ASCII85Decode (ISO 32000-1 §7.4.3): 5 chars in `!`..`u` encode a
    * big-endian base-85 group of 4 bytes; `z` is shorthand for four
    * zero bytes (only between groups); whitespace ignored; `~>` is EOD.
    * A final partial group of n in 2..4 chars pads with `u` and keeps
    * n-1 bytes. A 1-char leftover, `z` inside a group, an out-of-range
    * char, or a group value past 2^32-1 throws (the caller salvages).
    */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val grp = new Array[Int](5)
    var k = 0
    def flush(n: Int): Unit = {
      var j = n; while (j < 5) { grp(j) = 84; j += 1 } // pad with 'u'
      val v = grp.foldLeft(0L)((acc, d) => acc * 85 + d)
      if (v > 0xffffffffL) throw new IllegalArgumentException("85 group overflow")
      var b = 0
      while (b < n - 1) { out.write(((v >> (24 - 8 * b)) & 0xff).toInt); b += 1 }
    }
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z') {
        if (k != 0) throw new IllegalArgumentException("z inside 85 group")
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (!c.isWhitespace) {
        if (c < '!' || c > 'u') throw new IllegalArgumentException(s"bad 85 char '$c'")
        grp(k) = c - '!'; k += 1
        if (k == 5) { flush(5); k = 0 }
      }
      i += 1
    }
    if (k == 1) throw new IllegalArgumentException("dangling 85 digit")
    if (k >= 2) flush(k)
    out.toByteArray
  }

  /** /RunLengthDecode (ISO 32000-1 §7.4.5): length byte L — 0..127
    * copies the next L+1 bytes literally, 129..255 repeats the next
    * byte 257-L times, 128 is EOD. Truncated input throws (salvage).
    */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val len = data(i) & 0xff
      if (len == 128) done = true
      else if (len < 128) {
        if (i + 1 + len + 1 > data.length)
          throw new IllegalArgumentException("truncated literal run")
        out.write(data, i + 1, len + 1)
        i += len + 1
      } else {
        if (i + 1 >= data.length)
          throw new IllegalArgumentException("truncated repeat run")
        var r = 0; val b = data(i + 1).toInt
        while (r < 257 - len) { out.write(b); r += 1 }
        i += 1
      }
      i += 1
    }
    out.toByteArray
  }

  private val EarlyChangePat = java.util.regex.Pattern.compile("/EarlyChange\\s+(\\d+)")

  private def earlyChangeOf(dict: String): Int = {
    val m = EarlyChangePat.matcher(dict)
    if (m.find()) m.group(1).toInt else 1
  }

  private val PredictorPat = java.util.regex.Pattern.compile("/Predictor\\s+(\\d+)")
  private val ColumnsPat = java.util.regex.Pattern.compile("/Columns\\s+(\\d+)")
  private val ColorsPat = java.util.regex.Pattern.compile("/Colors\\s+(\\d+)")
  private val BpcPat = java.util.regex.Pattern.compile("/BitsPerComponent\\s+(\\d+)")

  /** Undo a /DecodeParms predictor after inflation (PDF 32000-1
    * §7.4.4.4): PNG row filters (/Predictor >= 10 — None/Sub/Up/
    * Average/Paeth, one filter-type byte per /Columns-wide row) and
    * TIFF horizontal differencing (/Predictor 2, 8-bit). Object and
    * cross-reference streams from real writers are routinely
    * predictor-coded — without this the inflated bytes are garbled and
    * a predictor-coded /ObjStm cannot burst. /Predictor 1 or absent
    * passes through untouched.
    */
  private def unpredict(dict: String, data: Array[Byte]): Array[Byte] = {
    def intOf(p: java.util.regex.Pattern, default: Int): Int = {
      val m = p.matcher(dict); if (m.find()) m.group(1).toInt else default
    }
    val pred = intOf(PredictorPat, 1)
    if (pred <= 1 || data.isEmpty) return data
    val colors = intOf(ColorsPat, 1)
    val bpc = intOf(BpcPat, 8)
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = math.max(1, intOf(ColumnsPat, 1) * colors * bpc / 8)
    if (pred < 10) { // TIFF horizontal differencing; only 8-bit handled
      if (pred != 2 || bpc != 8) return data
      val out = data.clone()
      var r = 0
      while (r + rowLen <= out.length) {
        var i = r + bpp
        while (i < r + rowLen) { out(i) = (out(i) + out(i - bpp)).toByte; i += 1 }
        r += rowLen
      }
      return out
    }
    val stride = rowLen + 1 // leading filter-type byte per row
    val nRows = data.length / stride
    val out = new Array[Byte](nRows * rowLen)
    var row = 0
    while (row < nRows) {
      val ft = data(row * stride) & 0xff
      val src = row * stride + 1
      val dst = row * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (row > 0) out(dst - rowLen + i) & 0xff else 0
        val ul = if (row > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
        val v = ft match {
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => raw // 0 = None; unknown types pass the row through
        }
        out(dst + i) = v.toByte
        i += 1
      }
      row += 1
    }
    out
  }

  private def isCMapStream(data: Array[Byte]): Boolean = {
    val s = new String(data, Ascii)
    s.contains("begincmap") || s.contains("beginbfchar") || s.contains("beginbfrange")
  }

  private val HeaderPartPat = java.util.regex.Pattern.compile("word/header\\d*\\.xml")
  private val FooterPartPat = java.util.regex.Pattern.compile("word/footer\\d*\\.xml")

  /** Text of a DOCX container: the w:t runs of every header part, then
    * word/document.xml, then every footer part (docx2txt's part order,
    * reference capability `utils.py:14-15`). Header/footer parts join in
    * part-name order regardless of zip entry order, so output is stable
    * across writers.
    */
  def docxText(bytes: Array[Byte]): String = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val headers = mutable.SortedMap[String, String]()
    val footers = mutable.SortedMap[String, String]()
    var main = ""
    try {
      var entry = zis.getNextEntry
      while (entry != null) {
        val name = entry.getName
        def xml = new String(zis.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        if (name == "word/document.xml") main = wordXmlText(xml)
        else if (HeaderPartPat.matcher(name).matches()) headers(name) = wordXmlText(xml)
        else if (FooterPartPat.matcher(name).matches()) footers(name) = wordXmlText(xml)
        entry = zis.getNextEntry
      }
      (headers.valuesIterator ++ Iterator(main) ++ footers.valuesIterator)
        .filter(_.nonEmpty).mkString("\n").trim
    } finally zis.close()
  }

  // ---- cross-reference-guided object resolution (PDF 32000-1 §7.5) ----

  private val StartxrefPat = java.util.regex.Pattern.compile("startxref\\s+(\\d+)")
  private val WArrPat = java.util.regex.Pattern.compile("/W\\s*\\[([^\\]]*)\\]")
  private val IndexArrPat = java.util.regex.Pattern.compile("/Index\\s*\\[([^\\]]*)\\]")
  private val PrevPat = java.util.regex.Pattern.compile("/Prev\\s+(\\d+)")
  private val XRefStmPat = java.util.regex.Pattern.compile("/XRefStm\\s+(\\d+)")
  private val SizePat = java.util.regex.Pattern.compile("/Size\\s+(\\d+)")

  /** Liveness verdict per object number from the xref chain:
    * `Some(offset)` = live as a DIRECT object whose `N G obj` header
    * starts at that byte offset; `None` = no direct generation is live
    * (freed, or moved into an /ObjStm).
    */
  private type XrefMap = Map[Int, Option[Long]]

  /** Follow `startxref` → the cross-reference chain (classic `xref`
    * tables, /XRef streams, /Prev links, hybrid /XRefStm companions,
    * newest table winning per object) and return each object's live
    * entry. Returns None — keeping the whole-file-scan fallback — on
    * ANY inconsistency: no/garbled chain, a cycle, an out-of-range
    * offset, or a live entry whose target bytes do not hold a matching
    * `N G obj` header. Reference behavior: PyMuPDF resolves objects
    * through the xref (/root/reference/utils.py:12-13), so a superseded
    * generation left behind by an incremental update never surfaces;
    * the object scan stays as the salvage path for corrupt files.
    */
  private[graft] def xrefLive(bytes: Array[Byte]): Option[XrefMap] =
    Try(xrefLiveImpl(bytes)).toOption.flatten

  private def xrefLiveImpl(bytes: Array[Byte]): Option[XrefMap] = {
    val whole = new String(bytes, Ascii)
    val sx = whole.lastIndexOf("startxref")
    if (sx < 0) return None
    val sm = StartxrefPat.matcher(whole)
    if (!sm.find(sx)) return None
    val live = mutable.Map[Int, Option[Long]]()
    val seen = mutable.Set[Long]()
    // Newest-first with first-writer-wins per object. Priority within a
    // section (PDF 32000-1 §7.5.8.4): a hybrid section's /XRefStm
    // entries take precedence over the classic section's OWN entries
    // (the classic table deliberately marks stream-resident objects
    // free for pre-1.5 readers), while /Prev chains are strictly older
    // and come last — so the walk applies XRefStm → own entries → Prev.
    def walk(off: Long): Unit = {
      if (!seen(off)) {
        seen += off
        require(off >= 0 && off < bytes.length, "xref offset out of range")
        val (entries, xrefStm, prev) = parseXrefSection(bytes, whole, off.toInt)
        xrefStm.foreach(walk)
        entries.foreach { case (n, v) => if (!live.contains(n)) live(n) = v }
        prev.foreach(walk)
      }
    }
    walk(sm.group(1).toLong)
    // every live direct entry must point at a matching object header —
    // one mismatch poisons the whole chain (full fallback), never a
    // silent partial resolution
    live.foreach {
      case (n, Some(o)) =>
        require(o >= 0 && o < bytes.length, s"object $n offset out of range")
        val hm = ObjHeaderGenPat.matcher(whole)
        hm.region(o.toInt, math.min(whole.length, o.toInt + 48))
        require(hm.lookingAt() && hm.group(1).toInt == n,
          s"object $n: no matching header at xref offset $o")
      case _ => ()
    }
    if (live.isEmpty) None else Some(live.toMap)
  }

  /** Parse ONE xref section (classic table or /XRef stream) at `off`:
    * (own entries, hybrid /XRefStm offset — consulted BEFORE the own
    * entries, /Prev offset — consulted after). Throws on malformed
    * input — the caller maps that to full fallback.
    */
  private def parseXrefSection(bytes: Array[Byte], whole: String,
      off: Int): (Seq[(Int, Option[Long])], Option[Long], Option[Long]) = {
    var i = off
    def ws(): Unit = while (i < whole.length && whole(i).isWhitespace) i += 1
    def readInt(): Long = {
      val start = i
      while (i < whole.length && whole(i).isDigit) i += 1
      require(i > start, s"expected integer at $start")
      whole.substring(start, i).toLong
    }
    ws()
    if (whole.startsWith("xref", i)) {
      // classic table: subsections of 20-byte entries, then trailer dict
      i += 4
      val entries = mutable.Buffer[(Int, Option[Long])]()
      var done = false
      while (!done) {
        ws()
        if (whole.startsWith("trailer", i)) done = true
        else {
          val start = readInt(); ws(); val count = readInt()
          var k = 0L
          while (k < count) {
            ws(); val f1 = readInt()
            ws(); readInt() // generation — liveness is keyed by offset match
            ws()
            require(i < whole.length, "truncated xref entry")
            val ty = whole(i); i += 1
            val objNum = (start + k).toInt
            ty match {
              case 'n' => entries += ((objNum, Some(f1)))
              case 'f' => entries += ((objNum, None))
              case c => throw new IllegalStateException(s"bad xref entry type '$c'")
            }
            k += 1
          }
        }
      }
      i += "trailer".length; ws()
      val dict = balancedDict(whole, i)
      require(dict.nonEmpty, "missing trailer dictionary")
      def intKey(p: java.util.regex.Pattern): Option[Long] = {
        val m = p.matcher(dict); if (m.find()) Some(m.group(1).toLong) else None
      }
      (entries.toSeq, intKey(XRefStmPat), intKey(PrevPat))
    } else {
      // /XRef STREAM: `N G obj << dict >> stream … endstream`
      val hm = ObjHeaderGenPat.matcher(whole)
      hm.region(i, math.min(whole.length, i + 48))
      require(hm.lookingAt(), s"no obj header at xref stream offset $i")
      var s = indexOfBytes(bytes, StreamKw, hm.end())
      while (s > 0 && Character.isLetter(bytes(s - 1) & 0xff))
        s = indexOfBytes(bytes, StreamKw, s + StreamKw.length)
      require(s > 0, "no stream keyword after xref stream header")
      val dict = dictBefore(bytes, s)
      require(dict.contains("/XRef") || dict.contains("/W"),
        "dictionary at startxref target is not an xref stream")
      var ds = s + StreamKw.length
      if (ds < bytes.length && bytes(ds) == '\r') ds += 1
      if (ds < bytes.length && bytes(ds) == '\n') ds += 1
      val e = indexOfBytes(bytes, EndstreamKw, ds)
      require(e > 0, "unterminated xref stream")
      var de = e
      if (de > ds && bytes(de - 1) == '\n') de -= 1
      if (de > ds && bytes(de - 1) == '\r') de -= 1
      val data = applyFilters(dict, java.util.Arrays.copyOfRange(bytes, ds, de))
      def ints(p: java.util.regex.Pattern): Seq[Long] = {
        val m = p.matcher(dict)
        if (!m.find()) Nil
        else "\\d+".r.findAllIn(m.group(1)).map(_.toLong).toSeq
      }
      val w = ints(WArrPat)
      require(w.length == 3 && w.forall(x => x >= 0 && x <= 8), s"bad /W $w")
      val rowLen = w.sum.toInt
      require(rowLen > 0, "zero-width xref rows")
      val size = { val m = SizePat.matcher(dict); require(m.find(), "no /Size"); m.group(1).toLong }
      val idx = ints(IndexArrPat) match {
        case Nil => Seq((0L, size))
        case xs =>
          require(xs.length % 2 == 0, "odd /Index")
          xs.grouped(2).map { case Seq(a, b) => (a, b) }.toSeq
      }
      def be(p: Int, width: Int): Long = {
        var v = 0L
        var j = 0
        while (j < width) { v = (v << 8) | (data(p + j) & 0xffL); j += 1 }
        v
      }
      val entries = mutable.Buffer[(Int, Option[Long])]()
      var p = 0
      idx.foreach { case (start, count) =>
        var k = 0L
        while (k < count) {
          require(p + rowLen <= data.length, "truncated xref stream data")
          val ty = if (w(0) == 0) 1L else be(p, w(0).toInt)
          val f2 = be(p + w(0).toInt, w(1).toInt)
          val objNum = (start + k).toInt
          ty match {
            case 1 => entries += ((objNum, Some(f2)))
            // type 0 = free; type 2 = lives inside an /ObjStm — either
            // way no DIRECT generation of this object is live
            case 0 | 2 => entries += ((objNum, None))
            case _ => () // spec: unknown types read as null — ignored
          }
          p += rowLen
          k += 1
        }
      }
      val prev = { val m = PrevPat.matcher(dict); if (m.find()) Some(m.group(1).toLong) else None }
      (entries.toSeq, None, prev)
    }
  }

  /** Predicate over stream-keyword offsets: is the owning object's
    * generation the LIVE one per the xref chain? None when the chain is
    * absent or inconsistent — callers keep every stream (the historical
    * whole-file-scan behavior). Objects the chain never mentions are
    * kept (conservative: the scan is the salvage net).
    */
  /** `N G obj` headers by regex, EXTENT-FILTERED: a hit that starts
    * inside a previously accepted object's body — a string literal in
    * its dictionary (`(1 0 obj)`), or raw stream bytes — is a false
    * header, not a boundary; accepting it would misattribute the
    * following stream keyword to the wrong object number. Headers are
    * accepted sequentially, each advancing a covered-until watermark to
    * its object's end (`endobj`, hopping over one `stream…endstream`
    * payload first so stream bytes can't fake an early end). A
    * too-short extent from malformed markup only re-admits hits the
    * unfiltered scan accepted anyway — never drops a real header.
    */
  private[graft] def trustedObjHeaders(whole: String): IndexedSeq[(Int, Int)] = {
    def streamKwAt(from: Int, before: Int): Int = {
      var s = whole.indexOf("stream", from)
      while (s > 0 && s < before && Character.isLetter(whole(s - 1)))
        s = whole.indexOf("stream", s + "stream".length)
      if (s >= 0 && s < before) s else -1
    }
    def objectEndAfter(from: Int): Int = {
      val e = whole.indexOf("endobj", from)
      val cap = if (e < 0) whole.length else e
      streamKwAt(from, cap) match {
        case -1 => if (e < 0) from else e + "endobj".length
        case s =>
          val es = whole.indexOf("endstream", s)
          if (es < 0) from
          else {
            val e2 = whole.indexOf("endobj", es + "endstream".length)
            if (e2 < 0) es + "endstream".length else e2 + "endobj".length
          }
      }
    }
    val hm = ObjHeaderGenPat.matcher(whole)
    val hs = mutable.ArrayBuffer[(Int, Int)]() // (offset, objNum)
    var covered = 0
    while (hm.find()) {
      if (hm.start() >= covered) {
        // a header-shaped hit whose object number exceeds Int range
        // cannot be a real object (no xref entry can reference it) —
        // corrupt input must skip it, not throw; its extent still
        // counts as covered (suppression is sound, invention is not)
        val numStr = hm.group(1)
        if (numStr.length <= 10 && numStr.toLong <= Int.MaxValue)
          hs += ((hm.start(), numStr.toLong.toInt))
        covered = objectEndAfter(hm.end())
      }
    }
    hs.toIndexedSeq
  }

  private[graft] def liveStreamPred(bytes: Array[Byte]): Option[Int => Boolean] =
    xrefLive(bytes).map { live =>
      val hs = trustedObjHeaders(new String(bytes, Ascii))
      (streamPos: Int) => {
        // nearest object header at or before the stream keyword
        var lo = 0
        var hi = hs.length - 1
        var res = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (hs(mid)._1 < streamPos) { res = mid; lo = mid + 1 } else hi = mid - 1
        }
        if (res < 0) true
        else {
          val (hoff, objNum) = hs(res)
          live.get(objNum) match {
            case Some(Some(o)) => o == hoff.toLong // live generation only
            case Some(None) => false               // freed / moved to ObjStm
            case None => true                      // unlisted: keep (salvage)
          }
        }
      }
    }

  // ---- PDF internals ----

  private def indexOfBytes(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** The `<< … >>` dictionary immediately preceding a stream keyword
    * (backward scan balancing nested dict delimiters); "" when absent.
    */
  private def dictBefore(bytes: Array[Byte], streamAt: Int): String = {
    var j = streamAt - 1
    while (j >= 0 && (bytes(j) == ' ' || bytes(j) == '\r' || bytes(j) == '\n' || bytes(j) == '\t')) j -= 1
    if (j < 1 || bytes(j) != '>' || bytes(j - 1) != '>') return ""
    val end = j + 1
    var depth = 0
    var idx = j
    while (idx >= 1) {
      if (bytes(idx) == '>' && bytes(idx - 1) == '>') { depth += 1; idx -= 2 }
      else if (bytes(idx) == '<' && bytes(idx - 1) == '<') {
        depth -= 1
        if (depth == 0) return new String(bytes, idx - 1, end - (idx - 1), Ascii)
        idx -= 2
      }
      else idx -= 1
    }
    ""
  }

  /** /LZWDecode (ISO 32000-1 §7.4.4): the TIFF/PDF LZW variant —
    * MSB-first variable-width codes starting at 9 bits, 256 = clear
    * table, 257 = EOD, new entries from 258, width bumps at 512/1024/
    * 2048 minus /EarlyChange (default 1, i.e. one code early). The
    * KwKwK case (a code equal to the next unassigned entry) resolves to
    * prev + prev.head per the algorithm. Trailing partial code ignored.
    */
  private[graft] def lzwDecode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val dict = new Array[Array[Byte]](4096)
    var dictSize = 258
    var width = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L; var bitCnt = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      bitBuf = (bitBuf << 8) | (data(i) & 0xffL); bitCnt += 8; i += 1
      while (bitCnt >= width && !done) {
        val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
        bitCnt -= width
        if (code == 256) { dictSize = 258; width = 9; prev = null }
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < 256) Array(code.toByte)
            else if (code < dictSize && dict(code - 258) != null) dict(code - 258)
            else if (code == dictSize && prev != null) prev :+ prev(0)
            else throw new IllegalArgumentException(s"bad LZW code $code")
          out.write(entry, 0, entry.length)
          if (prev != null && dictSize < 4096) {
            dict(dictSize - 258) = prev :+ entry(0); dictSize += 1
          }
          prev = entry
          if (dictSize >= (1 << width) - earlyChange && width < 12) width += 1
        }
      }
    }
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val buf = new Array[Byte](8192)
    val bos = new java.io.ByteArrayOutputStream()
    var stalled = false
    while (!inf.finished() && !stalled) {
      val n = inf.inflate(buf)
      if (n > 0) bos.write(buf, 0, n)
      else if (inf.needsInput() || inf.needsDictionary()) stalled = true
    }
    inf.end()
    bos.toByteArray
  }

  /** Interpret the text-showing operators of one decoded content stream.
    * `map1`/`map2` are the MERGED ToUnicode tables (1-byte / 2-byte
    * codes) — the fallback; `fonts` carries each font's own scoped
    * tables, switched in by `/F<n> Tf`. A show-string whose codes ALL
    * resolve through the active pair is mapped (2-byte first —
    * Identity-H), otherwise shown as raw single-byte chars.
    */
  private def contentText(content: Array[Byte],
      map1: Map[Int, String] = Map.empty,
      map2: Map[Int, String] = Map.empty,
      fonts: Map[String, (Map[Int, String], Map[Int, String])] = Map.empty)
      : String = {
    val s = new String(content, Ascii)
    val out = new StringBuilder
    val pending = new StringBuilder
    var active = (map1, map2)
    var lastName = ""
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
    def show(): Unit = {
      out.append(applyCMap(pending.toString, active._1, active._2))
      pending.clear()
    }
    var i = 0
    val n = s.length
    while (i < n) {
      s(i) match {
        case '(' =>
          val (str, ni) = literalString(s, i); pending.append(str); i = ni
        case '<' if i + 1 < n && s(i + 1) == '<' => i += 2
        case '<' =>
          val (str, ni) = hexString(s, i); pending.append(str); i = ni
        case '%' => // comment to end of line
          while (i < n && s(i) != '\n' && s(i) != '\r') i += 1
        case '/' => // name token — remembered as the potential Tf operand
          val st = i + 1
          i += 1
          while (i < n && !" \t\r\n()<>[]{}/%".contains(s(i))) i += 1
          lastName = s.substring(st, i)
        case c if c.isLetter || c == '\'' || c == '"' =>
          val st = i
          while (i < n && (s(i).isLetterOrDigit || s(i) == '\'' || s(i) == '"' || s(i) == '*')) i += 1
          s.substring(st, i) match {
            case "Tj" | "TJ" => show()
            case "'" | "\"" => newline(); show()
            case "Td" | "TD" | "T*" | "BT" | "ET" => newline(); pending.clear()
            case "Tf" => // font switch; unknown fonts keep the merged view
              active = fonts.getOrElse(lastName, (map1, map2))
              pending.clear()
            case _ => pending.clear() // string was an operand of a non-text op
          }
        case _ => i += 1
      }
    }
    out.toString.trim
  }

  /** Map a show-string through the ToUnicode tables: 2-byte codes when
    * the length is even and every pair resolves (the Identity-H shape),
    * else 1-byte codes when every char resolves, else the raw string.
    */
  private def applyCMap(s: String, map1: Map[Int, String],
      map2: Map[Int, String]): String = {
    if (s.isEmpty) return s
    if (map2.nonEmpty && s.length % 2 == 0) {
      val codes = (0 until s.length by 2).map(i => (s(i).toInt << 8) | s(i + 1).toInt)
      if (codes.forall(map2.contains)) return codes.map(map2).mkString
    }
    if (map1.nonEmpty && s.forall(c => map1.contains(c.toInt)))
      s.map(c => map1(c.toInt)).mkString
    else s
  }

  private val BfCharPat = java.util.regex.Pattern.compile("(?s)beginbfchar(.*?)endbfchar")
  private val BfRangePat = java.util.regex.Pattern.compile("(?s)beginbfrange(.*?)endbfrange")
  private val HexTokPat = java.util.regex.Pattern.compile("<([0-9A-Fa-f]*)>")

  /** Parse one CMap's bfchar/bfrange sections into (1-byte, 2-byte)
    * code→text maps. Source code width follows the hex token length
    * (2 digits = 1 byte, 4 = 2 bytes); destination hex is UTF-16BE.
    * Ranges wider than 2^16 are ignored as malformed.
    */
  private[graft] def parseCMap(s: String): (Map[Int, String], Map[Int, String]) = {
    val m1 = mutable.Map[Int, String]()
    val m2 = mutable.Map[Int, String]()
    // lenient per-entry: one malformed mapping (oversized hex, junk token)
    // must not void the whole CMap — or worse, abort extraction of the
    // document's OTHER streams
    def put(srcHex: String, dst: String): Unit =
      if (srcHex.length <= 4 && srcHex.nonEmpty) {
        val code = Integer.parseInt(srcHex, 16)
        if (srcHex.length <= 2) m1(code) = dst else m2(code) = dst
      }
    def isHex(h: String): Boolean =
      h.nonEmpty && h.forall(c => Character.digit(c, 16) >= 0)
    def hexInt(h: String): Option[Int] =
      if (isHex(h) && h.length <= 6) Some(Integer.parseInt(h, 16)) else None
    def utf16(hex: String): String = {
      if (!isHex(hex)) return ""
      val h = if (hex.length % 2 == 1) hex + "0" else hex
      val bytes = Array.tabulate(h.length / 2)(k =>
        Integer.parseInt(h.substring(k * 2, k * 2 + 2), 16).toByte)
      new String(bytes, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    val mc = BfCharPat.matcher(s)
    while (mc.find()) {
      val toks = hexTokens(mc.group(1))
      toks.grouped(2).foreach {
        case Seq(src, dst) if src.nonEmpty && dst.nonEmpty => put(src, utf16(dst))
        case _ =>
      }
    }
    // src hex at the same width as `lo`, so put() keeps the code width
    def srcHexAt(width: Int, v: Int): String =
      ("0" * width + v.toHexString.toUpperCase).takeRight(width)
    val mr = BfRangePat.matcher(s)
    while (mr.find()) {
    // hi must FIT lo's hex width: otherwise srcHexAt's takeRight would
    // wrap codes mod 16^width and a single width-mismatched range (e.g.
    // <00> <FFFF> <0041>) would poison the whole 1-byte table — exactly
    // the blast radius the per-entry leniency exists to prevent
    def fitsWidth(v: Int, widthDigits: Int): Boolean =
      widthDigits >= 1 && widthDigits <= 4 && v < (1 << (4 * widthDigits))
    rangeTriples(mr.group(1)).foreach {
        case (lo, hi, Left(dstStart)) =>
          (hexInt(lo), hexInt(hi)) match {
            case (Some(l), Some(h))
                if h >= l && fitsWidth(h, lo.length) && utf16(dstStart).nonEmpty =>
              val base = utf16(dstStart).toCharArray
              for (k <- 0 to (h - l)) {
                val chars = base.clone()
                // PDF 1.7 §9.10.3: only the LAST code unit increments
                chars(chars.length - 1) = (chars(chars.length - 1) + k).toChar
                put(srcHexAt(lo.length, l + k), new String(chars))
              }
            case _ =>
          }
        case (lo, hi, Right(dsts)) =>
          (hexInt(lo), hexInt(hi)) match {
            case (Some(l), Some(h))
                if h >= l && fitsWidth(h, lo.length) && h - l < dsts.length =>
              for (k <- 0 to (h - l)) put(srcHexAt(lo.length, l + k), utf16(dsts(k)))
            case _ =>
          }
      }
    }
    (m1.toMap, m2.toMap)
  }

  private def hexTokens(body: String): Seq[String] = {
    val m = HexTokPat.matcher(body)
    val out = mutable.Buffer[String]()
    while (m.find()) out += m.group(1)
    out.toSeq
  }

  /** Tokenize a bfrange body into (lo, hi, dstStart | dstArray) triples. */
  private def rangeTriples(body: String): Seq[(String, String, Either[String, Seq[String]])] = {
    val toks = mutable.Buffer[Either[String, Seq[String]]]()
    var i = 0
    val n = body.length
    while (i < n) {
      body(i) match {
        case '<' =>
          val j = body.indexOf('>', i)
          if (j < 0) i = n
          else { toks += Left(body.substring(i + 1, j).trim); i = j + 1 }
        case '[' =>
          val j = body.indexOf(']', i)
          if (j < 0) i = n
          else { toks += Right(hexTokens(body.substring(i + 1, j))); i = j + 1 }
        case _ => i += 1
      }
    }
    toks.toSeq.grouped(3).collect {
      case Seq(Left(lo), Left(hi), third) if lo.nonEmpty && hi.nonEmpty => (lo, hi, third)
    }.toSeq
  }

  /** PDF literal string starting at `(`: nesting + escape sequences.
    * Returns (decoded, index past the closing paren).
    */
  private def literalString(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = start + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s(i) match {
        case '\\' if i + 1 < s.length =>
          s(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '(' => sb.append('('); i += 2
            case ')' => sb.append(')'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\r' => // line continuation
              i += 2; if (i < s.length && s(i) == '\n') i += 1
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0; var k = 0
              while (j < s.length && k < 3 && s(j) >= '0' && s(j) <= '7') {
                v = v * 8 + (s(j) - '0'); j += 1; k += 1
              }
              sb.append(v.toChar); i = j
            case other => sb.append(other); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' => depth -= 1; if (depth > 0) sb.append(')'); i += 1
        case ch => sb.append(ch); i += 1
      }
    }
    (sb.toString, i)
  }

  /** PDF hex string starting at `<`: pairs of hex digits, odd length
    * padded with 0. Returns (decoded, index past the closing `>`).
    */
  private def hexString(s: String, start: Int): (String, Int) = {
    val hex = new StringBuilder
    var i = start + 1
    while (i < s.length && s(i) != '>') {
      val c = s(i)
      if (c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')) hex.append(c)
      i += 1
    }
    if (hex.length % 2 == 1) hex.append('0')
    val sb = new StringBuilder
    var j = 0
    while (j + 2 <= hex.length) {
      sb.append(Integer.parseInt(hex.substring(j, j + 2), 16).toChar)
      j += 2
    }
    (sb.toString, i + 1)
  }

  // ---- DOCX internals ----

  private val WordPat = java.util.regex.Pattern.compile(
    "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>|</w:p>|<w:tab\\b[^>]*/>|<w:br\\b[^>]*/>")

  private def wordXmlText(xml: String): String = {
    val m = WordPat.matcher(xml)
    val sb = new StringBuilder
    while (m.find()) {
      if (m.group(1) != null) sb.append(unescapeXml(m.group(1)))
      else if (m.group().startsWith("</w:p")) sb.append('\n')
      else if (m.group().startsWith("<w:tab")) sb.append('\t')
      else sb.append('\n')
    }
    sb.toString.trim
  }

  private def unescapeXml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")
}
