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
  *    with Td, TD, T-star, BT, ET treated as line breaks. Single-byte encodings
  *    only — no CMap/ToUnicode table handling — which covers PDFs from
  *    simple generators; anything it can't read falls back to
  *    printable-ASCII salvage.
  *  - DOCX: read `word/document.xml` out of the zip container, emit
  *    `<w:t>` runs, break on paragraph ends / tabs / breaks, decode the
  *    five XML entities.
  *
  * `extract` dispatches on magic bytes (%PDF / PK), so one function
  * serves any binary document column.
  */
object BinaryText {

  /** Sniff-and-extract: real parser when the magic bytes identify the
    * format and the parse yields text; printable-ASCII salvage otherwise.
    */
  def extract(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 4) return Sources.extractTextStub(bytes)
    val isPdf = bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F'
    val isZip = bytes(0) == 'P' && bytes(1) == 'K'
    val primary =
      if (isPdf) Try(pdfText(bytes)).getOrElse("")
      else if (isZip) Try(docxText(bytes)).getOrElse("")
      else ""
    if (primary.nonEmpty) primary else Sources.extractTextStub(bytes)
  }

  private val Ascii = java.nio.charset.StandardCharsets.ISO_8859_1
  private val StreamKw = "stream".getBytes(Ascii)
  private val EndstreamKw = "endstream".getBytes(Ascii)

  /** Text of every content stream in the PDF, one paragraph per stream. */
  def pdfText(bytes: Array[Byte]): String = {
    val parts = mutable.Buffer[String]()
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
            val data =
              if (dictBefore(bytes, s).contains("/FlateDecode"))
                Try(inflate(raw)).getOrElse(Array.empty[Byte])
              else raw
            val txt = contentText(data)
            if (txt.nonEmpty) parts += txt
            pos = e + EndstreamKw.length
          }
        }
      }
    }
    parts.mkString("\n").trim
  }

  /** Text of a DOCX container: the w:t runs of word/document.xml. */
  def docxText(bytes: Array[Byte]): String = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var entry = zis.getNextEntry
      while (entry != null) {
        if (entry.getName == "word/document.xml")
          return wordXmlText(new String(zis.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8))
        entry = zis.getNextEntry
      }
      ""
    } finally zis.close()
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

  /** Interpret the text-showing operators of one decoded content stream. */
  private def contentText(content: Array[Byte]): String = {
    val s = new String(content, Ascii)
    val out = new StringBuilder
    val pending = new StringBuilder
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
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
        case '/' => // name token
          i += 1
          while (i < n && !" \t\r\n()<>[]{}/%".contains(s(i))) i += 1
        case c if c.isLetter || c == '\'' || c == '"' =>
          val st = i
          while (i < n && (s(i).isLetterOrDigit || s(i) == '\'' || s(i) == '"' || s(i) == '*')) i += 1
          s.substring(st, i) match {
            case "Tj" | "TJ" => out.append(pending); pending.clear()
            case "'" | "\"" => newline(); out.append(pending); pending.clear()
            case "Td" | "TD" | "T*" | "BT" | "ET" => newline(); pending.clear()
            case _ => pending.clear() // string was an operand of a non-text op
          }
        case _ => i += 1
      }
    }
    out.toString.trim
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
