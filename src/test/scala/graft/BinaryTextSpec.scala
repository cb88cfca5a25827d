package graft

import graft.sources.{BinaryText, Sources}
import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

class BinaryTextSpec extends AnyFunSuite {

  /** A syntactically-real one-object PDF around the given content stream. */
  private def pdfAround(stream: Array[Byte], dictExtra: String = ""): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.4\n1 0 obj << /Length ".getBytes(ISO_8859_1))
    bos.write(s"${stream.length}$dictExtra >>\nstream\n".getBytes(ISO_8859_1))
    bos.write(stream)
    bos.write("\nendstream\nendobj\n%%EOF\n".getBytes(ISO_8859_1))
    bos.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](8192)
    val bos = new ByteArrayOutputStream()
    while (!d.finished()) { val n = d.deflate(buf); bos.write(buf, 0, n) }
    d.end(); bos.toByteArray
  }

  private def docxAround(documentXml: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("[Content_Types].xml"))
    zos.write("<Types/>".getBytes("UTF-8")); zos.closeEntry()
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    zos.write(documentXml.getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    bos.toByteArray
  }

  test("PDF: Tj/TJ operators, Td/T* line breaks, escapes, hex strings") {
    val content = ("BT /F1 12 Tf 72 720 Td (Hello) Tj ( World) Tj T* " +
      "[(Sec) -20 (ond)] TJ T* (par\\(en\\)s \\101nd \\\\slash) Tj T* " +
      "<48657821> Tj ET").getBytes(ISO_8859_1)
    val txt = BinaryText.extract(pdfAround(content))
    assert(txt == "Hello World\nSecond\npar(en)s And \\slash\nHex!")
  }

  test("PDF: FlateDecode stream inflates and extracts") {
    val content = "BT (Compressed stream text) Tj ET".getBytes(ISO_8859_1)
    val pdf = pdfAround(deflate(content), dictExtra = " /Filter /FlateDecode")
    assert(BinaryText.extract(pdf) == "Compressed stream text")
  }

  test("PDF: multiple streams concatenate; quote op breaks line") {
    val s1 = "BT (Page one) Tj ET".getBytes(ISO_8859_1)
    val s2 = "BT (line a) Tj (line b) ' ET".getBytes(ISO_8859_1)
    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.4\n".getBytes(ISO_8859_1))
    for (s <- Seq(s1, s2)) {
      bos.write(s"9 0 obj << /Length ${s.length} >>\nstream\n".getBytes(ISO_8859_1))
      bos.write(s)
      bos.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    }
    bos.write("%%EOF\n".getBytes(ISO_8859_1))
    assert(BinaryText.extract(bos.toByteArray) == "Page one\nline a\nline b")
  }

  /** Two-stream PDF: a ToUnicode CMap object + an Identity-H-style
    * content stream showing 2-byte hex-string glyph codes.
    */
  private def identityHPdf(cmap: String, content: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.7\n".getBytes(ISO_8859_1))
    for ((s, extra) <- Seq((cmap, " /Type /CMap"), (content, ""))) {
      val b = s.getBytes(ISO_8859_1)
      bos.write(s"8 0 obj << /Length ${b.length}$extra >>\nstream\n".getBytes(ISO_8859_1))
      bos.write(b)
      bos.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    }
    bos.write("%%EOF\n".getBytes(ISO_8859_1))
    bos.toByteArray
  }

  private val toUnicode =
    """/CIDInit /ProcSet findresource begin
      |begincmap
      |1 begincodespacerange
      |<0000> <FFFF>
      |endcodespacerange
      |2 beginbfchar
      |<001B> <0057>
      |<001C> <00660066>
      |endbfchar
      |1 beginbfrange
      |<0001> <001A> <0061>
      |endbfrange
      |endcmap
      |CMapName currentdict /CMap defineresource pop
      |end""".stripMargin

  test("PDF: Identity-H two-byte codes map through the ToUnicode CMap") {
    // 0008 0005 000C 000C 000F → "hello" (bfrange 0001-001A → a-z);
    // 001B → "W" (bfchar), 001C → "ff" (multi-code-unit bfchar dst)
    val content = "BT /F1 12 Tf <00080005000C000C000F> Tj T* " +
      "<001B> Tj <001C> Tj T* (plain) Tj ET"
    val txt = BinaryText.extract(identityHPdf(toUnicode, content))
    // the literal string has odd length → no 2-byte interpretation → raw
    assert(txt == "hello\nWff\nplain")
  }

  test("PDF: TJ hex-string arrays with kerning also map through the CMap") {
    val content = "BT [<00080005> -120 <000C000C000F>] TJ ET"
    assert(BinaryText.extract(identityHPdf(toUnicode, content)) == "hello")
  }

  test("parseCMap: bfrange array form and 1-byte codes") {
    val (m1, m2) = BinaryText.parseCMap(
      """beginbfchar
        |<41> <0058>
        |endbfchar
        |beginbfrange
        |<0010> <0012> [<0041> <00420043> <0044>]
        |endbfrange""".stripMargin)
    assert(m1 == Map(0x41 -> "X"))
    assert(m2 == Map(0x10 -> "A", 0x11 -> "BC", 0x12 -> "D"))
  }

  test("parseCMap: width-mismatched bfrange is skipped, not wrapped mod width") {
    // hi (FFFF) does not fit lo's 1-byte width: naive takeRight would
    // fold 65536 codes onto 256 one-byte slots and poison every
    // single-byte string in the document
    val (m1, m2) = BinaryText.parseCMap(
      """beginbfrange
        |<00> <FFFF> <0041>
        |endbfrange""".stripMargin)
    assert(m1.isEmpty && m2.isEmpty)
  }

  test("PDF: content stream that merely mentions begincmap still extracts") {
    val content = "BT (see begincmap and beginbfchar for syntax) Tj ET"
    assert(BinaryText.extract(identityHPdf(toUnicode, content)) ==
      "see begincmap and beginbfchar for syntax")
  }

  test("PDF: codes outside the CMap fall back to raw single-byte text") {
    val content = "BT (Uncovered text stays) Tj <48657821> Tj ET"
    // "Uncovered text stays" (odd/unmapped) + <48657821> = "Hex!" raw:
    // 0x4865/0x7821 are not in the table, so 2-byte mapping declines
    assert(BinaryText.extract(identityHPdf(toUnicode, content)) ==
      "Uncovered text staysHex!")
  }

  /** A structurally-real multi-font PDF: a page object binding resource
    * names to font objects, each font carrying its own /ToUnicode CMap
    * stream, plus one content stream.
    */
  private def twoFontPdf(cmapA: String, cmapB: String, content: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(("%PDF-1.7\n" +
      "1 0 obj << /Type /Page /Resources << /Font << /FA 2 0 R /FB 3 0 R >> >> " +
      "/Contents 6 0 R >> endobj\n" +
      "2 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 4 0 R >> endobj\n" +
      "3 0 obj << /Type /Font /Subtype /Type0 /ToUnicode 5 0 R >> endobj\n").getBytes(ISO_8859_1))
    for ((num, s) <- Seq((4, cmapA), (5, cmapB), (6, content))) {
      val b = s.getBytes(ISO_8859_1)
      bos.write(s"$num 0 obj << /Length ${b.length} >>\nstream\n".getBytes(ISO_8859_1))
      bos.write(b)
      bos.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    }
    bos.write("%%EOF\n".getBytes(ISO_8859_1))
    bos.toByteArray
  }

  test("PDF: conflicting per-font CMaps resolve through Tf font tracking") {
    // both fonts map code 0x41, to DIFFERENT glyphs: a merged-table
    // parser decodes both shows through whichever CMap parsed last;
    // Tf scoping must yield X then Y
    val cmapA = "begincmap 1 beginbfchar <41> <0058> endbfchar endcmap" // A → X
    val cmapB = "begincmap 1 beginbfchar <41> <0059> endbfchar endcmap" // A → Y
    val content = "BT /FA 12 Tf <41> Tj /FB 12 Tf <41> Tj ET"
    assert(BinaryText.extract(twoFontPdf(cmapA, cmapB, content)) == "XY")
  }

  test("PDF: font without its own CMap falls back to the merged tables") {
    // /FC is bound to no font object; a show after switching to it
    // still resolves through the merged view of all tables
    val cmapA = "begincmap 1 beginbfchar <42> <0051> endbfchar endcmap" // B → Q
    val cmapB = "begincmap 1 beginbfchar <43> <0052> endbfchar endcmap" // C → R
    val content = "BT /FC 9 Tf <4243> Tj ET"
    assert(BinaryText.extract(twoFontPdf(cmapA, cmapB, content)) == "QR")
  }

  /** A modern-writer-shaped PDF: the page dict (with its /Font resource
    * binding) and the font dict live ONLY inside a Flate-compressed
    * /ObjStm container; the ToUnicode CMap and the content stream are
    * regular stream objects (streams may not nest in an ObjStm).
    */
  private def objStmPdf(cmap: String, content: String,
      compress: Array[Byte] => Array[Byte] = deflate,
      filterName: String = "/FlateDecode"): Array[Byte] = {
    val obj10 = "<< /Type /Page /Resources << /Font << /F1 11 0 R >> >> /Contents 6 0 R >>"
    val obj11 = "<< /Type /Font /Subtype /Type0 /ToUnicode 4 0 R >>"
    val header = s"10 0 11 ${obj10.length + 1}\n"
    val payload = (header + obj10 + " " + obj11).getBytes(ISO_8859_1)
    val compressed = compress(payload)
    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.5\n".getBytes(ISO_8859_1))
    bos.write((s"2 0 obj << /Type /ObjStm /N 2 /First ${header.length} " +
      s"/Length ${compressed.length} /Filter $filterName >>\nstream\n").getBytes(ISO_8859_1))
    bos.write(compressed)
    bos.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    for ((num, s) <- Seq((4, cmap), (6, content))) {
      val b = s.getBytes(ISO_8859_1)
      bos.write(s"$num 0 obj << /Length ${b.length} >>\nstream\n".getBytes(ISO_8859_1))
      bos.write(b)
      bos.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    }
    bos.write("%%EOF\n".getBytes(ISO_8859_1))
    bos.toByteArray
  }

  test("PDF: font graph inside a compressed /ObjStm resolves; non-ASCII CMap text extracts") {
    // the /Font resource dict and the font object exist ONLY inside the
    // object stream — a parser reading just uncompressed headers cannot
    // connect /F1 to the CMap and would emit raw glyph codes
    val cmap =
      """begincmap
        |2 beginbfchar
        |<0001> <00E9>
        |<0002> <4F60>
        |endbfchar
        |endcmap""".stripMargin
    val content = "BT /F1 12 Tf <00010002> Tj ET"
    assert(BinaryText.extract(objStmPdf(cmap, content)) == "é你")
  }

  test("PDF: an LZW-compressed /ObjStm bursts and resolves the font graph") {
    // same object graph as the Flate case, but the container decodes
    // through LZWDecode — filters must apply BEFORE ObjStm bursting
    val cmap =
      """begincmap
        |2 beginbfchar
        |<0001> <00E9>
        |<0002> <4F60>
        |endbfchar
        |endcmap""".stripMargin
    val content = "BT /F1 12 Tf <00010002> Tj ET"
    val pdf = objStmPdf(cmap, content,
      compress = b => lzwEncode(b), filterName = "/LZWDecode")
    assert(BinaryText.extract(pdf) == "é你")
  }

  test("PDF: malformed ObjStm header degrades to no embedded objects, not an abort") {
    // /First beyond the payload: burst yields nothing, the content
    // stream still extracts through the merged-table fallback
    val payload = deflate("10 0\n<< /X >>".getBytes(ISO_8859_1))
    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.5\n".getBytes(ISO_8859_1))
    bos.write((s"2 0 obj << /Type /ObjStm /N 1 /First 9999 " +
      s"/Length ${payload.length} /Filter /FlateDecode >>\nstream\n").getBytes(ISO_8859_1))
    bos.write(payload)
    bos.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    val content = "BT (still works) Tj ET".getBytes(ISO_8859_1)
    bos.write(s"6 0 obj << /Length ${content.length} >>\nstream\n".getBytes(ISO_8859_1))
    bos.write(content)
    bos.write("\nendstream\nendobj\n%%EOF\n".getBytes(ISO_8859_1))
    assert(BinaryText.extract(bos.toByteArray) == "still works")
  }

  /** PNG Up-filter (type 2) encoder — the predictor-12 shape real
    * writers emit; pads to a row multiple with spaces (harmless PDF
    * whitespace).
    */
  private def pngUpEncode(data: Array[Byte], columns: Int): Array[Byte] = {
    val pad = (columns - data.length % columns) % columns
    val padded = data ++ Array.fill(pad)(' '.toByte)
    val out = new ByteArrayOutputStream()
    var prev = new Array[Byte](columns)
    for (r <- 0 until padded.length / columns) {
      out.write(2)
      val row = java.util.Arrays.copyOfRange(padded, r * columns, (r + 1) * columns)
      for (i <- 0 until columns) out.write((row(i) - prev(i)) & 0xff)
      prev = row
    }
    out.toByteArray
  }

  test("PDF: FlateDecode with /Predictor 12 PNG Up rows un-filters before parsing") {
    val content = "BT (Predictor coded text) Tj ET".getBytes(ISO_8859_1)
    val enc = deflate(pngUpEncode(content, columns = 7))
    val pdf = pdfAround(enc, dictExtra =
      " /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >>")
    assert(BinaryText.extract(pdf) == "Predictor coded text")
  }

  test("PDF: predictor-coded /ObjStm still bursts and resolves the font graph") {
    // same modern-writer shape as the ObjStm test, but the container is
    // PNG-predictor-coded the way compressed object/xref streams are in
    // the wild: without un-filtering, the burst sees garbled bytes
    val obj10 = "<< /Type /Page /Resources << /Font << /F1 11 0 R >> >> /Contents 6 0 R >>"
    val obj11 = "<< /Type /Font /Subtype /Type0 /ToUnicode 4 0 R >>"
    val header = s"10 0 11 ${obj10.length + 1}\n"
    val payload = (header + obj10 + " " + obj11).getBytes(ISO_8859_1)
    val compressed = deflate(pngUpEncode(payload, columns = 5))
    val cmap = "begincmap 1 beginbfchar <0001> <00E9> endbfchar endcmap"
    val content = "BT /F1 12 Tf <0001> Tj ET"
    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.5\n".getBytes(ISO_8859_1))
    bos.write((s"2 0 obj << /Type /ObjStm /N 2 /First ${header.length} " +
      s"/Length ${compressed.length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 12 /Columns 5 >> >>\nstream\n").getBytes(ISO_8859_1))
    bos.write(compressed)
    bos.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    for ((num, s) <- Seq((4, cmap), (6, content))) {
      val b = s.getBytes(ISO_8859_1)
      bos.write(s"$num 0 obj << /Length ${b.length} >>\nstream\n".getBytes(ISO_8859_1))
      bos.write(b)
      bos.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    }
    bos.write("%%EOF\n".getBytes(ISO_8859_1))
    assert(BinaryText.extract(bos.toByteArray) == "é")
  }

  test("PDF: /Encrypt trailer routes to salvage instead of emitting ciphertext noise") {
    // an encrypted PDF's stream bytes are ciphertext; a parser that
    // interprets them as content operators emits garbage "text"
    val bos = new ByteArrayOutputStream()
    bos.write("%PDF-1.7\n".getBytes(ISO_8859_1))
    val cipher = Array.tabulate[Byte](64)(i => ((i * 73 + 31) % 251).toByte)
    bos.write(s"5 0 obj << /Length ${cipher.length} >>\nstream\n".getBytes(ISO_8859_1))
    bos.write(cipher)
    bos.write(("\nendstream\nendobj\n" +
      "trailer << /Size 8 /Root 1 0 R /Encrypt 7 0 R /ID [<aa><bb>] >>\n" +
      "Readable salvage marker here\n%%EOF\n").getBytes(ISO_8859_1))
    val out = BinaryText.extract(bos.toByteArray)
    assert(out.contains("Readable salvage marker here"), s"salvage path not taken: $out")
    // salvage keeps printable runs (PDF syntax included) but never the
    // non-printable ciphertext bytes a naive parse would surface
    assert(!out.exists(c => c != '\n' && c != '\t' && (c < ' ' || c > '~')))
  }

  test("DOCX: w:t runs, paragraph breaks, entity decode") {
    val xml = "<w:document><w:body>" +
      "<w:p><w:r><w:t>First para</w:t></w:r></w:p>" +
      "<w:p><w:r><w:t>Second &amp; more</w:t></w:r><w:r><w:t xml:space=\"preserve\"> tail</w:t></w:r></w:p>" +
      "</w:body></w:document>"
    assert(BinaryText.extract(docxAround(xml)) == "First para\nSecond & more tail")
  }

  test("DOCX: header and footer parts extract, in part order, regardless of zip order") {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def part(name: String, text: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(s"<w:hdr><w:p><w:r><w:t>$text</w:t></w:r></w:p></w:hdr>".getBytes("UTF-8"))
      zos.closeEntry()
    }
    // footer FIRST in the zip; output order must still be header,
    // document, footer (docx2txt part order)
    part("word/footer1.xml", "Page footer")
    part("word/document.xml", "Body text")
    part("word/header1.xml", "Company header")
    part("word/header2.xml", "Second header")
    zos.close()
    assert(BinaryText.extract(bos.toByteArray) ==
      "Company header\nSecond header\nBody text\nPage footer")
  }

  test("non-PDF/zip bytes fall back to printable-ASCII salvage") {
    val junk = Array[Byte](0, 1, 2) ++ "salvageable run".getBytes(ISO_8859_1) ++ Array[Byte](3)
    assert(BinaryText.extract(junk) == "salvageable run")
    assert(BinaryText.extract(null) == "")
  }

  /** Test-local PDF/TIFF LZW ENCODER — written independently of the
    * decoder (string-keyed table, bump-before-emit) so a mirrored bug
    * cannot self-cancel; the hand-computed ISO vector below anchors both.
    */
  private def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0; var width = 9
    val table = scala.collection.mutable.Map[Seq[Byte], Int]()
    var nextCode = 258
    def emit(code: Int): Unit = {
      if (nextCode + earlyChange - 1 >= (1 << width) && width < 12) width += 1
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) {
        bos.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8
      }
    }
    def codeOf(s: Seq[Byte]): Int =
      if (s.length == 1) s.head & 0xff else table(s)
    emit(256)
    var w = Seq.empty[Byte]
    data.foreach { b =>
      val wb = w :+ b
      if (wb.length == 1 || table.contains(wb)) w = wb
      else {
        emit(codeOf(w))
        if (nextCode < 4096) { table(wb) = nextCode; nextCode += 1 }
        w = Seq(b)
      }
    }
    if (w.nonEmpty) emit(codeOf(w))
    emit(257)
    if (bitCnt > 0) bos.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    bos.toByteArray
  }

  test("LZW: the ISO 32000-1 §7.4.4.2 worked example decodes exactly") {
    // codes 256,45,258,258,65,259,66,257 at 9 bits, MSB-first → 9 bytes
    val encoded = Array(0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01)
      .map(_.toByte)
    val expect = "-----A---B".getBytes(ISO_8859_1)
    assert(BinaryText.lzwDecode(encoded).sameElements(expect))
    // the independent encoder reproduces the spec's byte stream too
    assert(lzwEncode(expect).sameElements(encoded))
  }

  test("LZW: round-trip across the 9→10→11-bit width bumps, both EarlyChange values") {
    val rnd = new scala.util.Random(42)
    // enough two-byte novelty to push the table well past 1024 entries
    val data = Array.fill(6000)((rnd.nextInt(26) + 'a').toByte)
    for (early <- Seq(1, 0))
      assert(BinaryText.lzwDecode(lzwEncode(data, early), early).sameElements(data),
        s"round-trip failed at EarlyChange=$early")
  }

  test("LZW: full-byte-range stress round-trip crosses the 12-bit and " +
    "table-full (4096) regimes") {
    val rnd = new scala.util.Random(7)
    // high-entropy bytes: ~one new table entry per emitted code, so 24KB
    // fills the table past 4096 and both sides must stop adding in sync
    val data = Array.fill(24 * 1024)(rnd.nextInt(256).toByte)
    assert(BinaryText.lzwDecode(lzwEncode(data)).sameElements(data))
    // and a low-entropy tail appended after the table is full still
    // decodes through the frozen table
    val data2 = data ++ Array.fill(4096)('x'.toByte)
    assert(BinaryText.lzwDecode(lzwEncode(data2)).sameElements(data2))
  }

  test("PDF: LZWDecode content stream extracts exact text") {
    val content = "BT (LZW stream text) Tj T* (line two) Tj ET".getBytes(ISO_8859_1)
    val pdf = pdfAround(lzwEncode(content), dictExtra = " /Filter /LZWDecode")
    assert(BinaryText.extract(pdf) == "LZW stream text\nline two")
  }

  test("PDF: LZWDecode honors /DecodeParms /EarlyChange 0") {
    val content = "BT (late-change lzw) Tj ET".getBytes(ISO_8859_1)
    val pdf = pdfAround(lzwEncode(content, earlyChange = 0),
      dictExtra = " /Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>")
    assert(BinaryText.extract(pdf) == "late-change lzw")
  }

  // ---- ASCII-family filters + filter chains (ISO 32000-1 §7.4.2/3/5) ----

  /** Test-local ASCII85 ENCODER, independent of the decoder. */
  private def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      for (k <- 0 until 4)
        v = (v << 8) | (if (i + k < data.length) data(i + k) & 0xffL else 0L)
      val digits = new Array[Char](5)
      for (k <- 4 to 0 by -1) { digits(k) = ('!' + (v % 85).toInt).toChar; v /= 85 }
      sb.appendAll(digits, 0, n + 1)
      i += n
    }
    (sb.toString + "~>").getBytes(ISO_8859_1)
  }

  private def asciiHexEncode(data: Array[Byte]): Array[Byte] =
    (data.map(b => f"${b & 0xff}%02X").mkString(" ") + ">").getBytes(ISO_8859_1)

  test("ASCIIHexDecode: pairs, interleaved whitespace, odd trailing digit, EOD") {
    assert(BinaryText.asciiHexDecode("48 65\n6C6c 6F>ignored".getBytes(ISO_8859_1))
      .sameElements("Hello".getBytes(ISO_8859_1)))
    // odd final digit acts as if followed by 0: "7" → 0x70 = 'p'
    assert(BinaryText.asciiHexDecode("7>".getBytes(ISO_8859_1))
      .sameElements(Array('p'.toByte)))
    intercept[IllegalArgumentException] {
      BinaryText.asciiHexDecode("4G>".getBytes(ISO_8859_1))
    }
  }

  test("ASCII85Decode: round-trip, z shorthand, partial groups, malformed input") {
    val rnd = new scala.util.Random(11)
    for (len <- Seq(0, 1, 2, 3, 4, 5, 63)) {
      val data = Array.fill(len)(rnd.nextInt(256).toByte)
      assert(BinaryText.ascii85Decode(ascii85Encode(data)).sameElements(data),
        s"85 round-trip failed at len=$len")
    }
    // z = four zero bytes, only between groups
    assert(BinaryText.ascii85Decode("z~>".getBytes(ISO_8859_1))
      .sameElements(Array[Byte](0, 0, 0, 0)))
    intercept[IllegalArgumentException] { // z inside a group
      BinaryText.ascii85Decode("!z~>".getBytes(ISO_8859_1))
    }
    intercept[IllegalArgumentException] { // 1-char leftover group
      BinaryText.ascii85Decode("!~>".getBytes(ISO_8859_1))
    }
    intercept[IllegalArgumentException] { // group value past 2^32-1
      BinaryText.ascii85Decode("uuuuu~>".getBytes(ISO_8859_1))
    }
  }

  test("RunLengthDecode: literal runs, repeat runs, EOD, truncation throws") {
    // literal "AB", repeat 'C'×4 (257-253), EOD, trailing junk ignored
    val enc = Array[Byte](1, 'A', 'B', 253.toByte, 'C', 128.toByte, 99)
    assert(BinaryText.runLengthDecode(enc)
      .sameElements("ABCCCC".getBytes(ISO_8859_1)))
    intercept[IllegalArgumentException] { // literal run longer than the input
      BinaryText.runLengthDecode(Array[Byte](5, 'A'))
    }
    intercept[IllegalArgumentException] { // repeat byte missing
      BinaryText.runLengthDecode(Array[Byte](200.toByte))
    }
  }

  test("PDF: each ASCII-family filter alone extracts exact text") {
    val content = "BT (ascii filter text) Tj ET".getBytes(ISO_8859_1)
    for ((name, enc) <- Seq[(String, Array[Byte] => Array[Byte])](
        ("/ASCIIHexDecode", asciiHexEncode),
        ("/ASCII85Decode", ascii85Encode))) {
      val pdf = pdfAround(enc(content), dictExtra = s" /Filter $name")
      assert(BinaryText.extract(pdf) == "ascii filter text", s"filter $name")
    }
    // RunLength: one literal chunk per ≤128 bytes, then EOD
    val rle = {
      val bos = new ByteArrayOutputStream()
      content.grouped(128).foreach { chunk =>
        bos.write(chunk.length - 1); bos.write(chunk)
      }
      bos.write(128); bos.toByteArray
    }
    val pdf = pdfAround(rle, dictExtra = " /Filter /RunLengthDecode")
    assert(BinaryText.extract(pdf) == "ascii filter text")
  }

  test("PDF: /Filter ARRAY chain [/ASCII85Decode /FlateDecode] walks in order") {
    val content = "BT (chained filter text) Tj T* (second line) Tj ET"
      .getBytes(ISO_8859_1)
    val pdf = pdfAround(ascii85Encode(deflate(content)),
      dictExtra = " /Filter [/ASCII85Decode /FlateDecode]")
    assert(BinaryText.extract(pdf) == "chained filter text\nsecond line")
    // three-deep: RunLength(literal) of 85 of Flate
    val rl = {
      val inner = ascii85Encode(deflate(content))
      val bos = new ByteArrayOutputStream()
      inner.grouped(128).foreach { c => bos.write(c.length - 1); bos.write(c) }
      bos.write(128); bos.toByteArray
    }
    val pdf3 = pdfAround(rl,
      dictExtra = " /Filter [/RunLengthDecode /ASCII85Decode /FlateDecode]")
    assert(BinaryText.extract(pdf3) == "chained filter text\nsecond line")
  }

  test("PDF: /DecodeParms ARRAY aligns per filter — predictor attributed " +
    "to the Flate stage of an [/ASCII85Decode /FlateDecode] chain") {
    val content = "BT (parms array text) Tj ET".getBytes(ISO_8859_1)
    val enc = ascii85Encode(deflate(pngUpEncode(content, columns = 7)))
    val pdf = pdfAround(enc, dictExtra =
      " /Filter [/ASCII85Decode /FlateDecode]" +
        " /DecodeParms [null << /Predictor 12 /Columns 7 >>]")
    assert(BinaryText.extract(pdf) == "parms array text")
  }

  test("decodeParmsOf: single dict, array with nulls/nested dicts, absent") {
    // no /DecodeParms key at all → None (legacy whole-dict fallback allowed)
    assert(BinaryText.decodeParmsOf("<< /Filter /FlateDecode >>",
      Seq("FlateDecode")).isEmpty)
    assert(BinaryText.decodeParmsOf(
      "<< /DecodeParms << /Predictor 2 >> >>", Seq("FlateDecode"))
      == Some(Seq("<< /Predictor 2 >>")))
    assert(BinaryText.decodeParmsOf(
      "<< /DP [null << /Predictor 12 /Columns 7 >>] >>",
      Seq("ASCII85Decode", "FlateDecode"))
      == Some(Seq("", "<< /Predictor 12 /Columns 7 >>")))
    // nested dict inside a parms dict stays balanced
    assert(BinaryText.decodeParmsOf(
      "<< /DecodeParms [<< /A << /B 1 >> >> null] >>",
      Seq("FlateDecode", "FlateDecode"))
      == Some(Seq("<< /A << /B 1 >> >>", "")))
    // array shorter than the chain pads with explicit-empty (no fallback)
    assert(BinaryText.decodeParmsOf("<< /DecodeParms [null] >>",
      Seq("ASCII85Decode", "FlateDecode", "RunLengthDecode"))
      == Some(Seq("", "", "")))
    // spec-disallowed single dict with a filter ARRAY: attributed to the
    // first predictor-capable stage (Flate/LZW), not position 0
    assert(BinaryText.decodeParmsOf(
      "<< /DecodeParms << /Predictor 12 >> >>",
      Seq("ASCII85Decode", "FlateDecode"))
      == Some(Seq("", "<< /Predictor 12 >>")))
    assert(BinaryText.decodeParmsOf(
      "<< /DecodeParms << /EarlyChange 0 >> >>",
      Seq("AHx", "LZW", "Fl"))
      == Some(Seq("", "<< /EarlyChange 0 >>", "")))
    // no predictor-capable stage at all: falls back to position 0
    assert(BinaryText.decodeParmsOf(
      "<< /DecodeParms << /K 1 >> >>",
      Seq("ASCIIHexDecode", "RunLengthDecode"))
      == Some(Seq("<< /K 1 >>", "")))
  }

  test("PDF: lone /DecodeParms dict with an [/ASCII85Decode /FlateDecode] " +
    "chain reaches the Flate stage's unpredict, not the transport filter") {
    val content = "BT (lone dict to flate) Tj ET".getBytes(ISO_8859_1)
    val enc = ascii85Encode(deflate(pngUpEncode(content, columns = 6)))
    val pdf = pdfAround(enc, dictExtra =
      " /Filter [/ASCII85Decode /FlateDecode]" +
        " /DecodeParms << /Predictor 12 /Columns 6 >>")
    assert(BinaryText.extract(pdf) == "lone dict to flate")
  }

  test("PDF: explicit null /DecodeParms entry for a Flate stage must NOT " +
    "inherit another stage's predictor via the whole-dict fallback") {
    // chain [/FlateDecode /FlateDecode]: the FIRST stage's parms are an
    // explicit null, the SECOND carries the predictor. The payload is
    // deflate(pngUp(deflate(content))) — decoding must unpredict ONLY
    // after the second inflate; running unpredict after the first (the
    // old whole-dict fallback on a null entry) garbles the bytes.
    val content = "BT (null parms isolated) Tj ET".getBytes(ISO_8859_1)
    val enc = deflate(pngUpEncode(deflate(content), columns = 5))
    val pdf = pdfAround(enc, dictExtra =
      " /Filter [/FlateDecode /FlateDecode]" +
        " /DecodeParms [<< /Predictor 12 /Columns 5 >> null]")
    assert(BinaryText.extract(pdf) == "null parms isolated")
  }

  // ---- cross-reference-guided generation resolution ----

  /** `N 0 obj` around a raw content stream, as a string. */
  private def objStr(n: Int, content: String): String =
    s"$n 0 obj << /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n"

  /** Two generations of object 1 (the incremental-update shape): the
    * superseded one shows "stale superseded text", the live one "fresh
    * live text". `trailerFor(liveOff, xrefOff)` appends the xref; empty
    * for the no-xref fallback fixture.
    */
  private def pdfTwoGen(trailerFor: (Int, Int) => String): Array[Byte] = {
    val header = "%PDF-1.4\n"
    val o1a = objStr(1, "BT (stale superseded text) Tj ET")
    val o1b = objStr(1, "BT (fresh live text) Tj ET")
    val liveOff = header.length + o1a.length
    val xrefOff = liveOff + o1b.length
    (header + o1a + o1b + trailerFor(liveOff, xrefOff)).getBytes(ISO_8859_1)
  }

  private def classicXref(liveOff: Int, xrefOff: Int): String =
    f"xref\n0 2\n0000000000 65535 f \n$liveOff%010d 00000 n \n" +
      s"trailer\n<< /Size 2 >>\nstartxref\n$xrefOff\n%%EOF\n"

  test("PDF xref: a superseded object generation (incremental update) is " +
    "dropped; only the live generation's text extracts") {
    val txt = BinaryText.extract(pdfTwoGen(classicXref))
    assert(txt == "fresh live text", s"got: $txt")
  }

  test("PDF xref: without a cross-reference chain the whole-file scan " +
    "keeps both generations (the pinned fallback)") {
    val txt = BinaryText.extract(pdfTwoGen((_, _) => "%%EOF\n"))
    assert(txt.contains("stale superseded text") && txt.contains("fresh live text"),
      s"got: $txt")
  }

  test("PDF xref: a startxref pointing at a non-xref target falls back to " +
    "the full scan instead of dropping text") {
    // aim startxref at the FIRST object header — parseable as neither a
    // classic table nor an /XRef stream dict
    val txt = BinaryText.extract(pdfTwoGen((_, _) =>
      s"startxref\n${"%PDF-1.4\n".length}\n%%EOF\n"))
    assert(txt.contains("stale superseded text") && txt.contains("fresh live text"),
      s"got: $txt")
  }

  test("PDF xref: an /XRef STREAM (binary rows, W [1 4 1]) resolves the " +
    "live generation and validates header offsets") {
    val header = "%PDF-1.4\n"
    val o1a = objStr(1, "BT (stale superseded text) Tj ET")
    val o1b = objStr(1, "BT (fresh live text) Tj ET")
    val liveOff = header.length + o1a.length
    val xrefOff = liveOff + o1b.length
    def be(v: Long, w: Int): Array[Byte] =
      (0 until w).map(j => ((v >> (8 * (w - 1 - j))) & 0xff).toByte).toArray
    val rows =
      be(0, 1) ++ be(0, 4) ++ be(0, 1) ++          // obj 0: free
      be(1, 1) ++ be(liveOff, 4) ++ be(0, 1) ++    // obj 1: live at o1b
      be(1, 1) ++ be(xrefOff, 4) ++ be(0, 1)       // obj 2: the xref stream
    val bos = new ByteArrayOutputStream()
    bos.write((header + o1a + o1b).getBytes(ISO_8859_1))
    bos.write((s"2 0 obj << /Type /XRef /W [1 4 1] /Size 3 " +
      s"/Length ${rows.length} >>\nstream\n").getBytes(ISO_8859_1))
    bos.write(rows)
    bos.write(s"\nendstream\nendobj\nstartxref\n$xrefOff\n%%EOF\n".getBytes(ISO_8859_1))
    val txt = BinaryText.extract(bos.toByteArray)
    assert(txt == "fresh live text", s"got: $txt")
  }

  test("PDF xref: hybrid /XRefStm entries take precedence over the classic " +
    "section's (which marks the object free for pre-1.5 readers)") {
    val header = "%PDF-1.4\n"
    val o1a = objStr(1, "BT (stale superseded text) Tj ET")
    val o1b = objStr(1, "BT (fresh live text) Tj ET")
    val liveOff = header.length + o1a.length
    val stmOff = liveOff + o1b.length
    def be(v: Long, w: Int): Array[Byte] =
      (0 until w).map(j => ((v >> (8 * (w - 1 - j))) & 0xff).toByte).toArray
    val rows =
      be(0, 1) ++ be(0, 4) ++ be(0, 1) ++       // obj 0: free
      be(1, 1) ++ be(liveOff, 4) ++ be(0, 1) ++ // obj 1: LIVE per the stream
      be(1, 1) ++ be(stmOff, 4) ++ be(0, 1)     // obj 2: the xref stream
    val bos = new ByteArrayOutputStream()
    bos.write((header + o1a + o1b).getBytes(ISO_8859_1))
    bos.write((s"2 0 obj << /Type /XRef /W [1 4 1] /Size 3 " +
      s"/Length ${rows.length} >>\nstream\n").getBytes(ISO_8859_1))
    bos.write(rows)
    bos.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    val xrefOff = bos.size
    // classic companion section: obj 1 FREE (the hybrid convention),
    // /XRefStm pointing at the stream that actually resolves it
    bos.write((f"xref\n0 2\n0000000000 65535 f \n0000000000 00001 f \n" +
      s"trailer\n<< /Size 3 /XRefStm $stmOff >>\nstartxref\n$xrefOff\n%%EOF\n")
      .getBytes(ISO_8859_1))
    val txt = BinaryText.extract(bos.toByteArray)
    assert(txt == "fresh live text", s"got: $txt")
  }

  test("PDF xref: an object FREED by the newest table contributes no text") {
    val header = "%PDF-1.4\n"
    val o1 = objStr(1, "BT (freed text) Tj ET")
    val o2 = objStr(2, "BT (kept text) Tj ET")
    val off2 = header.length + o1.length
    val xrefOff = off2 + o2.length
    val xref = f"xref\n0 3\n0000000000 65535 f \n0000000000 00001 f \n" +
      f"$off2%010d 00000 n \ntrailer\n<< /Size 3 >>\nstartxref\n$xrefOff\n%%EOF\n"
    val txt = BinaryText.extract((header + o1 + o2 + xref).getBytes(ISO_8859_1))
    assert(txt == "kept text", s"got: $txt")
  }

  test("PDF xref: a string literal '(1 0 obj)' inside a live object's " +
    "dictionary is not mistaken for a header — its stream stays live") {
    // The false header sits between obj 2's real header and its stream
    // keyword; nearest-preceding attribution onto it would resolve obj
    // 1 (live at a DIFFERENT offset) and wrongly drop obj 2's text.
    val header = "%PDF-1.4\n"
    val o1 = objStr(1, "BT (first object text) Tj ET")
    val c2 = "BT (second object text) Tj ET"
    val o2 = s"2 0 obj << /Length ${c2.length} /Note (1 0 obj) >>\n" +
      s"stream\n$c2\nendstream\nendobj\n"
    val off1 = header.length
    val off2 = off1 + o1.length
    val xrefOff = off2 + o2.length
    val xref = f"xref\n0 3\n0000000000 65535 f \n$off1%010d 00000 n \n" +
      f"$off2%010d 00000 n \ntrailer\n<< /Size 3 >>\nstartxref\n$xrefOff\n%%EOF\n"
    val txt = BinaryText.extract((header + o1 + o2 + xref).getBytes(ISO_8859_1))
    assert(txt.contains("first object text") && txt.contains("second object text"),
      s"got: $txt")
  }

  test("PDF xref: a superseded stream whose dict embeds '(2 0 obj)' is " +
    "still dropped — extent filtering keeps real boundaries") {
    // Object 1's STALE generation carries the decoy literal; the extent
    // scan must still accept the stale header itself (it starts outside
    // any prior extent) so the xref check can reject its stream.
    val header = "%PDF-1.4\n"
    val c1a = "BT (stale decoy text) Tj ET"
    val o1a = s"1 0 obj << /Length ${c1a.length} /Note (2 0 obj) >>\n" +
      s"stream\n$c1a\nendstream\nendobj\n"
    val o1b = objStr(1, "BT (fresh live text) Tj ET")
    val liveOff = header.length + o1a.length
    val xrefOff = liveOff + o1b.length
    val pdf = (header + o1a + o1b + classicXref(liveOff, xrefOff))
      .getBytes(ISO_8859_1)
    val txt = BinaryText.extract(pdf)
    assert(txt == "fresh live text", s"got: $txt")
  }

  test("PDF: a malformed ASCII85 group degrades to salvage, not an abort") {
    // 'v' is outside the 85 alphabet → the stream decode throws, extract
    // falls back to printable-ASCII salvage of the raw file bytes
    val pdf = pdfAround("vvvv~>".getBytes(ISO_8859_1),
      dictExtra = " /Filter /ASCII85Decode")
    val txt = BinaryText.extract(pdf)
    assert(txt.nonEmpty && txt.contains("obj"), s"expected salvage, got: $txt")
  }

  test("PDF fuzz: 600 random mutations of valid fixtures never throw " +
    "(truncation, byte flips, garbage filters)") {
    val rnd = new scala.util.Random(20260814L)
    val content = "BT (fuzz seed text) Tj T* (more) Tj ET".getBytes(ISO_8859_1)
    val fixtures = Seq(
      pdfAround(content),
      pdfAround(deflate(content), dictExtra = " /Filter /FlateDecode"),
      pdfAround(ascii85Encode(deflate(content)),
        dictExtra = " /Filter [/ASCII85Decode /FlateDecode]"),
      pdfAround(lzwEncode(content), dictExtra = " /Filter /LZWDecode"),
      pdfTwoGen(classicXref), // xref chain under mutation must never throw
      docxAround("<w:document><w:p><w:r><w:t>fuzz docx</w:t></w:r></w:p></w:document>"))
    val garbageFilters = Seq(" /Filter /Bogus", " /Filter [/ASCII85Decode /Nope]",
      " /Filter /ASCIIHexDecode", " /Filter /RunLengthDecode")
    for (case_ <- 1 to 600) {
      val base = fixtures(rnd.nextInt(fixtures.length))
      val mutated: Array[Byte] = rnd.nextInt(4) match {
        case 0 => // truncate at a random point
          base.take(1 + rnd.nextInt(base.length))
        case 1 => // flip 1..8 random bytes
          val b = base.clone()
          for (_ <- 0 until 1 + rnd.nextInt(8))
            b(rnd.nextInt(b.length)) = (rnd.nextInt(256) - 128).toByte
          b
        case 2 => // a WRONG filter name over a valid payload
          pdfAround(content, dictExtra = garbageFilters(rnd.nextInt(garbageFilters.length)))
        case _ => // random garbage spliced into the middle
          val cut = rnd.nextInt(base.length)
          base.take(cut) ++ Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte) ++
            base.drop(cut)
      }
      val txt = BinaryText.extract(mutated) // must not throw
      assert(txt != null, s"case $case_ returned null")
    }
  }

  test("loadDocuments end-to-end: real PDF fixture extracts its known text") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_pdf").toString
    val content = "BT (Resume of A. Candidate) Tj T* (Skills: Spark) Tj ET".getBytes(ISO_8859_1)
    Files.write(Paths.get(dir, "resume.pdf"), pdfAround(content))
    val out = Sources.loadDocuments(TestSpark.spark, s"$dir/*.pdf")
      .collect().map(r => (r.getString(1), r.getString(3))).toMap
    assert(out("resume.pdf") == "Resume of A. Candidate\nSkills: Spark")
  }
}
