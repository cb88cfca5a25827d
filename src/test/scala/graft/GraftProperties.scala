package graft

import graft.operators.SectionChunker
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property suites (SURVEY §5.3) for the pure (non-Spark)
  * operator kernels — fast, no session.
  */
object ChunkerProperties extends Properties("SectionChunker") {

  private val word = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))
  private val header = Gen.oneOf(
    "Summary:", "SKILLS:", "Work History\n", "projects:", "Education:",
    "certifications:", "Strengths:", "Objective:", "not a header")
  private val fragment: Gen[String] = Gen.oneOf(
    word.map(_ + " "), header, Gen.const("\n"))
  private val text: Gen[String] =
    Gen.listOf(fragment).map(_.mkString(""))

  property("keys are canonical") = forAll(text) { t =>
    SectionChunker.chunk(t).forall { case (k, _, _) =>
      SectionChunker.sectionPatterns.exists(_._1 == k)
    }
  }

  property("content is a trimmed substring of the input") = forAll(text) { t =>
    SectionChunker.chunk(t).forall { case (_, c, _) =>
      c == c.trim && (c.isEmpty || t.contains(c))
    }
  }

  property("keys are unique (keep-last dedup)") = forAll(text) { t =>
    val keys = SectionChunker.chunk(t).map(_._1)
    keys.distinct == keys
  }

  property("chunking is deterministic") = forAll(text) { t =>
    SectionChunker.chunk(t) == SectionChunker.chunk(t)
  }
}

object ScoreProperties extends Properties("ScoreNormalization") {

  private val dist = Gen.chooseNum(0.0, 1e12)

  property("score in (0, 10] and decreasing in distance") =
    forAll(dist, dist) { (d1, d2) =>
      def s(d: Double) = 10.0 / (1.0 + d)
      val inRange = s(d1) > 0.0 && s(d1) <= 10.0
      val monotone = (d1 <= d2) == (s(d1) >= s(d2))
      inRange && monotone
    }

  property("jaccard from sizes is in [0,1]") =
    forAll(Gen.chooseNum(0, 1000), Gen.chooseNum(0, 1000), Gen.chooseNum(0, 1000)) {
      (na, nb, interRaw) =>
        val inter = math.min(interRaw, math.min(na, nb))
        val union = na + nb - inter
        val j = if (union == 0) 0.0 else inter.toDouble / union
        j >= 0.0 && j <= 1.0
    }
}

object MinhashProperties extends Properties("Minhash") {

  property("affine constants are odd, positive, under 2^31") = Prop {
    (graft.operators.Dedup.minhashA ++ graft.operators.Dedup.minhashB).forall(a =>
      a > 0 && a % 2 == 1 && a < (1L << 31))
  }

  property("affine transform stays in non-negative long range (no overflow)") =
    forAll(Gen.chooseNum(0L, (1L << 60) - 1), Gen.chooseNum(0, 15)) { (h, i) =>
      val a = graft.operators.Dedup.minhashA(i)
      val b = graft.operators.Dedup.minhashB(i)
      val v = a * (h & 0x3FFFFFFFL) + b * (h >> 30) + i
      v >= 0 // would be negative if the 64-bit product overflowed
    }
}

/** FastSS deletion-neighborhood recall: if lev(a, b) <= τ, the
  * ≤τ-deletion neighborhoods of a and b must intersect (the candidate
  * generation of Clustering.editDistancePairs rests on exactly this).
  */
object DeletionNeighborhoodProperties extends Properties("DeletionNeighborhood") {
  import graft.queries.Clustering.deletionNeighborhood

  private val base: Gen[String] =
    Gen.chooseNum(4, 20).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  /** One random edit: substitution, insertion, or deletion. */
  private def edited(s: String): Gen[String] = for {
    kind <- Gen.oneOf("sub", "ins", "del")
    i <- Gen.chooseNum(0, math.max(s.length - 1, 0))
    c <- Gen.alphaNumChar
  } yield kind match {
    case "sub" if s.nonEmpty => s.updated(i, c)
    case "ins" => s.substring(0, i) + c + s.substring(i)
    case "del" if s.nonEmpty => s.substring(0, i) + s.substring(i + 1)
    case _ => s
  }

  property("one edit ⇒ τ=1 neighborhoods intersect") = forAll(base) { a =>
    forAll(edited(a)) { b =>
      deletionNeighborhood(a, 1).intersect(deletionNeighborhood(b, 1)).nonEmpty
    }
  }

  property("two edits ⇒ τ=2 neighborhoods intersect") = forAll(base) { a =>
    forAll(edited(a)) { m =>
      forAll(edited(m)) { b =>
        deletionNeighborhood(a, 2).intersect(deletionNeighborhood(b, 2)).nonEmpty
      }
    }
  }

  property("neighborhood size is 1 + n + O(n²) and contains the string") =
    forAll(base) { a =>
      val nb = deletionNeighborhood(a, 2)
      nb.contains(a) && nb.length <= 1 + a.length + a.length * a.length
    }
}

object CMapProperties extends Properties("ParseCMap") {

  private val hexTok: Gen[String] =
    Gen.chooseNum(0, 0xFFFF).map(v => f"<$v%04X>")
  private val junk: Gen[String] = Gen.oneOf(
    "<>", "<ZZ>", "<FFFFFFFFFF>", "[", "]", "beginbfchar", "endbfrange",
    "(str)", "\\n", "<0041", "0041>", "[<0041> <0042>]")
  private val body: Gen[String] =
    Gen.listOf(Gen.oneOf(
      hexTok, junk, Gen.const(" "), Gen.const("\n"),
      Gen.const("beginbfchar"), Gen.const("endbfchar"),
      Gen.const("beginbfrange"), Gen.const("endbfrange")))
      .map(_.mkString(" "))

  property("never throws, 1-byte codes stay under 0x100") = forAll(body) { s =>
    val (m1, m2) = graft.sources.BinaryText.parseCMap(s)
    m1.keys.forall(c => c >= 0 && c < 0x100) &&
      m2.keys.forall(c => c >= 0 && c <= 0xFFFF)
  }

  property("well-formed bfchar pairs always land") = forAll(
    Gen.chooseNum(0, 0xFFFF), Gen.chooseNum(0x20, 0x7E)) { (src, dst) =>
    val s = f"beginbfchar\n<$src%04X> <$dst%04X>\nendbfchar"
    graft.sources.BinaryText.parseCMap(s)._2.get(src).contains(dst.toChar.toString)
  }
}

/** Binary media/document parsers run inside executors over untrusted
  * bytes; an uncaught throw there fails a whole task (and with it the
  * job), so total robustness is a correctness property, not a nicety:
  * every parser must return (a possibly-empty Option / salvage string)
  * on ARBITRARY input. The generators bias toward the nasty region —
  * real magic prefixes followed by garbage, truncations of valid
  * fixtures, hostile declared lengths — not just uniform noise.
  */
object BinaryFuzzProperties extends Properties("BinaryParserFuzz") {
  import graft.sources.{BinaryText, Multimodal, Sources}

  private val rawBytes: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))
  private val magic: Gen[Array[Byte]] = Gen.oneOf(
    "OggS".getBytes, "RIFF1234WAVE".getBytes, "fLaC".getBytes,
    "%PDF-1.7".getBytes, "PK".getBytes,
    Array[Byte](0x89.toByte) ++ "PNG\r\n".getBytes ++ Array[Byte](0x1a, 0x0a),
    "GIF89a".getBytes, "BM".getBytes,
    Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte),
    Array[Byte](0, 0, 0, 16) ++ "ftypmp42".getBytes,
    "RIFF1234WEBP".getBytes)
  private val magicPlusJunk: Gen[Array[Byte]] =
    for { m <- magic; b <- rawBytes } yield m ++ b
  private val anyBytes: Gen[Array[Byte]] =
    Gen.oneOf(rawBytes, magicPlusJunk)

  private def total(b: Array[Byte]): Boolean = {
    Multimodal.imageDims(b)
    Multimodal.audioMeta(b)
    Multimodal.videoMeta(b)
    BinaryText.extract(b) != null
  }

  property("parsers are total on arbitrary and magic-prefixed bytes") =
    forAll(anyBytes)(total)

  property("parsers are total on truncations of valid files") = {
    // a real (tiny) PNG header + a real OGG/Opus file, cut at every length
    val png = Array[Byte](0x89.toByte) ++ "PNG\r\n".getBytes ++
      Array[Byte](0x1a, 0x0a, 0, 0, 0, 13) ++ "IHDR".getBytes ++
      Array[Byte](0, 0, 0, 64, 0, 0, 0, 32, 8, 2, 0, 0, 0)
    val opusHead = "OpusHead".getBytes ++ Array[Byte](1, 2, 56, 1, -128, -69, 0, 0, 0, 0, 0)
    val ogg = "OggS".getBytes ++ Array[Byte](0, 0) ++ Array.fill[Byte](8)(0) ++
      Array.fill[Byte](12)(0) ++ Array[Byte](1, opusHead.length.toByte) ++ opusHead
    Prop.all(
      (0 to png.length).forall(k => total(png.take(k))),
      (0 to ogg.length).forall(k => total(ogg.take(k))))
  }

  property("extract falls back to printable salvage, never null") =
    forAll(anyBytes) { b =>
      val s = Sources.extractTextStub(b)
      s != null && BinaryText.extract(b) != null
    }
}

object MortonProperties extends Properties("Layout.morton") {
  import graft.operators.Layout.mortonLocal

  private val coord = Gen.chooseNum(0L, (1L << 16) - 1)

  property("bijective: distinct pairs get distinct codes (decode roundtrip)") =
    forAll(coord, coord) { (a, b) =>
      val z = mortonLocal(a, b)
      // decode by re-collecting even/odd bits
      val da = (0 until 16).foldLeft(0L)((acc, i) => acc | (((z >> (2 * i)) & 1L) << i))
      val db = (0 until 16).foldLeft(0L)((acc, i) => acc | (((z >> (2 * i + 1)) & 1L) << i))
      da == a && db == b
    }

  property("locality: codes in an aligned 2^k box share the high prefix") =
    forAll(Gen.chooseNum(0, 7), coord, coord) { (k, a0, b0) =>
      // snap the box origin to 2^k alignment; all cells agree above bit 2k
      val mask = ~((1L << k) - 1)
      val (ba, bb) = (a0 & mask & 0xffffL, b0 & mask & 0xffffL)
      val corners = Seq((0L, 0L), ((1L << k) - 1, 0L), (0L, (1L << k) - 1),
        ((1L << k) - 1, (1L << k) - 1))
      val codes = corners.map { case (dx, dy) => mortonLocal(ba + dx, bb + dy) }
      codes.map(_ >> (2 * k)).distinct.size == 1
    }

  property("monotone along each axis at the origin row/column") =
    forAll(coord) { a =>
      mortonLocal(a, 0) <= mortonLocal(a | 1, 0) &&
        mortonLocal(0, a) <= mortonLocal(0, a | 1)
    }
}

/** Extent-filter property for the PDF object-header scan
  * (`BinaryText.trustedObjHeaders`, the input to xref-guided stream
  * attribution): decoy `N G obj` strings planted INSIDE accepted object
  * bodies — string literals in dictionaries, raw stream payloads — must
  * never be accepted as headers, and every real sequential header must
  * be, or a stream keyword could be attributed to a freed object's
  * number and a live stream dropped by the xref filter.
  */
object PdfHeaderProperties extends Properties("BinaryText.trustedObjHeaders") {
  import graft.sources.BinaryText

  // filler alphabet deliberately excludes every letter of the
  // obj/stream/endstream/endobj keywords, so the ONLY occurrences of
  // those tokens are the ones the generator plants on purpose
  private val filler: Gen[String] =
    Gen.listOf(Gen.oneOf(Seq('x', 'q', ' ', '/', '.', '<', '>') ++ ('0' to '9')))
      .map(_.mkString.take(40))
  private val decoyRef: Gen[String] = for {
    n <- Gen.chooseNum(0, 99); g <- Gen.chooseNum(0, 99)
  } yield s"$n $g obj"

  private case class ObjGen(isStream: Boolean, dictDecoy: Option[String],
      payloadDecoy: Option[String], f1: String, f2: String)
  private val objGen: Gen[ObjGen] = for {
    isStream <- Gen.oneOf(true, false)
    dd <- Gen.option(decoyRef)
    pd <- Gen.option(decoyRef)
    f1 <- filler; f2 <- filler
  } yield ObjGen(isStream, dd, pd, f1, f2)

  private val docGen: Gen[(String, IndexedSeq[(Int, Int)])] =
    Gen.nonEmptyListOf(objGen).map { objs =>
      val sb = new StringBuilder("%PDF-1.7\n")
      val truth = Vector.newBuilder[(Int, Int)]
      objs.zipWithIndex.foreach { case (o, i) =>
        val num = i + 1
        truth += ((sb.length, num))
        sb.append(s"$num 0 obj\n")
        sb.append("<< /K ").append(o.f1)
        o.dictDecoy.foreach(d => sb.append(" (").append(d).append(") "))
        sb.append(" >>")
        if (o.isStream) {
          sb.append("\nstream\n").append(o.f2)
          o.payloadDecoy.foreach(d => sb.append(' ').append(d).append(' '))
          sb.append("\nendstream")
        }
        sb.append("\nendobj\n")
      }
      (sb.toString, truth.result())
    }

  property("accepts exactly the real headers; decoys in literals and " +
    "stream payloads are extent-filtered") =
    forAll(docGen) { case (doc, truth) =>
      BinaryText.trustedObjHeaders(doc) == truth
    }

  // soundness on arbitrary token soup (malformed markup): whatever is
  // returned must be real regex header hits at strictly increasing
  // offsets — truncated extents may re-admit decoys, never invent hits
  private val soup: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.oneOf("obj", "stream", "endstream", "endobj",
      "0 0 obj", " ", "\n",
      // deliberately over-Int numerals fused against header shapes —
      // the class that once threw NumberFormatException mid-scan
      "99999999999 0 obj", "5953497340 0 obj"), filler)).map(_.mkString)
  private val HeaderPat =
    java.util.regex.Pattern.compile("(\\d+)\\s+(\\d+)\\s+obj\\b")
  property("malformed input: every accepted hit is a real regex match, " +
    "offsets strictly increase") =
    forAll(soup) { doc =>
      val hs = BinaryText.trustedObjHeaders(doc)
      val strictlyInc = hs.map(_._1).sliding(2).forall {
        case Seq(a, b) => a < b; case _ => true }
      strictlyInc && hs.forall { case (off, num) =>
        val m = HeaderPat.matcher(doc)
        // accepted numerals fit in Int by contract (over-range hits are
        // skipped as unreferencable) — toLong keeps the CHECK total too
        m.find(off) && m.start() == off &&
          m.group(1).length <= 10 && m.group(1).toLong == num
      }
    }

  // the malformed-soup regression that first surfaced as a flaky suite
  // error: digit filler fusing into an over-Int object number must be
  // skipped, never thrown on (and must not suppress later real headers
  // beyond its own extent)
  property("over-Int object numbers in corrupt headers are skipped, not thrown") = {
    val doc = "5953497340 0 obj x endobj 7 0 obj y endobj"
    Prop(BinaryText.trustedObjHeaders("5953497340 0 obj") == Vector()) &&
      Prop(BinaryText.trustedObjHeaders(doc) ==
        Vector((doc.indexOf("7 0 obj"), 7)))
  }
}

/** Writer↔parser round-trip and total-function properties for the
  * media container family: [[graft.sources.MediaCorpus]]'s writers
  * construct real container bytes for ARBITRARY valid field values,
  * and [[graft.sources.Multimodal]]'s header parsers must recover
  * exactly the written metadata — plus parsers must be TOTAL on
  * arbitrary byte soup (None, never a throw), since the ingest path
  * feeds them whatever the scan finds.
  */
object MediaRoundTripProperties extends Properties("Multimodal.parsers") {
  import graft.sources.{MediaCorpus, Multimodal}

  private val dim = Gen.chooseNum(1, 2000)
  // the PNG writer materializes the full pixel array — keep dims small
  private val pngDim = Gen.chooseNum(1, 160)

  property("png round-trip") = forAll(pngDim, pngDim) { (w, h) =>
    Multimodal.imageDims(MediaCorpus.png(w, h)).contains(("png", w, h))
  }

  property("jpeg round-trip") = forAll(dim, dim) { (w, h) =>
    Multimodal.imageDims(MediaCorpus.jpeg(w, h)).contains(("jpeg", w, h))
  }

  property("wav round-trip: duration = dataBytes * 1000 / byteRate") =
    forAll(Gen.oneOf(8000, 16000, 22050, 44100, 48000),
      Gen.chooseNum(1, 8), Gen.oneOf(8, 16, 24, 32),
      Gen.chooseNum(1, 1 << 16)) { (rate, ch, bits, dataBytes) =>
      val byteRate = rate.toLong * ch * bits / 8
      Multimodal.audioMeta(MediaCorpus.wav(rate, ch, bits, dataBytes))
        .contains(("wav", rate, ch, dataBytes * 1000L / byteRate))
    }

  property("mp4 round-trip (v0 and v1 mvhd): duration_ms") =
    forAll(Gen.chooseNum(1, 1000000), Gen.chooseNum(0L, 1L << 40),
      Gen.oneOf(true, false)) { (timescale, duration, v1) =>
      // v0 stores duration in 32 bits — constrain to the layout's range
      val d = if (v1) duration else duration & 0xFFFFFFFFL
      Multimodal.videoMeta(MediaCorpus.mp4(timescale, d, v1))
        .contains(("mp4", d * 1000L / timescale))
    }

  // totality: arbitrary bytes (including truncations of VALID headers,
  // the nastiest inputs) must never throw — None or a parsed value
  private val soup: Gen[Array[Byte]] = Gen.oneOf(
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
    for {
      w <- dim; h <- dim
      full <- Gen.oneOf[Array[Byte]](
        MediaCorpus.png(math.min(w, 160), math.min(h, 160)), MediaCorpus.jpeg(w, h),
        MediaCorpus.wav(16000, 1, 16, 1000), MediaCorpus.mp4(600, 3000L))
      cut <- Gen.chooseNum(0, full.length)
    } yield full.take(cut))

  property("parsers are total on byte soup and truncated headers") =
    forAll(soup) { b =>
      Multimodal.imageDims(b)
      Multimodal.audioMeta(b)
      Multimodal.videoMeta(b)
      true
    }
}
