package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

/** Byte-level BPE tokenizer — the public GPT-2 construction (Radford et
  * al. 2019; openai/gpt-2 `encoder.py`, reimplemented from the published
  * algorithm): regex pre-tokenization, the 256-entry byte→unicode
  * remapping (so every byte is a printable symbol and merges operate on
  * plain strings), then iterative lowest-rank pair merging per
  * pre-token. The reference counts tokens implicitly through its LLM
  * calls; a training-data pipeline needs the counts DATA-side — packing,
  * chunking, and cost accounting are all token-denominated (SURVEY §2.3
  * text-analysis north star).
  *
  * The merges table is pluggable ([[loadMerges]] reads the published
  * `merges.txt` format); [[fixtureMerges]] is a small deterministic
  * training-consistent table (every merge's operands are base symbols or
  * outputs of strictly earlier merges — the invariant real BPE training
  * guarantees) used by the oracled query, where DuckDB replays the SAME
  * merges as one `list_reduce` pass per rank. Training-consistency is
  * what makes a single ascending-rank sweep equal the classic
  * lowest-rank-first loop: a merge at rank r can only create pairs whose
  * rank exceeds r, so no earlier rank ever needs revisiting (asserted by
  * [[requireTrainingConsistent]] at table-construction time, and pinned
  * against the naive loop in BpeSpec).
  *
  * Scale shape: encoding is per-row map-side work — no shuffle, no state;
  * the ranks map broadcasts with the closure (|merges| entries). At
  * 100 TB the cost is pure executor CPU, linear in bytes.
  */
object BpeTokenizer {

  /** GPT-2 byte→unicode table: the three printable ranges `!`..`~`,
    * `¡`..`¬`, `®`..`ÿ` map to themselves; the other 68 bytes map to
    * 256+n in ascending byte order (space 0x20 → U+0120 'Ġ').
    */
  val byteEncoder: Array[Char] = {
    val out = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      val printable = (b >= '!' && b <= '~') || (b >= 0xA1 && b <= 0xAC) ||
        (b >= 0xAE && b <= 0xFF)
      if (printable) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  /** Inverse of [[byteEncoder]] (decode side). */
  val byteDecoder: Map[Char, Byte] =
    byteEncoder.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** The published GPT-2 pre-tokenizer regex: contractions, optional-
    * space letter runs, digit runs, punctuation runs, then whitespace
    * (keeping a trailing run intact via the lookahead). Java regex
    * supports the lookahead directly.
    */
  private val PreTokenPat = java.util.regex.Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")

  def preTokens(text: String): Seq[String] = {
    val m = PreTokenPat.matcher(text)
    val out = scala.collection.mutable.Buffer[String]()
    while (m.find()) out += m.group()
    out.toSeq
  }

  /** One pre-token's bytes as byte-encoded single-char symbols. */
  def toSymbols(preToken: String): Vector[String] =
    preToken.getBytes(UTF_8).toVector.map(b => byteEncoder(b & 0xff).toString)

  /** Classic BPE loop: repeatedly find the LOWEST-rank adjacent pair and
    * merge every occurrence leftmost-greedily, until no ranked pair
    * remains.
    */
  def applyMerges(symbols: Vector[String],
      ranks: Map[(String, String), Int]): Vector[String] = {
    var word = symbols
    var continue = word.length >= 2
    while (continue) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < word.length - 1) {
        val r = ranks.getOrElse((word(i), word(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (word(i), word(i + 1)) }
        i += 1
      }
      if (best == null) continue = false
      else {
        val buf = Vector.newBuilder[String]
        var j = 0
        while (j < word.length) {
          if (j < word.length - 1 && word(j) == best._1 && word(j + 1) == best._2) {
            buf += word(j) + word(j + 1); j += 2
          } else { buf += word(j); j += 1 }
        }
        word = buf.result()
        continue = word.length >= 2
      }
    }
    word
  }

  def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Encode text to token SYMBOLS (byte-encoded strings). */
  def encode(text: String, merges: Seq[(String, String)]): Seq[String] = {
    val ranks = ranksOf(merges)
    preTokens(text).flatMap(pt => applyMerges(toSymbols(pt), ranks))
  }

  /** Deterministic id space: single-char base symbols get their byte
    * value 0..255; the symbol produced by merge rank r gets 256+r —
    * the standard construction for a from-scratch training run. For
    * the PUBLISHED GPT-2 id space, load the released vocab.json with
    * [[loadVocab]] and compose via [[encodeIdsWithVocab]].
    */
  def vocab(merges: Seq[(String, String)]): Map[String, Int] = {
    val base = (0 until 256).map(b => byteEncoder(b).toString -> b)
    val merged = merges.zipWithIndex.map { case ((a, b), r) => (a + b) -> (256 + r) }
    (base ++ merged).toMap
  }

  def encodeIds(text: String, merges: Seq[(String, String)]): Seq[Int] = {
    val v = vocab(merges)
    encode(text, merges).map(v)
  }

  /** Parse the published `vocab.json` format — ONE flat JSON object
    * mapping token string → integer id (the GPT-2 release writes the
    * byte-encoded symbols with standard JSON escapes, e.g. `"Ġt"`
    * for `Ġt`). Hand-rolled parser for exactly this shape: no library
    * dependency, and malformed input fails with an offset-stamped
    * message instead of a silent partial map.
    */
  private[graft] def parseVocabJson(s: String): Map[String, Int] = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"vocab.json offset $i: $msg")
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s(i) != '"') {
        if (s(i) == '\\') {
          if (i + 1 >= s.length) fail("dangling escape")
          s(i + 1) match {
            case '"' => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case '/' => sb += '/'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' =>
              if (i + 6 > s.length) fail("truncated \\u escape")
              val hex = s.substring(i + 2, i + 6)
              val v = try Integer.parseInt(hex, 16)
                catch { case _: NumberFormatException => fail(s"bad \\u$hex") }
              sb += v.toChar; i += 6
            case c => fail(s"unknown escape \\$c")
          }
        } else { sb += s(i); i += 1 }
      }
      expect('"')
      sb.toString
    }
    def int(): Int = {
      val start = i
      if (i < s.length && s(i) == '-') i += 1
      val digits = i // a lone '-' must fail too, not NumberFormatException
      while (i < s.length && s(i).isDigit) i += 1
      if (i == digits) fail("expected integer id")
      s.substring(start, i).toInt
    }
    val out = Map.newBuilder[String, Int]
    ws(); expect('{'); ws()
    if (i < s.length && s(i) == '}') { i += 1 }
    else {
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':'); ws(); val v = int(); ws()
        out += k -> v
        if (i < s.length && s(i) == ',') { i += 1 }
        else { expect('}'); more = false }
      }
    }
    ws()
    if (i != s.length) fail("trailing content after object")
    out.result()
  }

  /** Published vocab.json loader (see [[parseVocabJson]]). */
  def loadVocab(path: String): Map[String, Int] =
    parseVocabJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), UTF_8))

  /** Encode to the PUBLISHED id space: token symbols from `merges`, ids
    * from the released vocab.json map. With the real GPT-2 pair this
    * reproduces the exact public ids (e.g. "Hello world" → 15496, 995 —
    * pinned by the gated spec in BpeSpec, which runs whenever the
    * released files are supplied). A symbol absent from the vocab is a
    * mismatched merges/vocab pair — fails loudly.
    */
  def encodeIdsWithVocab(text: String, merges: Seq[(String, String)],
      vocab: Map[String, Int]): Seq[Int] =
    encode(text, merges).map(sym => vocab.getOrElse(sym,
      throw new IllegalArgumentException(
        s"symbol '$sym' not in vocab — mismatched merges/vocab pair")))

  def countTokens(text: String, merges: Seq[(String, String)]): Int =
    encode(text, merges).size

  /** Reusable counting closure: ranks built ONCE, not per row — the form
    * a UDF should capture.
    */
  def counter(merges: Seq[(String, String)]): String => Int = {
    val ranks = ranksOf(merges)
    text => preTokens(text).iterator
      .map(pt => applyMerges(toSymbols(pt), ranks).size).sum
  }

  /** Published merges.txt format: one `left right` pair per line, `#`
    * comment/version line first. The source is always closed (Using);
    * a line that is not exactly two space-separated symbols fails with
    * a line-numbered message instead of an index error.
    */
  def loadMerges(path: String): Seq[(String, String)] =
    scala.util.Using.resource(scala.io.Source.fromFile(path, "UTF-8")) { src =>
      src.getLines().zipWithIndex
        .filterNot { case (l, _) => l.startsWith("#") || l.trim.isEmpty }
        .map { case (l, i) =>
          val p = l.split(" ", -1)
          require(p.length == 2 && p(0).nonEmpty && p(1).nonEmpty,
            s"$path:${i + 1}: expected 'left right', got: '$l'")
          (p(0), p(1))
        }
        .toSeq
    }

  /** Every merge's operands are base (single-char) symbols or outputs of
    * strictly earlier merges — the invariant that makes ascending-rank
    * sweeps equivalent to the classic loop (and that real training
    * guarantees, since a pair can only be counted once both its halves
    * exist).
    */
  def requireTrainingConsistent(merges: Seq[(String, String)]): Seq[(String, String)] = {
    val known = scala.collection.mutable.Set[String]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      require(a.length == 1 || known.contains(a),
        s"merge $r: left operand '$a' is neither base nor an earlier output")
      require(b.length == 1 || known.contains(b),
        s"merge $r: right operand '$b' is neither base nor an earlier output")
      known += (a + b)
    }
    merges
  }

  private val G = "Ġ" // byte-encoded space, 'Ġ'

  /** Deterministic fixture table over the lowercase-ASCII corpus
    * alphabet: 14 training-consistent merges exercising multi-level
    * cascades (Ġt+he→Ġthe; Ġj+oin→Ġjoin where BOTH operands are merge
    * outputs).
    */
  val fixtureMerges: Seq[(String, String)] = requireTrainingConsistent(Seq(
    (G, "t"),
    ("h", "e"),
    (G + "t", "he"),
    ("i", "n"),
    ("e", "r"),
    ("a", "n"),
    ("o", "r"),
    (G, "s"),
    ("a", "t"),
    (G + "s", "c"),
    ("in", "e"),
    (G, "j"),
    ("o", "in"),
    (G + "j", "oin"),
  ))
}
