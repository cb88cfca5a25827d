package graft

import graft.operators.BpeTokenizer
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level BPE (public GPT-2 construction): byte→unicode table,
  * pre-tokenizer regex, cascading merge loop, and the
  * ascending-sweep ≡ classic-loop equivalence that the DuckDB oracle of
  * q_chunk_tokens_bpe depends on.
  */
class BpeSpec extends AnyFunSuite {
  import BpeTokenizer._

  private val G = "Ġ"

  test("byte→unicode table: bijective, printable ranges identity, space→Ġ") {
    assert(byteEncoder.distinct.length == 256)
    assert(byteEncoder('a') == 'a' && byteEncoder('!') == '!' && byteEncoder('~') == '~')
    assert(byteEncoder(0x20) == 'Ġ') // Ġ
    assert(byteEncoder(0x0A) == (256 + 10).toChar) // \n is the 11th remapped byte
    assert(byteDecoder.size == 256)
    for (b <- 0 until 256) assert(byteDecoder(byteEncoder(b)) == b.toByte)
  }

  test("pre-tokenizer matches the published GPT-2 regex behavior") {
    assert(preTokens("the fast key") == Seq("the", " fast", " key"))
    assert(preTokens("don't stop") == Seq("don", "'t", " stop"))
    assert(preTokens("abc123 x!") == Seq("abc", "123", " x", "!"))
    // trailing spaces stay one run; inner double space splits off leading space
    assert(preTokens("a  b ") == Seq("a", " ", " b", " "))
    assert(preTokens("") == Seq.empty)
  }

  test("cascading merges: hand-computed tokenizations under fixtureMerges") {
    val ranks = ranksOf(fixtureMerges)
    def bpe(w: String) = applyMerges(toSymbols(w), ranks)
    // "Ġthe": Ġ+t (r0) … h+e (r1) → Ġt+he (r2) → one token
    assert(bpe(" the") == Vector(G + "the"))
    // word-initial "the": h+e only (Ġt never forms) → [t, he]
    assert(bpe("the") == Vector("t", "he"))
    // "Ġjoin": i+n (r3) → Ġ+j (r11) → o+in (r12) → Ġj+oin (r13): both
    // operands of the final merge are themselves merge outputs
    assert(bpe(" join") == Vector(G + "join"))
    // "Ġscan": Ġ+s (r7), a+n (r5) → Ġs+c (r9) → [Ġsc, an]
    assert(bpe(" scan") == Vector(G + "sc", "an"))
    // "line": i+n (r3) → in+e (r10) → [l, ine]
    assert(bpe("line") == Vector("l", "ine"))
  }

  /** Independent ascending-sweep model (what the DuckDB oracle runs):
    * one leftmost-greedy merge-all pass PER RANK, in rank order, never
    * revisiting earlier ranks.
    */
  private def sweep(symbols: Vector[String], merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(symbols) { case (word, (x, y)) =>
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < word.length) {
        if (i < word.length - 1 && word(i) == x && word(i + 1) == y) {
          buf += x + y; i += 2
        } else { buf += word(i); i += 1 }
      }
      buf.result()
    }

  test("ascending sweep ≡ classic loop for the training-consistent table " +
    "(the oracle-equivalence theorem), incl. adjacent-repeat words") {
    val ranks = ranksOf(fixtureMerges)
    val words = Seq("the", " the", " there", " join", " joiner", " scan",
      " scanner", "line", " inline", " thethe", " erer", " ananan",
      " jjoin", " tthe", " sscan", " x", "", " ", " atatat", " inin")
    for (w <- words; if w.nonEmpty) {
      assert(applyMerges(toSymbols(w), ranks) == sweep(toSymbols(w), fixtureMerges),
        s"sweep diverged from classic loop on '$w'")
    }
    // and on every distinct word of the real sf0.001 corpus
    val spark = TestSpark.spark
    val corpusWords = Tables.documents(spark, TestSpark.sf0001)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).filter(_.nonEmpty)
    for (w <- corpusWords; form <- Seq(w, " " + w)) {
      assert(applyMerges(toSymbols(form), ranks) == sweep(toSymbols(form), fixtureMerges),
        s"sweep diverged on corpus word '$form'")
    }
  }

  test("ids: deterministic base-256 + rank construction; counts stable") {
    val ids = encodeIds(" the fast", fixtureMerges)
    // " the" → Ġthe = merge rank 2 → id 258; " fast": Ġ+f?, no merge for
    // Ġf — [Ġ, f, a, s, t] with a+t? not adjacent… f,a,s,t: (a,s)? no;
    // (s,t)? no; (a,t) not adjacent. Ġ maps to byte 0x20 → id 32.
    assert(ids.head == 258)
    assert(countTokens(" the fast", fixtureMerges) == 1 + ids.tail.length)
    assert(encode("", fixtureMerges).isEmpty)
  }

  test("loadMerges round-trips the published merges.txt format") {
    val f = java.nio.file.Files.createTempFile("graft_merges", ".txt")
    java.nio.file.Files.writeString(f,
      "#version: 0.2\n" + fixtureMerges.map { case (a, b) => s"$a $b" }.mkString("\n") + "\n")
    val loaded = loadMerges(f.toString)
    assert(loaded == fixtureMerges)
    // tokenization under the loaded table is identical
    assert(encode(" the scan line", loaded) == encode(" the scan line", fixtureMerges))
  }

  test("loadMerges: malformed line fails with a line-numbered message") {
    val f = java.nio.file.Files.createTempFile("graft_merges_bad", ".txt")
    java.nio.file.Files.writeString(f, "#version: 0.2\na b\nnospace\n")
    val e = intercept[IllegalArgumentException] { loadMerges(f.toString) }
    assert(e.getMessage.contains(":3:") && e.getMessage.contains("nospace"),
      s"got: ${e.getMessage}")
  }

  test("parseVocabJson: published format incl. \\u escapes; malformed fails") {
    // the GPT-2 release writes byte-encoded symbols as unicode escapes
    assert(BpeTokenizer.parseVocabJson("""{"!": 0, "Ġt": 256}""")
      == Map("!" -> 0, "Ġt" -> 256))
    assert(BpeTokenizer.parseVocabJson("{ }") == Map.empty[String, Int])
    assert(BpeTokenizer.parseVocabJson("""{"a\"b": 1, "\\": 2}""")
      == Map("a\"b" -> 1, "\\" -> 2))
    intercept[IllegalArgumentException] {
      BpeTokenizer.parseVocabJson("""{"a": }""")
    }
    intercept[IllegalArgumentException] {
      BpeTokenizer.parseVocabJson("""{"a": 1} trailing""")
    }
    // a lone '-' with no digits must raise the parser's offset-stamped
    // error, not a raw NumberFormatException from toInt (which is also
    // an IllegalArgumentException — so assert on the message)
    val lone = intercept[IllegalArgumentException] {
      BpeTokenizer.parseVocabJson("""{"a": -}""")
    }
    assert(lone.getMessage.contains("expected integer id"), lone.getMessage)
    assert(BpeTokenizer.parseVocabJson("""{"a": -7}""") == Map("a" -> -7))
  }

  test("vocab.json round-trip: published-format file (non-ASCII as \\u " +
    "escapes) composes with merges to the same ids as the construction") {
    val v = vocab(fixtureMerges)
    def esc(t: String): String = t.flatMap {
      case c if c >= ' ' && c <= '~' && c != '"' && c != '\\' => c.toString
      case c => f"\\u${c.toInt}%04x"
    }
    val json = v.toSeq.sortBy(_._2)
      .map { case (t, id) => s""""${esc(t)}": $id""" }
      .mkString("{", ", ", "}")
    val f = java.nio.file.Files.createTempFile("graft_vocab", ".json")
    java.nio.file.Files.writeString(f, json)
    val loaded = BpeTokenizer.loadVocab(f.toString)
    assert(loaded == v)
    val text = " the scan line joins the scheme"
    assert(BpeTokenizer.encodeIdsWithVocab(text, fixtureMerges, loaded)
      == encodeIds(text, fixtureMerges))
    // a mismatched merges/vocab pair fails loudly, not with wrong ids
    intercept[IllegalArgumentException] {
      BpeTokenizer.encodeIdsWithVocab(text, fixtureMerges, loaded - "Ġthe")
    }
  }

  test("published GPT-2 release files (gated): 'Hello world' -> [15496, 995]") {
    // Zero-egress environment: the released merges.txt/vocab.json cannot
    // be fetched here, and fabricating their contents would pin nothing.
    // Supply GRAFT_GPT2_DIR pointing at the public release (e.g. from
    // huggingface.co/openai-community/gpt2) and this pins the exact
    // published ids end-to-end through loadMerges + loadVocab + encode.
    val dir = sys.env.get("GRAFT_GPT2_DIR")
    assume(dir.exists(d => new java.io.File(s"$d/merges.txt").exists &&
      new java.io.File(s"$d/vocab.json").exists),
      "set GRAFT_GPT2_DIR to a dir holding the released merges.txt + vocab.json")
    val merges = loadMerges(s"${dir.get}/merges.txt")
    val v = BpeTokenizer.loadVocab(s"${dir.get}/vocab.json")
    assert(BpeTokenizer.encodeIdsWithVocab("Hello world", merges, v)
      == Seq(15496, 995))
    assert(BpeTokenizer.encodeIdsWithVocab("hello world", merges, v)
      == Seq(31373, 995))
  }

  test("requireTrainingConsistent rejects an out-of-order table") {
    intercept[IllegalArgumentException] {
      requireTrainingConsistent(Seq(("ab", "c"), ("a", "b")))
    }
  }

  test("q_chunk_tokens_bpe at sf0.001 matches a driver-local recount") {
    val spark = TestSpark.spark
    val got = queries.Analysis.chunkTokensBpe(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val count = counter(fixtureMerges)
    val expect = docs.map { case (id, t) =>
      val n = count(t).toLong; (id, n, (n + 63) / 64)
    }
    assert(got.toSeq == expect.toSeq)
    // BPE compresses: strictly fewer tokens than bytes, more than words
    val wsCount = docs.map(_._2.split(" ").length.toLong).sum
    val bpeTotal = got.map(_._2).sum
    assert(bpeTotal > wsCount, "BPE sub-word counts must exceed word counts")
    assert(bpeTotal < docs.map(_._2.length.toLong).sum, "must beat byte count")
  }
}
