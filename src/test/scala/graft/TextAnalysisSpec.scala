package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c).collect().head.get(0).asInstanceOf[T]

  private def oneSeq(c: org.apache.spark.sql.Column, text: String): Seq[String] =
    Seq(text).toDF("text").select(c).collect().head.getSeq[String](0).toList

  test("tokens drops empties from repeated whitespace") {
    assert(oneSeq(TextAnalysis.tokens(col("text")), "a  b   c") == List("a", "b", "c"))
  }

  test("shingles: 3-gram windows, distinct, word-order sensitive") {
    assert(oneSeq(TextAnalysis.shingles(col("text"), 3), "a b c d") ==
      List("a b c", "b c d"))
    assert(oneSeq(TextAnalysis.shingles(col("text"), 3), "a b") == Nil)
  }

  test("tokenChunks: overlapping context windows, tail chunk clamped") {
    val text = (1 to 10).map("w" + _).mkString(" ")
    val chunks = oneSeq(TextAnalysis.tokenChunks(col("text"), size = 4, overlap = 1), text)
    // step 3: ceil((10-1)/3) = 3 chunks at token starts 1,4,7 — full coverage
    assert(chunks == List("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(oneSeq(TextAnalysis.tokenChunks(col("text"), 4, 1), "a b") == List("a b"))
    assert(oneSeq(TextAnalysis.tokenChunks(col("text"), 4, 1), "") == Nil)
  }

  test("langId picks the language with most marker hits; und when none") {
    assert(one[String](TextAnalysis.langId(col("text")), "the cat and the dog") == "en")
    assert(one[String](TextAnalysis.langId(col("text")), "el gato y la casa de que") == "es")
    assert(one[String](TextAnalysis.langId(col("text")), "der hund und die katze ist") == "de")
    assert(one[String](TextAnalysis.langId(col("text")), "le chat et les maisons des une") == "fr")
    assert(one[String](TextAnalysis.langId(col("text")), "xyzzy plugh") == "und")
  }

  test("qualityScore in [0,1]; saturates with length and diversity") {
    val short = one[Double](TextAnalysis.qualityScore(col("text")), "word")
    val rich = one[Double](TextAnalysis.qualityScore(col("text")),
      (1 to 150).map("w" + _).mkString(" "))
    assert(short >= 0.0 && short <= 1.0 && rich >= 0.0 && rich <= 1.0)
    assert(rich == 1.0) // 150 distinct tokens: length part 0.5 + diversity 0.5
    assert(short < rich)
  }

  test("fingerprint is order- and duplication-invariant") {
    val a = one[String](TextAnalysis.fingerprint(col("text")), "b a c a")
    val b = one[String](TextAnalysis.fingerprint(col("text")), "c b a")
    val c = one[String](TextAnalysis.fingerprint(col("text")), "c b a d")
    assert(a == b && a != c)
  }

  test("fingerprint of empty, whitespace-only, and NULL text is NULL") {
    // matches the oracle: list_aggregate over an empty/NULL list is NULL
    val out = Seq(Some(""), Some("   "), None, Some("a"))
      .toDF("text").select(TextAnalysis.fingerprint(col("text")))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).isEmpty && out(1).isEmpty && out(2).isEmpty && out(3).nonEmpty)
  }

  test("rollingHash is order-sensitive where fingerprint is not") {
    val a = one[Long](TextAnalysis.rollingHash(col("text")), "a b c")
    val b = one[Long](TextAnalysis.rollingHash(col("text")), "c b a")
    val a2 = one[Long](TextAnalysis.rollingHash(col("text")), "a b c")
    assert(a == a2 && a != b)
    assert(a >= 0 && a < 2147483647L)
    assert(one[Long](TextAnalysis.rollingHash(col("text")), "") == 0L)
  }

  test("simhash: identical texts agree; near texts are hamming-close") {
    def hamming(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    val base = (1 to 50).map("tok" + _).mkString(" ")
    val near = ((1 to 48).map("tok" + _) ++ Seq("aaa", "bbb")).mkString(" ")
    val far = (100 to 150).map("zz" + _).mkString(" ")
    val Seq(h1, h2, h3) = Seq(base, near, far).map(t =>
      one[Long](TextAnalysis.simhash(col("text")), t))
    assert(hamming(h1, h1) == 0)
    assert(hamming(h1, h2) < hamming(h1, h3))
  }

  test("md5Hash60 equals the DuckDB construction (hex prefix as bigint)") {
    // '0x' || substr(md5('abc'),1,15) == 648541476951500027 (probed in DuckDB)
    assert(one[Long](TextAnalysis.md5Hash60(col("text")), "abc") == 648541476951500027L)
  }

  test("PII redaction replaces emails, SSNs, phones, IPs and counts them") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "mail me at jane.doe+x@corp-name.io or call 555-123-4567 today"),
      (2L, "ssn 123-45-6789 from host 10.0.255.7"),
      (3L, "no sensitive content in this perfectly ordinary sentence")
    ).toDF("id", "text")
    val got = rows.select(col("id"),
        TextAnalysis.redactPii(col("text")).as("red"),
        TextAnalysis.piiCounts(col("text")).as("cnt"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getMap[String, Long](2).toMap)).toMap
    assert(got(1L)._1 == "mail me at [email] or call [phone] today")
    assert(got(1L)._2 == Map("email" -> 1L, "ssn" -> 0L, "phone" -> 1L, "ipv4" -> 0L))
    assert(got(2L)._1 == "ssn [ssn] from host [ipv4]")
    assert(got(2L)._2 == Map("email" -> 0L, "ssn" -> 1L, "phone" -> 0L, "ipv4" -> 1L))
    assert(got(3L)._1 == "no sensitive content in this perfectly ordinary sentence")
    assert(got(3L)._2.values.forall(_ == 0L))
  }

  test("PII counts attribute overlapping spans to the consuming pattern") {
    import org.apache.spark.sql.functions.col
    val got = Seq("reach 555-123-4567@corp.io today").toDF("text")
      .select(TextAnalysis.redactPii(col("text")).as("red"),
        TextAnalysis.piiCounts(col("text")).as("cnt"))
      .collect().head
    assert(got.getString(0) == "reach [email] today")
    val cnt = got.getMap[String, Long](1).toMap
    assert(cnt("email") == 1L && cnt("phone") == 0L && cnt("ssn") == 0L)
  }
}
