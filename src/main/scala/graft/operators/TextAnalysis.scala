package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for an LLM training-data pipeline: tokenization,
  * language-ID (marker-word heuristic), quality scoring, and document
  * fingerprinting. Everything is built from codegen'd built-ins (split /
  * higher-order functions / md5) so the operators stay inside whole-stage
  * codegen and are expressible 1:1 in the DuckDB oracle.
  *
  * Determinism: ratios are int/int double divisions (exact inputs → identical
  * IEEE results cross-engine); hashes derive from md5 (identical everywhere).
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (multi-space safe). */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** BPE-ish word tokens: maximal `[a-z0-9]+` runs over lowercased text. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Count of whitespace tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Marker stopword sets per language (deterministic tie order: the
    * when-chain below prefers en > es > de > fr; no hits → "und").
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "les", "et", "des", "une"),
  )

  /** Hits of one marker set among the doc's tokens. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isInCollection(words)))

  /** Predicted language from marker-hit argmax. The when-chain checks each
    * language against only the languages after it (earlier ones already
    * failed, so they can't hold the max) — the exact CASE shape the DuckDB
    * oracle uses, so the two are trivially equivalent.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val hits = markers.map { case (lang, ws) => lang -> markerHits(toks, ws) }
    hits.tails.collect { case (lang, h) +: rest =>
      val beatsRest = rest.map { case (_, h2) => h >= h2 }
        .foldLeft(h > 0)((a, b) => a && b)
      (beatsRest, lit(lang))
    }.toSeq.foldRight(lit("und")) { case ((cond, lang), acc) =>
      when(cond, lang).otherwise(acc)
    }
  }

  /** Quality score in [0,1]: half from length saturation (tokens/100 capped
    * at 1), half from lexical diversity (distinct/total tokens). Pure
    * int-derived double math — deterministic cross-engine without rounding.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val nd = size(array_distinct(toks)).cast("double")
    val lengthPart = least(n / lit(100.0), lit(1.0)) * lit(0.5)
    val diversityPart = when(n === 0.0, 0.0).otherwise(nd / n) * lit(0.5)
    lengthPart + diversityPart
  }

  /** Content-defined fingerprint: md5 over the sorted distinct token set —
    * stable under token reordering and duplication, cross-engine identical.
    * Empty or NULL text fingerprints as NULL (not md5("")), matching the
    * oracle's list_aggregate over an empty/NULL list.
    */
  def fingerprint(text: Column): Column = {
    val dtoks = array_sort(array_distinct(tokens(text)))
    when(size(dtoks) > 0, md5(concat_ws(" ", dtoks).cast("binary")))
      .otherwise(lit(null).cast("string"))
  }

  /** Polynomial rolling hash over the token stream (order-SENSITIVE,
    * Rabin–Karp style): acc = (acc·31 + h(token) mod P) mod P with
    * P = 2^31−1 — the left-to-right fold keeps every intermediate under
    * 2^36, overflow-safe in both engines, and `list_reduce` reproduces it
    * exactly. Complements `fingerprint` (order-free): equal token
    * multisets in different order fingerprint equal but roll different.
    */
  def rollingHash(text: Column): Column =
    coalesce( // NULL text → 0, matching the oracle's coalesce(..., 0)
      aggregate(
        transform(tokens(text), t => md5Hash60(t) % 2147483647L),
        lit(0L), (acc, h) => (acc * 31L + h) % 2147483647L),
      lit(0L))

  /** Context-window chunks: token windows of `size` with `overlap` tokens
    * shared between consecutive chunks — the standard LLM-context split.
    * Returns an array of chunk strings; empty text → single empty chunk
    * array. Pure HOF slicing, one pass, no shuffle.
    */
  def tokenChunks(text: Column, size: Int, overlap: Int): Column = {
    require(size > overlap && overlap >= 0, "need size > overlap >= 0")
    val step = size - overlap
    val toks = tokens(text)
    val n = org.apache.spark.sql.functions.size(toks)
    // number of chunks = ceil(max(n - overlap, 0) / step), at least 1 when n > 0
    val nChunks = ceil((greatest(n - overlap, lit(0))).cast("double") / step).cast("int")
    when(n === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
        i => concat_ws(" ", slice(toks, i * step + 1, lit(size)))))
  }

  /** 60-bit token hash derived from md5 (first 15 hex chars) — the same
    * value DuckDB computes with CAST('0x'||substr(md5(t),1,15) AS BIGINT),
    * so hash-based operators (simhash, minhash) stay oracle-checkable.
    */
  def md5Hash60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Seeded variant for minhash signature families. */
  def md5Hash60Seeded(s: Column, seed: Column): Column =
    md5Hash60(concat(seed.cast("string"), lit(":"), s))

  /** Distinct n-token shingles ("w1 w2 w3" for consecutive triples at n=3)
    * — the unit of near-dup detection; word-order sensitive where plain
    * token sets are not. Served by the compiled single-pass
    * [[graft.functions.Shingles]] expression (r21): the previous HOF
    * spelling (`array_distinct(transform(sequence(...), slice+concat))`)
    * is interpreted per element in Spark 4 — ShinglesSpec pins
    * bit-equality between the two forms.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.Shingles(text, n)

  /** PII patterns for redaction (Java∩RE2 syntax — no lookarounds, so
    * the same patterns run in any engine): email, NANP-style phone,
    * SSN, IPv4. Ordered so no earlier replacement creates a later match.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** Replace each PII match with its [kind] placeholder — the redaction
    * pass a training corpus runs before anything else persists the
    * text. Chained codegen'd regexp_replace, narrow per-row work.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"[$name]")
    }

  /** MAP(kind → match count) of what `redactPii` actually removes: each
    * pattern is counted on the text AFTER the earlier patterns' redaction
    * (matching the sequential replace), so an overlapping span — a phone
    * number inside an email local part, say — is attributed to exactly
    * the pattern that consumes it, never double-reported.
    */
  def piiCounts(text: Column): Column = {
    val (pairs, _) = piiPatterns.foldLeft((Seq.empty[Column], text)) {
      case ((acc, cur), (n, p)) =>
        (acc ++ Seq(lit(n), regexp_count(cur, lit(p)).cast("long")),
          regexp_replace(cur, p, s"[$n]"))
    }
    map(pairs: _*)
  }

  /** SimHash over the distinct token set: for each of 60 bits, sum +1/-1
    * by that bit of each token hash; the fingerprint sets bits with a
    * positive sum. The token-hash array is built once per row (single
    * reference) and the 60-bit vote loop runs as a native expression —
    * an all-HOF formulation would re-evaluate the tokenize+md5 pipeline
    * once per bit (interpreted lambdas have no CSE).
    */
  def simhash(text: Column): Column =
    coalesce( // NULL text → 0, matching the oracle's coalesce(list_sum, 0)
      graft.functions.SimHash60(
        transform(array_distinct(tokens(text)), t => md5Hash60(t))),
      lit(0L))
}
