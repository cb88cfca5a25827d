package graft

import graft.queries.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "spark join filter join scan"), // both terms, join tf=2
    (2L, "join only here"),              // missing filter
    (3L, "filter filter filter"),        // missing join
    (4L, "filter then join"),            // both terms once each
    (5L, "nothing relevant at all")
  ).toDF("id", "text")

  test("conjunctive search requires ALL terms and scores by summed tf") {
    val hits = Retrieval.conjunctiveSearch(docs, "id", col("text"),
        Seq("join", "filter"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits == Map(1L -> 3L, 4L -> 2L)) // doc1: join 2 + filter 1
  }

  test("single-term search degenerates to a tf lookup") {
    val hits = Retrieval.conjunctiveSearch(docs, "id", col("text"), Seq("filter"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits == Map(1L -> 1L, 3L -> 3L, 4L -> 1L))
  }

  test("contamination flags train docs sharing an n-gram with test docs") {
    // 3-grams for a compact fixture; the declared query uses n=13.
    val corpus = Seq(
      (10L, "train", "alpha beta gamma delta"),  // shares "beta gamma delta"
      (11L, "train", "unrelated words entirely here"),
      (12L, "train", "alpha beta gamma delta"),  // same leak as 10
      (20L, "test", "zzz beta gamma delta qqq")
    ).toDF("id", "split", "text")
    val grams = corpus.select(col("id"), col("split"),
        explode(operators.TextAnalysis.shingles(col("text"), 3)).as("g"))
    val hits = Retrieval.contaminated(grams,
        trainPred = col("split") === "train", testPred = col("split") === "test",
        idCol = "id", gramCol = "g")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits == Map(10L -> 1L, 12L -> 1L))
  }

  test("docs shorter than n produce no grams and can never be flagged") {
    val corpus = Seq((1L, "train", "too short"), (2L, "test", "too short"))
      .toDF("id", "split", "text")
    val grams = corpus.select(col("id"), col("split"),
        explode(operators.TextAnalysis.shingles(col("text"), 3)).as("g"))
    assert(Retrieval.contaminated(grams,
      col("split") === "train", col("split") === "test", "id", "g").count() == 0)
  }

  test("bigram LM score: hand-computed conditional ppm means") {
    // corpus: c(a,b)=3 c(b,a)=1 c(b,c)=1; contexts c(a.)=3 c(b.)=2
    // doc 1 "a b a b": ppm [1e6, 5e5, 1e6] -> mean 833333; doc 2 "a b c":
    // ppm [1e6, 5e5] -> 750000; doc 3 single-token -> no bigrams, no row
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val scored = Retrieval.bigramLmScore(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(scored == Map(1L -> (3L, 833333L), 2L -> (2L, 750000L)))
  }

  test("repeated spans: a planted shared run comes out maximal, once") {
    // doc 1 tokens 3..9 == doc 2 tokens 1..7 (seven shared tokens);
    // k=3, minSpan=5 -> exactly one span of length 7 on one diagonal
    val shared = "v w x y z q r"
    val docs = Seq(
      (1L, s"a b $shared"),
      (2L, s"$shared c d e")
    ).toDF("id", "text")
    val got = Retrieval.repeatedSpans(docs, "id", col("text"),
      k = 3, minSpan = 5, maxDocFreq = 50).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == (1L, 2L, 3L, 1L, 7L))
  }

  test("repeated spans: two separate runs stay two spans (gap breaks the island)") {
    val docs = Seq(
      (1L, "p q r s GAP1 t u v w"),
      (2L, "p q r s GAP2 t u v w")
    ).toDF("id", "text")
    val got = Retrieval.repeatedSpans(docs, "id", col("text"),
        k = 3, minSpan = 2, maxDocFreq = 50)
      .orderBy(col("start_a")).collect()
    // tokens 1-4 and 6-9 match; the differing middle token breaks every
    // 3-gram that crosses it, so two spans of 4 tokens each
    assert(got.map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      == Seq((1L, 1L, 4L), (6L, 6L, 4L)))
  }

  test("dup-gram ppm: exact copies saturate at 1e6, unique docs sit at 0") {
    // docs 1/2 identical (every gram df>=2 -> ppm 1,000,000); doc 3 disjoint
    // vocabulary (ppm 0); doc 4 too short for an 8-gram -> no row
    val ident = "a b c d e f g h i j"
    val docs = Seq(
      (1L, ident), (2L, ident),
      (3L, "q r s t u v w x y z"),
      (4L, "too short")
    ).toDF("doc_id", "text")
    val got = Retrieval.dupGramPpmScore(docs, "doc_id", col("text"), n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 0L))
  }

  test("vocab growth: tokens count once at first occurrence, buckets accumulate") {
    // vocab {a,b} enters in bucket 0, {c} in bucket 1 (doc 150), {d} in
    // bucket 2 (doc 250); re-occurrences (doc 299) add nothing
    val docs = Seq(
      (0L, "a b a"), (99L, "b a"),
      (150L, "c a"), (250L, "d c b"), (299L, "a b c d")
    ).toDF("doc_id", "text")
    val got = Retrieval.vocabGrowth(docs, "doc_id", col("text"), n = 1,
        bucketDocs = 100)
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 2L, 2L), (1L, 1L, 3L), (2L, 1L, 4L)))
  }

  test("vocab growth at n=2: bigram types drive the curve; short docs drop") {
    // doc 0 has types {a b, b a}; doc 10 re-uses "a b" but adds "b c";
    // doc 25 is too short for a bigram and contributes nothing
    val docs = Seq((0L, "a b a"), (10L, "a b c"), (25L, "z"))
      .toDF("doc_id", "text")
    val got = Retrieval.vocabGrowth(docs, "doc_id", col("text"), n = 2,
        bucketDocs = 10)
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 2L, 2L), (1L, 1L, 3L)))
  }

  test("q_vocab_growth over the shared shingle-set relation equals the " +
    "direct tokenize+shingle form (r20 derivation-reuse pin)") {
    // the declared query consumes Analysis.shingleSets (per-doc distinct
    // hashed 3-gram shingles); this pins that the curve is IDENTICAL to
    // the generic single-pass form over the same corpus snapshot
    val d = TestSpark.sf0001
    val got = Retrieval.vocabGrowthQ(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = Retrieval.vocabGrowth(
        graft.Tables.documents(spark, d), "doc_id", col("text"),
        n = 3, bucketDocs = 20)
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == direct)
    assert(got.nonEmpty && got.last._3 == got.map(_._2).sum)
  }

  test("repeated spans match a brute-force reference on a randomized corpus") {
    // tiny alphabet -> dense natural overlaps; df cap disabled so the
    // reference needs no frequency model
    val rnd = new scala.util.Random(42)
    val alphabet = Array("a", "b", "c", "d", "e")
    val (k, minSpan) = (3, 4)
    val docsSeq: Seq[(Long, Array[String])] = (1L to 10L).map { id =>
      id -> Array.fill(10 + rnd.nextInt(31))(alphabet(rnd.nextInt(alphabet.length)))
    }
    def brute: Set[(Long, Long, Long, Long, Long)] = {
      val grams = docsSeq.map { case (id, tk) =>
        id -> tk.sliding(k).map(_.mkString(" ")).toArray
      }.toMap
      val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long, Long)]
      for ((ia, ga) <- grams; (ib, gb) <- grams if ia < ib) {
        for (d <- (1 - gb.length) to (ga.length - 1)) {
          val paMin = math.max(1, 1 + d)
          val paMax = math.min(ga.length, gb.length + d)
          var run = 0; var startA = 0; var pa = paMin
          while (pa <= paMax + 1) {
            val hit = pa <= paMax && ga(pa - 1) == gb(pa - d - 1)
            if (hit) { if (run == 0) startA = pa; run += 1 }
            else {
              if (run > 0 && run + k - 1 >= minSpan)
                out += ((ia, ib, startA.toLong, (startA - d).toLong, (run + k - 1).toLong))
              run = 0
            }
            pa += 1
          }
        }
      }
      out.toSet
    }
    val docs = docsSeq.map { case (id, tk) => (id, tk.mkString(" ")) }.toDF("id", "text")
    val got = Retrieval.repeatedSpans(docs, "id", col("text"),
        k = k, minSpan = minSpan, maxDocFreq = 1000)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == brute)
    assert(got.nonEmpty, "fixture should generate at least one span")
  }

  test("bigram LM matches a brute-force reference on a randomized corpus") {
    val rnd = new scala.util.Random(7)
    val alphabet = Array("x", "y", "z", "w")
    val docsSeq: Seq[(Long, Array[String])] = (1L to 12L).map { id =>
      id -> Array.fill(2 + rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.length)))
    }
    val allBigrams = docsSeq.flatMap { case (_, tk) => tk.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))) }
    val cxy = allBigrams.groupBy(identity).map { case (kv, xs) => kv -> xs.size.toLong }
    val cx = allBigrams.groupBy(_._1).map { case (w, xs) => w -> xs.size.toLong }
    val expected = docsSeq.flatMap { case (id, tk) =>
      val bgs = tk.sliding(2).filter(_.length == 2).map(a => (a(0), a(1))).toSeq
      if (bgs.isEmpty) None
      else {
        val ppms = bgs.map { b => cxy(b) * 1000000L / cx(b._1) }
        Some(id -> (bgs.size.toLong, ppms.sum / bgs.size))
      }
    }.toMap
    val docs = docsSeq.map { case (id, tk) => (id, tk.mkString(" ")) }.toDF("id", "text")
    val got = Retrieval.bigramLmScore(docs, "id", col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("repeated spans: stop-gram cap drops grams above the doc-frequency limit") {
    // the same 5-token run in four docs; maxDocFreq=3 kills every gram
    val docs = (1L to 4L).map(i => (i, "m n o p q")).toDF("id", "text")
    assert(Retrieval.repeatedSpans(docs, "id", col("text"),
      k = 3, minSpan = 3, maxDocFreq = 3).count() == 0)
    // at maxDocFreq=4 all six pairs surface with the full span
    val kept = Retrieval.repeatedSpans(docs, "id", col("text"),
      k = 3, minSpan = 3, maxDocFreq = 4)
    assert(kept.count() == 6)
    assert(kept.select(col("span_len")).distinct().collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("source drift: a lone source IS the corpus distribution — drift exactly 0") {
    val docs = Seq((1L, "a b c a", "web"), (2L, "c d", "web"))
      .toDF("doc_id", "text", "source")
    val got = Retrieval.sourceDriftOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ppm_s = ppm_c word for word (same counts, same total), and the
    // absent-word tail is empty — the L1 distance is identically zero
    assert(got.toSeq == Seq(("web", 6L, 0L)))
  }

  test("source drift: disjoint half-mass vocabularies land exactly at 1M ppm") {
    // the comparison is source-vs-MIXTURE: a source carrying fraction f of
    // corpus mass with nothing shared scores 2(1-f) ppm-millions, so two
    // disjoint halves (f = 1/2) sit exactly at 1M — the 2M ceiling is only
    // approached as a source's share of the corpus vanishes.
    // Here: 4 present words |250000-125000| = 500k, absent tail
    // T - 4*125000 = 500k → exactly 1,000,000, no integer-division dust.
    val docs = Seq((1L, "a b c d", "crawl"), (2L, "w x y z", "books"))
      .toDF("doc_id", "text", "source")
    val got = Retrieval.sourceDriftOf(docs)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("crawl" -> 1_000_000L, "books" -> 1_000_000L))
  }

  test("source drift: a vanishing-share alien source approaches the 2M ceiling") {
    // one 2-token alien source inside a 128-token corpus: f = 2/130, so
    // L1 ≈ 2(1-f) ≈ 1.97M — the small-source regime a drift monitor
    // actually fires on (a weird new crawl showing up in a huge corpus)
    val bulk = (1L to 32L).map(i => (i, "a b c d", "web"))
    val alien = Seq((100L, "zz qq", "alien"))
    val got = Retrieval.sourceDriftOf((bulk ++ alien).toDF("doc_id", "text", "source"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got("alien") > 1_900_000L && got("alien") <= 2_000_000L,
      s"expected near-ceiling drift for the alien source, got ${got("alien")}")
    assert(got("web") < 100_000L, s"bulk source should barely drift, got ${got("web")}")
  }

  test("source drift: l1_ppm bounded by [0, 2M] on the real corpus") {
    val rows = Retrieval.sourceDrift(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, l1) =>
      assert(n > 0, s"$src has no tokens")
      assert(l1 >= 0L && l1 <= 2_000_000L, s"$src l1_ppm=$l1 out of bounds")
    }
  }

  test("BM25: hand-computed rational scores; rare term outranks saturated tf") {
    // N=4, Σdl=16, avgdl=4 so dl/avgdl=1 everywhere.
    // df(dup)=2 -> idf_milli = 5000 div 5 = 1000
    // df(x)=1   -> idf_milli = 7000 div 3 = 2333
    // denom = 160·tf + 192:
    //   d1 tf(dup)=1: 1000·22·16 div 352  = 1000
    //   d4 tf(dup)=4: 1000·22·64 div 832  = 1692  (saturated: < 4×1000)
    //   d2 tf(x)=1:   2333·22·16 div 352  = 2333  (rare term dominates)
    val docs = Seq(
      (1L, "dup a a a"), (2L, "x a a a"), (3L, "a a a a"),
      (4L, "dup dup dup dup")
    ).toDF("id", "text")
    val got = Retrieval.bm25TopK(docs, "id", col("text"), Seq("dup", "x"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 1L, 2333L), (4L, 1L, 1692L), (1L, 1L, 1000L)),
      s"got ${got.toSeq}")
  }

  test("BM25: length normalization — same tf, longer doc scores lower") {
    // N=2, Σdl=8, df(dup)=2 -> idf_milli=200; numer = 200·22·8 = 35200
    // d1 dl=2: denom 140 -> 251;  d2 dl=6: denom 212 -> 166
    val docs = Seq((1L, "dup a"), (2L, "dup a a a a a")).toDF("id", "text")
    val got = Retrieval.bm25TopK(docs, "id", col("text"), Seq("dup"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 251L), (2L, 166L)), s"got ${got.toSeq}")
  }

  /** BigInt mirror of the per-term rational BM25 — the no-overflow truth
    * the widened engine path must reproduce exactly.
    */
  private def bm25Ref(rows: Seq[(String, Long, Long, Long, Long)],
      nDocs: Long, sumDl: Long): Map[Long, Long] =
    rows.groupBy(_._2).map { case (id, terms) =>
      id -> terms.map { case (_, _, tf, dl, df) =>
        val idf = (BigInt(2) * (nDocs - df) + 1) * 1000 / (BigInt(2) * df + 1)
        val num = idf * 22 * tf * sumDl
        val den = BigInt(10) * tf * sumDl + BigInt(3) * sumDl +
          BigInt(9) * dl * nDocs
        (num / den).toLong
      }.sum
    }

  test("BM25: a corpus past the BIGINT envelope auto-widens to DECIMAL " +
    "and matches the BigInt reference (no wrap)") {
    // forged corpus scalars: N=1e9 docs, Σdl=1e12 tokens, max dl=1e6 —
    // worst-case numerator ~1.5e28 » 2^63, so bm25Rank must pick the
    // DECIMAL(38,0) path on its own
    val (nDocs, sumDl, maxDl) = (1_000_000_000L, 1_000_000_000_000L, 1_000_000L)
    val rows = Seq( // (w, id, tf, dl, df)
      ("rare", 1L, 3L, 1_000L, 5L),
      ("rare", 2L, 1L, 500L, 5L),
      ("common", 1L, 900_000L, 1_000_000L, 400_000_000L),
      ("common", 3L, 2L, 200L, 400_000_000L))
    // the BIGINT numerator genuinely wraps for every rare-term row —
    // the fixture really sits past the bound
    val idfRare = (BigInt(2) * (nDocs - 5) + 1) * 1000 / 11
    assert(idfRare * 22 * 1L * sumDl > BigInt(Long.MaxValue),
      "fixture not past the BIGINT envelope")
    val joined = rows.toDF("w", "id", "tf", "dl", "df")
    val got = Retrieval.bm25Rank(joined, "id", nDocs, sumDl, maxDl, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expect = bm25Ref(rows, nDocs, sumDl)
    assert(got == expect, s"widened scores $got != BigInt reference $expect")
  }

  test("BM25: forced-wide arithmetic is value-identical to the narrow path") {
    // small in-range fixture: both paths must produce the same bytes, so
    // widening can never perturb a ranking that didn't need it
    val rows = Seq(
      ("dup", 1L, 1L, 4L, 2L), ("dup", 4L, 4L, 4L, 2L), ("x", 2L, 1L, 4L, 1L))
    val joined = rows.toDF("w", "id", "tf", "dl", "df")
    def run(forceWide: Boolean) =
      Retrieval.bm25Rank(joined, "id", nDocs = 4L, sumDl = 16L, maxDl = 4L,
          k = 10, forceWide = forceWide)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(run(forceWide = true) == run(forceWide = false))
    assert(run(forceWide = false) ==
      Seq((2L, 1L, 2333L), (4L, 1L, 1692L), (1L, 1L, 1000L)))
  }
}
