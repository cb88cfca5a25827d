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
}
