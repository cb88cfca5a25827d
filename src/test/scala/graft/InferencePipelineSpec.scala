package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.operators.{HttpInference, HttpInferenceConfig, Inference, Pipelines}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** End-to-end composition of the full reference scoring pipeline
  * (`rag_model.py:69-97` + `app.py:94`): pages → order-preserving concat
  * (C1) → section chunker (C2) → prompt assembly (C11) → batched HTTP
  * scorer (C12, a real in-JVM server) → all-or-nothing score parse (C13)
  * → per-doc mean (C10). The oracled queries pin each stage; this spec
  * proves the non-oracle LLM edge composes with them: the scorer is a
  * deterministic stand-in (score = section-name length) so the whole
  * chain has a closed-form expected result.
  */
class InferencePipelineSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  private var server: HttpServer = _

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // Deterministic "LLM": reads each encoded prompt line, pulls the
    // "- <section>" names list assembled by C11, and replies with a
    // SCORES block assigning each section its name length. A prompt
    // containing the literal token BREAK gets a malformed (non-integer)
    // value line — exercising the reference's all-or-nothing parse.
    server.createContext("/score", (ex: HttpExchange) => {
      val in = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val out = in.split("\n", -1).filter(_.nonEmpty).map { line =>
        val prompt = HttpInference.decode(line)
        val names = "(?m)^- (\\S+)$".r.findAllMatchIn(prompt)
          .map(_.group(1)).toSeq
        val bad = prompt.contains("BREAK")
        val scores = names.map { n =>
          s"$n: ${if (bad) "not-a-number" else n.length.toString}"
        }
        HttpInference.encode("SCORES:\n" + scores.mkString("\n"))
      }.mkString("\n")
      val bytes = out.getBytes(UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes); ex.close()
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def scorer: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = {
    val cfg = HttpInferenceConfig(
      s"http://127.0.0.1:${server.getAddress.getPort}/score")
    prompts => Inference.mapBatches(prompts, "prompt", "response",
      batchSize = 2)(HttpInference.model(cfg))
  }

  test("pages → chunk → prompt → HTTP scorer → parse → mean, end to end") {
    import spark.implicits._
    // page_no deliberately out of storage order: concat must sort
    val pages = Seq(
      (1L, 2, "Skills:\nScala, Spark"),
      (1L, 1, "Summary:\nBuilds engines."),
      (2L, 1, "Education:\nBSc"),
      (2L, 2, "Experience:\nFive years")
    ).toDF("doc_id", "page_no", "text").repartition(3)
    val got = Pipelines.matchSingle(pages, "A JD about Spark.", scorer)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // doc 1: summary(7), skills(6) → 6.5; doc 2: education(9), experience(10) → 9.5
    assert(got == Map(1L -> 6.5, 2L -> 9.5))
  }

  test("a malformed scorer response voids that doc's scores only") {
    import spark.implicits._
    val pages = Seq(
      (1L, 1, "Summary:\nFine doc."),
      (2L, 1, "Summary:\nBREAK this one.")
    ).toDF("doc_id", "page_no", "text")
    val got = Pipelines.matchSingle(pages, "JD.", scorer)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // doc 2's response has a non-integer value → all-or-nothing empty
    // parse → no final-score row (reference raises per request instead)
    assert(got == Map(1L -> 7.0))
  }
}
