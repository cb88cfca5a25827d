package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.operators.{HttpInference, HttpInferenceConfig, Inference}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

/** IT-style exercise of the HTTP inference adapter against an in-JVM
  * server (com.sun.net.httpserver — JDK-only): batching, ordering,
  * retry, timeout, and fallback.
  */
class HttpInferenceSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark

  private var server: HttpServer = _
  private val requests = new AtomicInteger(0)
  private val failuresToServe = new AtomicInteger(0)
  private val slowFirstRequests = new AtomicInteger(0)

  private def endpoint(path: String): String =
    s"http://127.0.0.1:${server.getAddress.getPort}$path"

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // echo-reverse: one JSON string per line in, reversed text per line out
    server.createContext("/reverse", (ex: HttpExchange) => {
      requests.incrementAndGet()
      if (failuresToServe.getAndUpdate(n => math.max(n - 1, 0)) > 0) {
        ex.sendResponseHeaders(500, -1); ex.close()
      } else {
        if (slowFirstRequests.getAndUpdate(n => math.max(n - 1, 0)) > 0)
          Thread.sleep(1000)
        val in = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val out = in.split("\n", -1).filter(_.nonEmpty)
          .map(l => "\"" + l.stripPrefix("\"").stripSuffix("\"").reverse + "\"")
          .mkString("\n")
        val bytes = out.getBytes(UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes); ex.close()
      }
    })
    // concurrent handler threads: a hung (sleeping) request must not block
    // the retry that follows it
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  test("mapBatches over HTTP: batching and per-row ordering preserved") {
    import spark.implicits._
    requests.set(0)
    val df = (1 to 10).map(i => s"row$i").toDF("text").repartition(2)
    val cfg = HttpInferenceConfig(endpoint("/reverse"))
    val out = Inference.mapBatches(df, "text", "pred", batchSize = 3)(
        HttpInference.model(cfg))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.length == 10)
    assert(out.forall { case (t, p) => p == t.reverse }) // order kept per row
    // 10 rows over 2 partitions in batches of 3 → 4 HTTP calls (3+2 per side)
    assert(requests.get() == 4)
  }

  test("transient 500s are retried with backoff until success") {
    failuresToServe.set(2)
    val cfg = HttpInferenceConfig(endpoint("/reverse"), maxRetries = 3,
      retryBackoffMillis = 10)
    assert(HttpInference.invoke(cfg, Seq("abc", "xy")) == Seq("cba", "yx"))
  }

  test("a hung endpoint times out and the retry succeeds") {
    slowFirstRequests.set(1)
    val cfg = HttpInferenceConfig(endpoint("/reverse"), timeoutMillis = 200,
      maxRetries = 1, retryBackoffMillis = 10)
    assert(HttpInference.invoke(cfg, Seq("slow")) == Seq("wols"))
  }

  test("exhausted retries: fallback substitutes, no-fallback throws") {
    val dead = HttpInferenceConfig(s"http://127.0.0.1:1/nope",
      timeoutMillis = 200, maxRetries = 1, retryBackoffMillis = 10)
    val withFb = dead.copy(fallback = Some("<err>"))
    assert(HttpInference.invoke(withFb, Seq("a", "b", "c")) ==
      Seq("<err>", "<err>", "<err>"))
    val ex = intercept[RuntimeException] {
      HttpInference.invoke(dead, Seq("a"))
    }
    assert(ex.getMessage.contains("after 2 attempts"))
  }

  test("wire encoding roundtrips control characters and quotes") {
    val nasty = "line1\nline2\t\"quoted\" back\\slash"
    assert(HttpInference.decode(HttpInference.encode(nasty)) == nasty)
  }

  test("decode is lenient on malformed \\u escapes (no throw, passthrough)") {
    assert(HttpInference.decode("\"a\\uZZZZb\"") == "auZZZZb")
    assert(HttpInference.decode("\"a\\u12\"") == "au12")
    assert(HttpInference.decode("\"a\\u0041b\"") == "aAb")
  }
}
