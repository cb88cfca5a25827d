package graft.operators

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** Configuration for the HTTP batch-inference adapter. Serializable —
  * ships inside the task closure; the HTTP client itself never does.
  *
  *  - `endpoint`: POST target; the request body is one JSON string
  *    literal per input, newline-separated (newline-safe for arbitrary
  *    document text); the response must be one JSON string literal per
  *    output, same count, same order.
  *  - `timeoutMillis`: per-request deadline.
  *  - `maxRetries`: additional attempts after the first, with doubling
  *    backoff starting at `retryBackoffMillis`.
  *  - `fallback`: when every attempt fails — `Some(v)` substitutes `v`
  *    for every input in the batch (degrade-and-continue, the shape a
  *    100 TB job needs so one dead replica doesn't kill a stage);
  *    `None` rethrows and fails the task (let Spark's task retry take
  *    over).
  */
final case class HttpInferenceConfig(
    endpoint: String,
    timeoutMillis: Long = 10000L,
    maxRetries: Int = 2,
    retryBackoffMillis: Long = 100L,
    fallback: Option[String] = None)

/** Concrete executor-side implementation of Inference.mapBatches'
  * `Seq[String] => Seq[String]` model contract over HTTP — the
  * reference's in-process model call (`rag_model.py:15,81`) re-expressed
  * as a remote batched endpoint with timeout, bounded retry, and
  * fallback. One `HttpClient` per executor JVM (lazy module field, the
  * reference's module-level singleton distributed); config travels in
  * the closure.
  */
object HttpInference {

  private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(5)).build()

  /** The model function to pass to `Inference.mapBatches`. */
  def model(cfg: HttpInferenceConfig): Seq[String] => Seq[String] =
    inputs => invoke(cfg, inputs)

  private[graft] def invoke(cfg: HttpInferenceConfig, inputs: Seq[String]): Seq[String] = {
    if (inputs.isEmpty) return Seq.empty
    val body = inputs.map(encode).mkString("\n")
    var attempt = 0
    var result: Option[Seq[String]] = None
    var lastErr: Throwable = null
    while (result.isEmpty && attempt <= cfg.maxRetries) {
      if (attempt > 0)
        Thread.sleep(cfg.retryBackoffMillis << math.min(attempt - 1, 16))
      try {
        val req = HttpRequest.newBuilder(URI.create(cfg.endpoint))
          .timeout(Duration.ofMillis(cfg.timeoutMillis))
          .header("Content-Type", "application/x-ndjson")
          .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
          .build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
        if (resp.statusCode() != 200)
          throw new java.io.IOException(s"inference endpoint returned ${resp.statusCode()}")
        val outs = resp.body().split("\n", -1).toSeq.filter(_.nonEmpty).map(decode)
        if (outs.size != inputs.size)
          throw new java.io.IOException(
            s"inference endpoint returned ${outs.size} outputs for ${inputs.size} inputs")
        result = Some(outs)
      } catch {
        case e: InterruptedException => throw e
        case e: Throwable => lastErr = e
      }
      attempt += 1
    }
    result.getOrElse(cfg.fallback match {
      case Some(f) => Seq.fill(inputs.size)(f)
      case None => throw new RuntimeException(
        s"inference failed after ${cfg.maxRetries + 1} attempts: ${lastErr.getMessage}",
        lastErr)
    })
  }

  /** JSON string literal of `s` (the wire format of one batch line). */
  private[graft] def encode(s: String): String = graft.Jsons.escape(s)

  /** Inverse of `encode` (lenient: unknown escapes pass through). */
  private[graft] def decode(line: String): String = {
    val s =
      if (line.length >= 2 && line.head == '"' && line.last == '"')
        line.substring(1, line.length - 1)
      else line
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' if i + 6 <= s.length &&
              s.substring(i + 2, i + 6).forall(c => Character.digit(c, 16) >= 0) =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }
}
