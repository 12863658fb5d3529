package graft.sources.jaeger

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Transport abstraction for the Jaeger HTTP API (reference `get_traces`
  * HTTP layer, `/root/reference/traceframe/traceframe.py:26-50,87-88`).
  * Injectable so the DSv2 source is testable offline: readers instantiate
  * the client by class name on executors (`client` read option), and tests
  * supply a fixture-backed implementation. Implementations need a no-arg or
  * (endpoint: String) constructor. */
trait JaegerClient extends Serializable {
  /** GET `path` with query params against the Jaeger endpoint; returns the
    * raw response body. */
  def get(path: String, params: Map[String, String]): String
}

/** Production client over java.net.http. Timeouts mirror the reference:
  * 45 s for /api/services, 30 s for /api/traces (`traceframe.py:33,88`). */
class HttpJaegerClient(endpoint: String) extends JaegerClient {
  @transient private lazy val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  // GETs are idempotent — transient failures (429/5xx, connect-phase
  // I/O) retry with deterministic backoff (graft.sources.HttpRetry)
  override def get(path: String, params: Map[String, String]): String = {
    val q = params.map { case (k, v) =>
      s"${URLEncoder.encode(k, StandardCharsets.UTF_8)}=" +
        URLEncoder.encode(v, StandardCharsets.UTF_8)
    }.mkString("&")
    val url = s"$endpoint$path" + (if (q.isEmpty) "" else s"?$q")
    val timeout =
      if (path.endsWith("/services")) Duration.ofSeconds(45)
      else Duration.ofSeconds(30)
    val req = HttpRequest.newBuilder(URI.create(url)).timeout(timeout).build()
    graft.sources.HttpRetry.withRetries() {
      val t0 = System.nanoTime()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      val elapsed = (System.nanoTime() - t0) / 1e9
      // reference logs calls slower than 1 s (`traceframe.py:34-36`)
      if (elapsed > 1.0)
        System.err.println(f"[jaeger] slow call ($elapsed%.1f s): $url")
      if (resp.statusCode() != 200)
        throw new graft.sources.HttpStatusException(resp.statusCode(),
          s"Jaeger API ${resp.statusCode()} for $url: ${resp.body().take(200)}")
      resp.body()
    }
  }
}

object JaegerClient {
  /** Instantiate a client implementation on an executor. */
  def forName(className: String, endpoint: String): JaegerClient = {
    val cls = Class.forName(className)
    val ctor = cls.getConstructors.minBy(_.getParameterCount)
    (ctor.getParameterCount match {
      case 0 => ctor.newInstance()
      case 1 => ctor.newInstance(endpoint)
      case n => throw new IllegalArgumentException(
        s"$className constructor takes $n args; need 0 or 1 (endpoint)")
    }).asInstanceOf[JaegerClient]
  }
}
