package graft.sink

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import java.util.Base64

/** Production HTTP transport for the event sink — the reference's
  * `requests.post` to the import endpoint (`M/main.py:320-322,350-368`):
  * basic-auth with the API secret as username (`M/main.py:21,367`),
  * 90 s timeout (`M/main.py:322`), gzip NDJSON body with the matching
  * `Content-Encoding` header (`M/main.py:352-354`).
  *
  * One instance per partition (constructed by the poster factory inside
  * `mapPartitions`), one shared `HttpClient` per executor JVM — the
  * client is heavyweight (connection pool, selector thread), so it
  * lives in a JVM-wide lazy holder rather than per-task state. Failure
  * semantics match [[EventBatchSink]]'s contract: any thrown exception
  * (connect/read timeout, refused) is treated as retryable by the
  * caller; HTTP status classification (200 / 429+5xx retry / 4xx DLQ)
  * is the sink's job, not the transport's.
  */
final class HttpEventPoster(
    endpoint: String,
    apiSecret: String,
    timeoutSeconds: Long = HttpEventPoster.DefaultTimeoutSeconds)
  extends EventPoster {

  // Basic auth, secret as username with empty password — requests'
  // `auth=(api_secret, '')` (`M/main.py:367`)
  private val authHeader = "Basic " + Base64.getEncoder
    .encodeToString(s"$apiSecret:".getBytes(UTF_8))

  override def post(gzippedNdjson: Array[Byte], nEvents: Int): PostResult = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .header("Authorization", authHeader)
      .header("Content-Type", "application/x-ndjson")
      .header("Content-Encoding", "gzip")
      .header("Accept", "application/json")
      .POST(HttpRequest.BodyPublishers.ofByteArray(gzippedNdjson))
      .build()
    val resp = HttpEventPoster.client(timeoutSeconds)
      .send(req, HttpResponse.BodyHandlers.ofString())
    PostResult(resp.statusCode(), resp.body())
  }
}

object HttpEventPoster {
  /** `requests.post(..., timeout=90)` (`M/main.py:322`). */
  val DefaultTimeoutSeconds = 90L

  // JVM-wide client: java.net.http.HttpClient is thread-safe and owns
  // a connection pool; one per executor amortizes TLS handshakes
  // across every partition's posts.
  @volatile private var cached: HttpClient = _
  private def client(connectTimeoutSeconds: Long): HttpClient = {
    if (cached == null) synchronized {
      if (cached == null)
        cached = HttpClient.newBuilder()
          .connectTimeout(Duration.ofSeconds(connectTimeoutSeconds))
          .build()
    }
    cached
  }
}
