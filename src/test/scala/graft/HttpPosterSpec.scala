package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sink.{EventBatchSink, HttpEventPoster}

/** Real-HTTP sink specs against a loopback server (SURVEY.md §5.4):
  * the [[HttpEventPoster]] drives scripted 200 / 429-then-200 / 400 /
  * timeout-then-200 sequences through [[EventBatchSink]]'s retry/DLQ
  * state machine, and the server asserts the wire shape the reference
  * sends (`M/main.py:320-322,350-368`): basic-auth secret, gzip NDJSON
  * body, gzip content-encoding header. */
class HttpPosterSpec extends AnyFunSuite {

  /** One scripted step: HTTP status to answer (body = `body`), or
    * `sleepMs > 0` to stall past the client timeout first. */
  private case class Step(status: Int, body: String = "ok", sleepMs: Long = 0)

  private case class Received(auth: String, encoding: String, ndjson: String)

  /** Serve `script` on a loopback port; run `f(endpoint, received)`. */
  private def withServer(script: Seq[Step])(
      f: (String, ConcurrentLinkedQueue[Received]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val received = new ConcurrentLinkedQueue[Received]()
    val steps = new java.util.concurrent.ConcurrentLinkedQueue[Step]()
    script.foreach(steps.add)
    server.createContext("/import", (ex: HttpExchange) => {
      val gz = ex.getRequestBody.readAllBytes()
      received.add(Received(
        Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""),
        Option(ex.getRequestHeaders.getFirst("Content-Encoding")).getOrElse(""),
        new String(EventBatchSink.gunzip(gz), UTF_8)))
      val step = Option(steps.poll()).getOrElse(Step(200))
      if (step.sleepMs > 0) Thread.sleep(step.sleepMs)
      val bytes = step.body.getBytes(UTF_8)
      ex.sendResponseHeaders(step.status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    // concurrent handler pool: a stalling (timeout-script) handler must
    // not serialize the client's retry behind it past its own timeout
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/import", received)
    finally server.stop(0)
  }

  private def sinkOver(poster: HttpEventPoster): EventBatchSink =
    new EventBatchSink(poster, batchSizeEvents = 2, sleeper = _ => ())

  test("posts gzip NDJSON with basic-auth secret and gzip encoding header") {
    withServer(Seq(Step(200))) { (url, received) =>
      val sink = sinkOver(new HttpEventPoster(url, "s3cret"))
      val dlq = new ArrayBuffer[Any]()
      dlq ++= sink.add("""{"event":"a"}""")
      dlq ++= sink.add("""{"event":"b"}""") // second add hits batch size
      assert(dlq.isEmpty)
      assert(sink.eventsSent == 2)
      val r = received.asScala.toSeq
      assert(r.size == 1)
      assert(r.head.ndjson == "{\"event\":\"a\"}\n{\"event\":\"b\"}")
      assert(r.head.encoding == "gzip")
      val expectedAuth = "Basic " + java.util.Base64.getEncoder
        .encodeToString("s3cret:".getBytes(UTF_8))
      assert(r.head.auth == expectedAuth)
    }
  }

  test("429 then 200: retried over real HTTP, delivered, no DLQ") {
    withServer(Seq(Step(429, "slow down"), Step(200))) { (url, received) =>
      val sink = sinkOver(new HttpEventPoster(url, "k"))
      val dlq = sink.add("""{"e":1}""") ++ sink.flush()
      assert(dlq.isEmpty)
      assert(sink.eventsSent == 1)
      assert(received.size == 2) // the retry re-posted the same batch
      val bodies = received.asScala.map(_.ndjson).toSet
      assert(bodies == Set("""{"e":1}"""))
    }
  }

  test("400: whole batch dead-lettered per event with the response body") {
    withServer(Seq(Step(400, "bad payload"))) { (url, _) =>
      val sink = sinkOver(new HttpEventPoster(url, "k"))
      val dlq = sink.add("""{"e":1}""") ++ sink.add("""{"e":2}""")
      assert(dlq.size == 2)
      assert(dlq.forall(_.reason == "client_error_400"))
      assert(dlq.forall(_.response == "bad payload"))
      assert(sink.eventsSent == 0)
    }
  }

  test("timeout then 200: client-side timeout is retryable, then delivers") {
    // first request stalls 3 s against a 1 s request timeout -> the
    // HttpClient throws, the sink counts it as retryable and re-posts
    withServer(Seq(Step(200, sleepMs = 3000), Step(200))) { (url, received) =>
      val sink = sinkOver(new HttpEventPoster(url, "k", timeoutSeconds = 1))
      val dlq = sink.add("""{"e":1}""") ++ sink.flush()
      assert(dlq.isEmpty)
      assert(sink.eventsSent == 1)
      assert(received.size == 2)
    }
  }

  test("launcher selects the HTTP transport when --mixpanel_api_url is set") {
    withServer(Seq(Step(200))) { (url, received) =>
      val a = Launcher.parseArgs(Seq(
        "--source_configs_gcs_uri", "file:///tmp/whatever.json",
        "--mixpanel_api_secret", "k2",
        "--mixpanel_api_url", url))
      val poster = Launcher.posterFactory(a)()
      assert(poster.isInstanceOf[HttpEventPoster])
      val r = poster.post(EventBatchSink.gzip("{\"x\":1}".getBytes(UTF_8)), 1)
      assert(r.status == 200)
      assert(received.asScala.head.ndjson == """{"x":1}""")
    }
  }
}
