package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable.ArrayBuffer

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.etl.Clock
import graft.sources.ApiClient._

/** Drives the REAL `ApiClient.httpTransport` (HttpURLConnection) over
  * a loopback `com.sun.net.httpserver.HttpServer` — no egress — so
  * the live-socket half of S1 that ApiClientSpec stubs out is
  * exercised end-to-end: status/body plumbing, request-header
  * forwarding, error-stream reads on non-2xx, read-timeout →
  * SocketTimeoutException → the retry loop, and the full
  * `extract` path (fetch → archive → Spark read) against a served
  * JSON array. The reference's only unreachable half remains the
  * public internet endpoint itself.
  */
class ApiClientLoopbackSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val hits = new AtomicInteger(0)
  private val authSeen = ArrayBuffer.empty[String]

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", (ex: HttpExchange) => {
      hits.incrementAndGet()
      authSeen.synchronized {
        authSeen += Option(ex.getRequestHeaders.getFirst("Ocp-Apim-Subscription-Key")).orNull
      }
      respond(ex, 200, """[{"id":"d1","title":"T1"},{"id":"d2","title":"T2"}]""")
    })
    server.createContext("/unauthorized", (ex: HttpExchange) =>
      respond(ex, 401, """{"error":"bad key"}"""))
    server.createContext("/ratelimited", (ex: HttpExchange) =>
      respond(ex, 429, ""))
    server.createContext("/boom", (ex: HttpExchange) =>
      respond(ex, 500, """{"error":"internal"}"""))
    server.createContext("/slow", (ex: HttpExchange) => {
      hits.incrementAndGet()
      Thread.sleep(1000) // far beyond the test's 150 ms read timeout
      respond(ex, 200, "too late")
    })
    // concurrency 4: the /slow handler parks its thread past the
    // client timeout; retries must not queue behind the parked one
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("live 200: body returned, subscription header forwarded") {
    hits.set(0); authSeen.synchronized(authSeen.clear())
    val r = fetchWithRetry(s"$base/ok",
      headers = Map("Ocp-Apim-Subscription-Key" -> "k-123"))
    assert(r == Right("""[{"id":"d1","title":"T1"},{"id":"d2","title":"T2"}]"""))
    assert(hits.get() == 1)
    assert(authSeen.synchronized(authSeen.toSeq) == Seq("k-123"))
  }

  test("live 401/429/500 classify without retry, error body drained") {
    assert(fetchWithRetry(s"$base/unauthorized") == Left(Unauthorized))
    assert(fetchWithRetry(s"$base/ratelimited") == Left(RateLimited))
    assert(fetchWithRetry(s"$base/boom") == Left(HttpError(500)))
  }

  test("live read timeout: 3 socket-level attempts, 2s/4s schedule, TimedOut") {
    hits.set(0)
    val sleeps = ArrayBuffer.empty[Long]
    val r = fetchWithRetry(s"$base/slow", timeoutMs = 150,
      sleep = ms => sleeps += ms)
    assert(r == Left(TimedOut))
    assert(hits.get() == 3, s"expected 3 live attempts, saw ${hits.get()}")
    assert(sleeps.toSeq == Seq(2000L, 4000L))
  }

  test("live extract: fetch -> archive -> Spark read end-to-end") {
    val spark = SparkSpec.session
    val root = Files.createTempDirectory("graft-loopback-arch").toString
    val clock = Clock(java.time.Instant.parse("2026-08-14T09:00:00Z"))
    val df = ApiClient.extract(spark, s"$base/ok", root, clock = clock)
    assert(df.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("d1", "d2"))
    // the archive honors the reference's raw filename contract
    val archived = new java.io.File(root).list().toSeq
    assert(archived == Seq("disruptions_20260814_090000.json"))
  }
}
