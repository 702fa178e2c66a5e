package graft.sources

import java.io.{InputStream, IOException}
import java.net.{HttpURLConnection, SocketTimeoutException, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.Clock

/** S1: the ingestion front door — fetch a disruption snapshot over
  * HTTP with timeout, bounded retry, exponential backoff, and
  * status-code classification, then archive it exactly like the S2/S4
  * file paths so the rest of the pipeline is source-agnostic.
  *
  * Mirrors `/root/reference/src/ingestion/api_client.py:52-88`:
  * 10 s timeout, 3 attempts, 2/4/8 s backoff on TIMEOUT only; HTTP
  * errors never retry (401 = bad key, 429 = rate limited — retrying
  * those is useless or hostile), unexpected errors never retry. The
  * network call itself is a pluggable [[Transport]] so the retry /
  * backoff / classification core — the part with actual logic — is
  * fully testable offline against a scripted stub (ApiClientSpec),
  * and the default transport works for `http(s)://` and `file://`
  * URLs via HttpURLConnection/URI streams.
  *
  * This is DRIVER-side code by design: one fetch per batch, the
  * payload is one JSON document (the reference's is ~125 records/
  * day), and the archive write is what Spark parallelizes afterwards.
  */
object ApiClient {

  /** Minimal transport result: status code + body text. */
  final case class Response(status: Int, body: String)

  /** (url, headers, timeoutMs) → Response; throws
    * [[SocketTimeoutException]] on timeout, [[IOException]] on
    * transport failure.
    */
  type Transport = (String, Map[String, String], Int) => Response

  sealed trait FetchError
  /** All `maxRetries` attempts timed out. */
  case object TimedOut extends FetchError
  /** 401 — invalid/missing API key; never retried. */
  case object Unauthorized extends FetchError
  /** 429 — rate limited; never retried (back off across BATCHES). */
  case object RateLimited extends FetchError
  /** Any other non-2xx status; never retried. */
  final case class HttpError(status: Int) extends FetchError
  /** Non-timeout transport/parse failure; never retried. */
  final case class Unexpected(message: String) extends FetchError

  /** Fetch with the reference's retry contract: up to `maxRetries`
    * attempts, sleeping 2^attempt seconds after attempt 1..n-1 on
    * timeout; one attempt only for HTTP and unexpected errors.
    * `sleep` is injectable so specs assert the schedule without
    * waiting 6 real seconds.
    */
  def fetchWithRetry(
      url: String,
      headers: Map[String, String] = Map.empty,
      timeoutMs: Int = 10000,
      maxRetries: Int = 3,
      transport: Transport = httpTransport,
      sleep: Long => Unit = Thread.sleep): Either[FetchError, String] = {
    require(maxRetries >= 1)
    var attempt = 1
    while (attempt <= maxRetries) {
      try {
        val r = transport(url, headers, timeoutMs)
        if (r.status / 100 == 2) return Right(r.body)
        return r.status match {
          case 401 => Left(Unauthorized)
          case 429 => Left(RateLimited)
          case s   => Left(HttpError(s))
        }
      } catch {
        case _: SocketTimeoutException =>
          if (attempt < maxRetries) sleep((1L << attempt) * 1000L) // 2s, 4s, 8s
          else return Left(TimedOut)
        // NonFatal only: an OOM/interrupt must propagate, not be
        // misreported as an API fetch error
        case scala.util.control.NonFatal(e) =>
          return Left(Unexpected(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
      attempt += 1
    }
    Left(TimedOut) // unreachable; the loop always returns
  }

  /** Default transport: HttpURLConnection for http(s), raw URI stream
    * for file:// (the offline test/dev path).
    */
  val httpTransport: Transport = (url, headers, timeoutMs) => {
    val u = new URI(url).toURL
    u.openConnection() match {
      case c: HttpURLConnection =>
        c.setConnectTimeout(timeoutMs)
        c.setReadTimeout(timeoutMs)
        headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
        try {
          val status = c.getResponseCode
          val in = if (status / 100 == 2) c.getInputStream else c.getErrorStream
          Response(status, readAll(in))
        } finally c.disconnect()
      case other =>
        other.setConnectTimeout(timeoutMs)
        other.setReadTimeout(timeoutMs)
        Response(200, readAll(other.getInputStream))
    }
  }

  private def readAll(in: InputStream): String =
    if (in == null) ""
    else try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()

  /** Fetch a raw JSON-array snapshot and archive it the S2/S3 way:
    * `<archiveRoot>/disruptions_<yyyyMMdd_HHmmss>.json` (the
    * reference's `data/raw` filename contract,
    * `api_client.py:103-116`). Returns the written path, or the
    * fetch error. The file is then readable by
    * [[RawSource.readRawJsonArray]], so `Main` can run extract →
    * transform → load off a live endpoint with zero special-casing.
    */
  def fetchToArchive(
      url: String,
      archiveRoot: String,
      headers: Map[String, String] = Map.empty,
      clock: Clock = Clock.system,
      transport: Transport = httpTransport,
      sleep: Long => Unit = Thread.sleep): Either[FetchError, String] =
    fetchWithRetry(url, headers, transport = transport, sleep = sleep)
      .map { body =>
        val ts = DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss")
          .format(clock.now.atZone(java.time.ZoneOffset.UTC))
        val dir = Paths.get(archiveRoot)
        Files.createDirectories(dir)
        // the timestamp has 1-second resolution, so two fetches in
        // the same second would otherwise SILENTLY clobber the
        // earlier snapshot: CREATE_NEW makes a collision loud, and
        // the `_<n>` uniquifier keeps both snapshots (first file
        // keeps the reference's exact filename contract)
        val path = Iterator.from(0)
          .map {
            case 0 => dir.resolve(s"disruptions_$ts.json")
            case n => dir.resolve(s"disruptions_${ts}_$n.json")
          }
          .flatMap { p =>
            try {
              Files.writeString(p, body,
                java.nio.file.StandardOpenOption.CREATE_NEW)
              Some(p)
            } catch {
              case _: java.nio.file.FileAlreadyExistsException => None
            }
          }
          .next()
        path.toString
      }

  /** One-call extract source: fetch, archive, read back with the raw
    * schema — the pipeline's S1 entry. A fetch error surfaces as an
    * exception (a scheduled batch run must fail loudly, not load an
    * empty frame that upserts nothing).
    */
  def extract(
      spark: SparkSession,
      url: String,
      archiveRoot: String,
      headers: Map[String, String] = Map.empty,
      clock: Clock = Clock.system,
      transport: Transport = httpTransport,
      sleep: Long => Unit = Thread.sleep): DataFrame =
    fetchToArchive(url, archiveRoot, headers, clock, transport, sleep) match {
      case Right(path) => RawSource.readRawJsonArray(spark, path)
      case Left(err)   => throw new IOException(s"S1 fetch failed: $err")
    }
}
