package graft.sources

import java.net.SocketTimeoutException
import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.etl.Clock
import graft.sources.ApiClient._

/** Pins the S1 retry contract (reference api_client.py:52-88): 3
  * attempts with 2/4/8 s backoff on timeout ONLY, single-attempt
  * classification for 401/429/other HTTP and unexpected errors, and
  * archive parity with the S2 raw-file read path.
  */
class ApiClientSpec extends AnyFunSuite {

  /** Scripted transport: pops one behavior per attempt; records calls. */
  private class Script(steps: (() => Response)*) {
    val calls = ArrayBuffer.empty[String]
    val sleeps = ArrayBuffer.empty[Long]
    private var i = 0
    val transport: Transport = (url, _, _) => {
      calls += url
      val step = steps(math.min(i, steps.length - 1)); i += 1
      step()
    }
    val sleep: Long => Unit = ms => sleeps += ms
  }

  private def timeout(): Response = throw new SocketTimeoutException("t/o")

  test("success on first attempt: one call, no sleeps") {
    val s = new Script(() => Response(200, "[{\"id\":\"a\"}]"))
    assert(fetchWithRetry("u", transport = s.transport, sleep = s.sleep) ==
      Right("[{\"id\":\"a\"}]"))
    assert(s.calls.size == 1 && s.sleeps.isEmpty)
  }

  test("timeouts retry with the 2s/4s backoff schedule, then succeed") {
    val s = new Script(() => timeout(), () => timeout(),
      () => Response(200, "ok"))
    assert(fetchWithRetry("u", transport = s.transport, sleep = s.sleep) ==
      Right("ok"))
    assert(s.calls.size == 3)
    assert(s.sleeps.toSeq == Seq(2000L, 4000L))
  }

  test("exhausted timeouts: maxRetries attempts, no sleep after the last") {
    val s = new Script(() => timeout())
    assert(fetchWithRetry("u", transport = s.transport, sleep = s.sleep) ==
      Left(TimedOut))
    assert(s.calls.size == 3)
    assert(s.sleeps.toSeq == Seq(2000L, 4000L)) // 8s never waited
  }

  test("maxRetries is honored and scales the schedule") {
    val s = new Script(() => timeout())
    assert(fetchWithRetry("u", maxRetries = 4,
      transport = s.transport, sleep = s.sleep) == Left(TimedOut))
    assert(s.calls.size == 4)
    assert(s.sleeps.toSeq == Seq(2000L, 4000L, 8000L))
  }

  test("HTTP errors classify and never retry") {
    for ((code, err) <- Seq(401 -> Unauthorized, 429 -> RateLimited,
        500 -> HttpError(500), 404 -> HttpError(404))) {
      val s = new Script(() => Response(code, "err"))
      assert(fetchWithRetry("u", transport = s.transport, sleep = s.sleep) ==
        Left(err), s"code $code")
      assert(s.calls.size == 1 && s.sleeps.isEmpty, s"code $code retried")
    }
  }

  test("unexpected transport errors never retry") {
    val s = new Script(() => throw new RuntimeException("boom"))
    val got = fetchWithRetry("u", transport = s.transport, sleep = s.sleep)
    assert(got == Left(Unexpected("RuntimeException: boom")))
    assert(s.calls.size == 1 && s.sleeps.isEmpty)
  }

  test("headers reach the transport") {
    var seen = Map.empty[String, String]
    val t: Transport = (_, h, _) => { seen = h; Response(200, "ok") }
    fetchWithRetry("u", Map("Ocp-Apim-Subscription-Key" -> "k"), transport = t)
    assert(seen == Map("Ocp-Apim-Subscription-Key" -> "k"))
  }

  test("file:// transport fetches a local snapshot end-to-end") {
    val f = Files.createTempFile("graft-api", ".json")
    Files.writeString(f, """[{"id":"x"}]""")
    val got = fetchWithRetry(f.toUri.toString)
    assert(got == Right("""[{"id":"x"}]"""))
  }

  test("fetchToArchive writes the dated raw filename and S2 reads it back") {
    val root = Files.createTempDirectory("graft-api-arch").toString
    val clock = Clock(java.time.Instant.parse("2026-08-14T12:30:05Z"))
    val body = """[{"id":"d1","type":"storing"},{"id":"d2","type":"werkzaamheid"}]"""
    val s = new Script(() => Response(200, body))
    val got = fetchToArchive("u", root, clock = clock,
      transport = s.transport, sleep = s.sleep)
    assert(got == Right(s"$root/disruptions_20260814_123005.json"))
    // archive parity: the written snapshot flows through the same S2
    // read the file-based extract path uses
    val spark = SparkSpec.session
    val df = RawSource.readRawJsonArray(spark, got.toOption.get)
    assert(df.select("id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("d1", "d2"))
  }

  test("fetchToArchive same-second fetches keep BOTH snapshots (no clobber)") {
    val root = Files.createTempDirectory("graft-api-arch2").toString
    val clock = Clock(java.time.Instant.parse("2026-08-14T12:30:05Z"))
    var n = 0
    val s = new Script(() => { n += 1; Response(200, s"""[{"id":"d$n"}]""") })
    val first = fetchToArchive("u", root, clock = clock,
      transport = s.transport, sleep = s.sleep)
    val second = fetchToArchive("u", root, clock = clock,
      transport = s.transport, sleep = s.sleep)
    assert(first == Right(s"$root/disruptions_20260814_123005.json"))
    assert(second == Right(s"$root/disruptions_20260814_123005_1.json"))
    assert(Files.readString(java.nio.file.Paths.get(first.toOption.get))
      .contains("d1"))
    assert(Files.readString(java.nio.file.Paths.get(second.toOption.get))
      .contains("d2"))
  }

  test("extract throws loudly on fetch failure") {
    val s = new Script(() => Response(401, ""))
    val spark = SparkSpec.session
    val e = intercept[java.io.IOException] {
      ApiClient.extract(spark, "u", Files.createTempDirectory("x").toString,
        transport = s.transport, sleep = s.sleep)
    }
    assert(e.getMessage.contains("Unauthorized"))
  }
}
