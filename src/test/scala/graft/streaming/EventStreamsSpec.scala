package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventStreams.{Event, Session}

class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("sessionize closes a session after the gap and aggregates within it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.sessionize(input.toDS(), gapMinutes = 10,
        lateness = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // user 1: events at 10:00, 10:05 (one session), then 10:30 (new one).
    input.addData(
      Event(1L, ts(0), "click", 1.0),
      Event(1L, ts(5), "view", 2.0))
    query.processAllAvailable()
    input.addData(Event(1L, ts(30), "click", 5.0))
    query.processAllAvailable()
    // advance watermark far enough to time the second session out
    input.addData(Event(2L, Timestamp.valueOf("2026-01-01 12:00:00"), "view", 0.0))
    query.processAllAvailable()
    query.stop()

    val sessions = spark.table("sessions").as[Session].collect()
      .filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    assert(sessions.length == 2)
    assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
    assert(sessions(0).session_start == ts(0) && sessions(0).session_end == ts(5))
    assert(sessions(1).n_events == 1 && sessions(1).total_value == 5.0)
  }

  test("windowedCounts emits closed tumbling windows once (append + watermark)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = EventStreams.windowedCounts(input.toDF(),
        windowLength = "10 minutes", lateness = "0 seconds")
      .writeStream.format("memory").queryName("wc")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1L, ts(1), "click", 1.0),
      Event(2L, ts(3), "click", 2.0),
      Event(3L, ts(4), "view", 4.0))
    query.processAllAvailable()
    // watermark passes 10:10 → first window closes
    input.addData(Event(4L, ts(25), "view", 1.0))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("wc").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Double]("total_value"))).toSet
    assert(rows.contains(("click", 2L, 3.0)))
    assert(rows.contains(("view", 1L, 4.0)))
  }
}
