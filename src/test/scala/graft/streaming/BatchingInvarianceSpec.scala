package graft.streaming

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.EventStreams.{Event, Session}

/** Batching-invariance property: the q521/q523 gates prove their
  * stateful paths equal the batch oracle at ONE batching (eight
  * chronological slices); this spec fuzzes the batching itself —
  * the same chronological event sequence split at random cut points
  * must emit the identical session set however the micro-batches
  * fall, because state + event-time timers carry across batch
  * boundaries. Lateness covers the full spread (no drops) and a
  * far-future sentinel closes every session, so the emitted set is
  * total and comparable. Fixed seeds reproduce failures.
  */
class BatchingInvarianceSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // events across 2 users and 2 hours; minute-resolution gaps around
  // the 10-minute session cutoff on both sides
  private val genEvents: Gen[List[(Int, Int)]] =
    Gen.listOfN(24, for {
      u <- Gen.chooseNum(1, 2)
      m <- Gen.chooseNum(0, 119)
    } yield (u, m))

  private var runId = 0

  /** Feeds `events` chronologically in batches cut at `cuts`
    * (positions in the sorted sequence), closes everything with a
    * sentinel, returns the emitted sessions for non-sentinel users.
    */
  private def runSessionize(
      events: Seq[Event], cuts: Seq[Int]): Set[(Long, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    runId += 1
    val name = s"binv_$runId"
    val input = MemoryStream[Event]
    val query = EventStreams.sessionize(input.toDS(), gapMinutes = 10,
        lateness = "10 hours")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    val batches = (cuts.sorted.distinct :+ events.size).distinct
      .foldLeft((Seq.empty[Seq[Event]], 0)) { case ((acc, from), to) =>
        if (to <= from) (acc, from)
        else (acc :+ events.slice(from, to), to)
      }._1
    batches.foreach { b => input.addData(b); query.processAllAvailable() }
    input.addData(Event(99L,
      Timestamp.valueOf("2026-01-03 00:00:00"), "sentinel", 0.0))
    query.processAllAvailable()
    query.stop()
    spark.table(name).as[Session].collect()
      .filter(_.user_id != 99L)
      .map(s => (s.user_id, s.session_start.getTime,
        s.session_end.getTime, s.n_events.toLong)).toSet
  }

  test("sessionize emits the same sessions under any micro-batch cuts") {
    samples(genEvents, 3, seed = 52100L).zipWithIndex.foreach {
      case (raw, i) =>
        val events = raw.distinct.sortBy(e => (e._2, e._1)).map {
          case (u, m) =>
            Event(u.toLong, Timestamp.valueOf(
              f"2026-01-01 ${10 + m / 60}%02d:${m % 60}%02d:00"), "e", 1.0)
        }
        val oneBatch = runSessionize(events, Seq.empty)
        // cut points derived from the sample index: an uneven split
        // and a many-batch split
        val uneven = runSessionize(events, Seq(3 + i, 11, 17 + i))
        val many = runSessionize(events, (2 to events.size by 4).toSeq)
        assert(uneven == oneBatch,
          s"uneven batching diverged for sample $i: $events")
        assert(many == oneBatch,
          s"many-batch split diverged for sample $i: $events")
    }
  }
}
