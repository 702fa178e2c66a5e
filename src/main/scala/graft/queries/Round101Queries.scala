package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.store.TableStore
import graft.streaming.EventStreams

/** Round-101 gate additions: the streaming execution path folded into
  * the batch oracle gate. Until now streaming was spec-only (the only
  * major family without a DuckDB-gated query); q520 runs a REAL
  * Structured Streaming query — file source, micro-batches, stateful
  * Update-mode windowed aggregation, foreachBatch upsert sink — and
  * hash-compares its final landed table against DuckDB's one-shot
  * aggregate of the same events.
  */
object Round101Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- streaming fold
  // End-to-end streaming correctness: the events table lands as a
  // multi-file parquet source, streams through
  // EventStreams.countsToStore (Update-mode 10-minute tumbling
  // windowed aggregation + latest-wins upsert keyed on
  // (window_start, event_type), versioned by batch id) in several
  // micro-batches (maxFilesPerTrigger=2 over 8 range-partitioned
  // files), and the FINAL store state must equal the one-shot
  // aggregate: update mode re-emits a window's full accumulated
  // aggregate whenever a batch touches it, and the upsert keeps the
  // latest version, so the landed table is batching-invariant.
  // Lateness is effectively infinite for the gate (no late drops —
  // batching must not change the answer; production tunes it down
  // to bound state). Sums are DECIMAL in-state (exact, order-free),
  // cast to double only at the end — the engine-wide float rule.
  private val q520 = QueryDef(
    "q520_stream_windowed_fold",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("ts"), col("event_type"),
          col("value").cast(DecimalType(18, 2)).as("value"))
      val tmp = Files.createTempDirectory("graft-stream-gate")
      val src = tmp.resolve("src").toString
      // range-partition by ts so the stream sees roughly
      // chronological micro-batches, like a real feed
      ev.repartitionByRange(8, col("ts")).write.parquet(src)
      val stream = s.readStream
        .schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
      val store = new TableStore(s, tmp.resolve("store").toString)
      val q = EventStreams.countsToStore(stream, store, "stream_counts",
        tmp.resolve("ckpt").toString,
        windowLength = "10 minutes", lateness = "3650 days")
      try q.processAllAvailable() finally q.stop()
      store.read("stream_counts").get
        .select(
          unix_micros(col("window_start")).as("window_start_us"),
          col("event_type"), col("n_events"),
          col("total_value").cast("double").as("total_value"))
        .orderBy("window_start_us", "event_type")
    },
    Some("""SELECT
        (epoch_us(ts) // (10*60*1000000)) * (10*60*1000000)
          AS window_start_us,
        event_type,
        CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events
      GROUP BY 1, 2 ORDER BY window_start_us, event_type"""),
    covers = Seq("STREAM-windowed-fold", "§2.10a", "§2.10b"))

  val all: Seq[QueryDef] = Seq(q520)
}
