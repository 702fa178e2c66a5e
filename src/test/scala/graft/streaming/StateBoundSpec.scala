package graft.streaming

import java.nio.file.{Files, Path}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Pins the 100 TB state-size argument for the streaming operators
  * with NUMBERS instead of prose: under the production lateness
  * settings, state-store row counts stay bounded by the watermark
  * horizon — O(keys × horizon/window) for the windowed aggregate,
  * O(rows inside the horizon) for watermarked dedup — and do NOT
  * grow with the total stream length. Each test replays a long
  * chronological feed (one slice per micro-batch, far more windows
  * than fit in the horizon) and asserts the state operator's
  * `numRowsTotal` peak from the query's own progress metrics. If a
  * change ever breaks watermark eviction (state → O(stream)), the
  * peak blows past the pinned bound here long before production
  * notices an executor OOM at scale.
  */
class StateBoundSpec extends SparkSpec {

  /** One parquet file per slice, strictly-increasing mtimes, so
    * `maxFilesPerTrigger=1` replays the feed chronologically one
    * slice per micro-batch (the gates' writeOrderedSlices shape).
    */
  private def writeSlices(frames: Seq[DataFrame], src: Path): Unit = {
    Files.createDirectories(src)
    val baseMs = 1700000000000L
    frames.zipWithIndex.foreach { case (f, i0) =>
      val i = i0 + 1
      val stage = Files.createTempDirectory("graft-sb-slice")
      f.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file in $stage"))
      val dest = src.resolve(f"slice-$i%02d.parquet")
      Files.move(part.toPath, dest)
      dest.toFile.setLastModified(baseMs + i * 1000L)
      rmTree(stage)
    }
  }

  private def rmTree(p: Path): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(p.toFile)
  }

  /** Run `out` to completion over the sliced source and return every
    * per-batch `numRowsTotal` of the (single) state operator.
    */
  private def stateRowsPerBatch(out: DataFrame, ckpt: Path): Seq[Long] = {
    val q = out.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt.toString)
      .format("noop")
      .start()
    try q.processAllAvailable() finally q.stop()
    q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
  }

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2026-01-01 ${8 + minute / 60}%02d:${minute % 60}%02d:00")

  test("windowed agg state is O(horizon/window × keys), not O(windows seen)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-statebound-win")
    try {
      // 30 slices, each advancing event time by one full 10-min
      // window, 2 keys per slice → 60 windows TOTAL; the production
      // lateness (10 min, q527's setting) keeps only ~1 horizon +
      // the in-flight window + the SPARK-40925 one-batch eviction
      // lag live at once
      val slices = (0 until 30).map { i =>
        Seq((ts(10 * i), "view", 1.0), (ts(10 * i), "click", 1.0))
          .toDF("ts", "event_type", "value")
      }
      writeSlices(slices, tmp.resolve("src"))
      val stream = spark.readStream
        .schema(slices.head.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp.resolve("src").toString)
      val perBatch = stateRowsPerBatch(
        EventStreams.windowedCounts(stream,
          windowLength = "10 minutes", lateness = "10 minutes"),
        tmp.resolve("ckpt"))
      assert(perBatch.size >= 30, s"expected ≥30 batches, saw ${perBatch.size}")
      // horizon bound: ≤ (lateness/window = 1) + current + 2 slack
      // windows × 2 keys = 8 rows; unbounded state would reach 60
      val peak = perBatch.max
      assert(peak <= 8L,
        s"windowed-agg state peaked at $peak rows — watermark eviction " +
          s"is not holding state to the horizon (60 = no eviction at all)")
    } finally rmTree(tmp)
  }

  test("dropDuplicatesWithinWatermark state is O(horizon), not O(distinct keys seen)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-statebound-dedup")
    try {
      // 30 slices × 4 unique (user_id, ts) keys each, event time
      // advancing 10 min per slice → 120 distinct keys total; plain
      // dropDuplicates would hold all 120 forever
      val slices = (0 until 30).map { i =>
        (0 until 4).map(u => (100L * i + u, ts(10 * i), "view", 1.0))
          .toDF("user_id", "ts", "event_type", "value")
      }
      writeSlices(slices, tmp.resolve("src"))
      val stream = spark.readStream
        .schema(slices.head.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp.resolve("src").toString)
      val perBatch = stateRowsPerBatch(
        EventStreams.dedupWithinWatermark(stream, lateness = "10 minutes"),
        tmp.resolve("ckpt"))
      assert(perBatch.size >= 30, s"expected ≥30 batches, saw ${perBatch.size}")
      // ≤ (1 horizon + current + 2 slack slices) × 4 keys/slice = 16;
      // no-eviction state would reach 120
      val peak = perBatch.max
      assert(peak <= 16L,
        s"dedup state peaked at $peak rows — per-key eviction past the " +
          s"watermark is not happening (120 = dropDuplicates behavior)")
    } finally rmTree(tmp)
  }
}
