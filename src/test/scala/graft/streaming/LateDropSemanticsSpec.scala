package graft.streaming

import java.nio.file.{Files, Path}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Pins the WATERMARK LATE-FILTER semantics the q527 late-drop gate
  * hard-codes: since Spark 3.4 (SPARK-40925) a batch filters late
  * input against the watermark as of the PREVIOUS batch, so stale
  * data arriving one trigger after the max is still ACCEPTED and
  * only a replay two-or-more triggers after the max is dropped. q527
  * relies on exactly that (slice 2 = tail accepted, slice 3 = replay
  * dropped); if a future Spark upgrade filters against the CURRENT
  * batch's watermark instead, the tail would drop on first arrival —
  * this spec then fails HERE, naming the semantics change, instead
  * of q527 going red as an apparent aggregation bug.
  */
class LateDropSemanticsSpec extends SparkSpec {

  /** Write each one-slice frame as a single parquet file with a
    * deterministic, strictly-increasing mtime so the file source
    * delivers slices in order, one per trigger (the gate's
    * writeOrderedSlices shape, miniature).
    */
  private def writeSlices(frames: Seq[DataFrame], src: Path): Unit = {
    Files.createDirectories(src)
    val baseMs = 1700000000000L
    frames.zipWithIndex.foreach { case (f, i0) =>
      val i = i0 + 1
      val stage = Files.createTempDirectory("graft-late-slice")
      f.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.toFile.listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file in $stage"))
      val dest = src.resolve(f"slice-$i%02d.parquet")
      Files.move(part.toPath, dest)
      dest.toFile.setLastModified(baseMs + i * 1000L)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(stage.toFile)
    }
  }

  test("late filter lags one batch: tail accepted on first arrival, replay dropped (SPARK-40925)") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-late-pin")
    try {
      def ev(t: String, typ: String): (java.sql.Timestamp, String, Double) =
        (java.sql.Timestamp.valueOf(t), typ, 1.0)
      val cols = Seq("ts", "event_type", "value")
      // slice 1: the on-time stream, max 12:00 → watermark 11:50 once
      // the batch commits (lateness 10 min)
      val onTime = Seq(ev("2026-01-01 11:55:00", "view"),
        ev("2026-01-01 12:00:00", "click")).toDF(cols: _*)
      // slices 2+3: the stale tail at 10:00 (window [10:00,10:10) —
      // 100 min below the watermark) and its byte-identical replay
      val tail = Seq(ev("2026-01-01 10:00:00", "view")).toDF(cols: _*)
      writeSlices(Seq(onTime, tail, tail), tmp.resolve("src"))

      val emitted = mutable.Map.empty[Long, Array[Row]]
      val stream = spark.readStream
        .schema(onTime.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp.resolve("src").toString)
      val q = EventStreams.windowedCounts(stream,
          windowLength = "10 minutes", lateness = "10 minutes")
        .writeStream
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          emitted.synchronized { emitted(id) = batch.collect() }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()

      def tailRows(rows: Array[Row]): Array[Row] = rows.filter(r =>
        r.getAs[java.sql.Timestamp]("window_start").toString
          .startsWith("2026-01-01 10:00"))
      // batch 0 = on-time slice: the two on-time windows, no tail
      assert(emitted(0L).length == 2 && tailRows(emitted(0L)).isEmpty)
      // batch 1 = first tail arrival: ACCEPTED (late filter is one
      // batch behind) — exactly the tail window, counted once
      assert(emitted.contains(1L), "file source did not trigger a second batch")
      assert(tailRows(emitted(1L)).map(_.getAs[Long]("n_events")).toSeq == Seq(1L),
        "SPARK-40925 semantics changed: the first late-tail arrival was " +
          "filtered against the CURRENT batch's watermark (dropped or " +
          s"re-counted). q527's slice design assumes one-batch lag. Got: ${
            emitted(1L).mkString("; ")}")
      // batch 2 = replay: DROPPED — nothing emitted, count stays 1
      assert(emitted.get(2L).forall(_.isEmpty),
        "SPARK-40925 semantics changed: the tail REPLAY two triggers " +
          "after the max was not dropped — q527's hash would double-count. " +
          s"Got: ${emitted.getOrElse(2L, Array.empty[Row]).mkString("; ")}")
      // and no later (no-data) batch re-emits the tail either
      assert(emitted.collect {
        case (id, rows) if id >= 2L => tailRows(rows).length
      }.sum == 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp.toFile)
    }
  }
}
