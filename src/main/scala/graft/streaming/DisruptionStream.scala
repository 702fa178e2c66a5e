package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.etl.{Clock, DisruptionCleaner, NsSchemas}

/** Streaming flavor of the daily batch ingest (SURVEY §2.10): the
  * reference's cron-driven "process new files, skip already-seen
  * records" contract maps onto Structured Streaming's file source +
  * checkpoint (exactly-once per file) with `Trigger.AvailableNow`
  * (drain what's there, then stop — the scheduled-batch cadence).
  *
  * The cleaning stage is the exact same zero-UDF column pipeline as
  * batch ([[DisruptionCleaner.clean]]) — one definition, two
  * execution modes.
  */
object DisruptionStream {

  /** Incremental clean over a JSONL directory. Key-dedup on
    * `disruption_id` reproduces the reference's insert-if-absent sink
    * (`pipeline.py:154-176`) in-stream.
    */
  def cleanStream(
      spark: SparkSession,
      rawDir: String,
      clock: Clock,
      schema: StructType = NsSchemas.raw): DataFrame = {
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "64")
      .json(rawDir)
    DisruptionCleaner.clean(raw, clock)
      .dropDuplicates("disruption_id")
  }

  /** Drain-available-and-stop run to a parquet sink — the streaming
    * equivalent of one daily pipeline invocation; re-running later
    * picks up only new files (checkpointed source offsets).
    */
  def runOnce(
      spark: SparkSession,
      rawDir: String,
      outDir: String,
      checkpointDir: String,
      clock: Clock): StreamingQuery =
    cleanStream(spark, rawDir, clock).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
