package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.SparkSpec

/** The same declarative aggregation must produce identical results
  * run as a batch plan and as an incremental AvailableNow stream over
  * the same files — Structured Streaming's core contract, verified on
  * the driver's events table.
  */
class StreamBatchParitySpec extends SparkSpec {

  test("windowed counts: batch ≡ file-source streaming (AvailableNow)") {
    val events = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts", col("ts").cast("timestamp"))

    val base = Files.createTempDirectory("graft-parity")
    val dataDir = base.resolve("data").toString
    // several files so the stream takes multiple micro-batches
    events.repartition(4).write.json(dataDir)

    val batch = EventStreams.windowedCounts(
        spark.read.schema(events.schema).json(dataDir), "15 minutes", "0 seconds")
      .collect().map(_.toString).sorted

    val streamIn = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .json(dataDir)
    val q = EventStreams.windowedCounts(streamIn, "15 minutes", "0 seconds")
      .writeStream.format("memory").queryName("parity")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("parity").collect().map(_.toString).sorted
    assert(streamed.length == batch.length)
    assert(streamed.toSeq == batch.toSeq)
  }
}
