package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.etl.Clock

/** File-source streaming ingest: exactly-once per file + key dedupe
  * across triggers (the reference's insert-if-absent contract,
  * streaming flavor).
  */
class DisruptionStreamSpec extends SparkSpec {

  private def writeJsonl(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes)

  test("AvailableNow run drains files; re-run picks up only new ones and dedups") {
    val base = Files.createTempDirectory("graft-stream")
    val raw = Files.createDirectory(base.resolve("raw"))
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val clock = Clock.golden

    writeJsonl(raw, "batch1.jsonl", Seq(
      """{"id":"s1","type":"verstoring","title":"Storing Amsterdam","start":"2026-02-14T08:00:00+0100"}""",
      """{"id":"s2","type":"werkzaamheden","title":"Werkzaamheden Utrecht","start":"2026-02-14T09:00:00+0100","end":"2026-02-14T15:00:00+0100"}"""))

    val q1 = DisruptionStream.runOnce(spark, raw.toString, out, ckpt, clock)
    q1.awaitTermination()
    val first = spark.read.parquet(out)
    assert(first.count() == 2)

    // Second batch: s2 repeats (API overlap), s3 is new.
    writeJsonl(raw, "batch2.jsonl", Seq(
      """{"id":"s2","type":"werkzaamheden","title":"Werkzaamheden Utrecht","start":"2026-02-14T09:00:00+0100","end":"2026-02-14T15:00:00+0100"}""",
      """{"id":"s3","type":"calamiteit","title":"Calamiteit Rotterdam","start":"2026-02-14T10:00:00+0100"}"""))

    val q2 = DisruptionStream.runOnce(spark, raw.toString, out, ckpt, clock)
    q2.awaitTermination()
    val all = spark.read.parquet(out)
    assert(all.count() == 3) // s2 deduped by streaming state
    val types = all.collect().map(r =>
      r.getAs[String]("disruption_id") -> r.getAs[String]("type")).toMap
    assert(types == Map("s1" -> "disruption", "s2" -> "maintenance", "s3" -> "calamity"))
  }
}
