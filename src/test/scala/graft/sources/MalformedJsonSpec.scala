package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The reference's Athena table sets `ignore.malformed.json=TRUE`
  * (SURVEY S6): a broken line must never fail the scan. The engine's
  * JSONL read is PERMISSIVE — this spec pins the three behaviours a
  * malformed line can get: null-row tolerance, corrupt-record capture
  * for quarantine pipelines, and DROPMALFORMED filtering.
  */
class MalformedJsonSpec extends SparkSpec {

  private def writeFixture(): String = {
    val base = Files.createTempDirectory("graft_mal").toString
    val dir = Paths.get(base, "year=2026", "month=02", "day=14")
    Files.createDirectories(dir)
    Files.write(dir.resolve("part-000.jsonl"), java.util.Arrays.asList(
      """{"id": "d1", "title": "ok"}""",
      """{"id": "d2", "title": : broken""",
      """{"id": "d3", "title": "also ok"}"""))
    base
  }

  test("PERMISSIVE jsonl scan tolerates malformed lines (reference S6 parity)") {
    val base = writeFixture()
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("title", StringType)))

    val rows = RawSource.readJsonl(spark, base, schema)
      .select("id", "title", "year", "month", "day").collect()
    assert(rows.length == 3)                       // scan survives
    assert(rows.count(_.getString(0) == null) == 1) // bad line → null row
    assert(rows.forall(_.getAs[Any]("day") != null)) // partition cols intact

    // quarantine shape: capture the raw broken line
    // (cached first: Spark disallows querying only the corrupt column
    // straight off the raw files)
    val withCorrupt = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .schema(schema.add("_bad", StringType))
      .json(s"$base/year=*/month=*/day=*")
      .cache()
    val bad = withCorrupt.filter(col("_bad").isNotNull).select("_bad").collect()
    assert(bad.length == 1 && bad.head.getString(0).contains("broken"))

    // strict variant: malformed lines dropped entirely
    val dropped = spark.read.option("mode", "DROPMALFORMED").schema(schema)
      .json(s"$base/year=*/month=*/day=*")
    assert(dropped.count() == 2)
  }
}
