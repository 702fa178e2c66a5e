package graft.sources

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.NsSchemas

/** The `year=/month=/day=` JSONL layout must give day-level partition
  * pruning — the Spark-native replacement for the reference's Glue
  * partition projection (SURVEY §2.1 S6, §4.1).
  */
class RawSourceSpec extends SparkSpec {

  test("date filters prune partition directories before any file is read") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-jsonl").toString
    val mk = (id: String) =>
      Seq((id, "verstoring", s"Storing $id")).toDF("id", "type", "title")
    RawSource.writePartitionedJsonl(mk("a"), root, LocalDate.of(2026, 2, 14))
    RawSource.writePartitionedJsonl(mk("b"), root, LocalDate.of(2026, 2, 15))
    RawSource.writePartitionedJsonl(mk("c"), root, LocalDate.of(2026, 3, 1))

    val all = RawSource.readJsonl(spark, root,
      NsSchemas.raw.add("year", "string").add("month", "string").add("day", "string"))
    assert(all.count() == 3)

    val oneDay = all.filter(col("year") === "2026" && col("month") === "02" &&
      col("day") === "15")
    assert(oneDay.count() == 1)
    // The physical scan must see exactly one partition directory.
    val scan = oneDay.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.relation.partitionSchema.fieldNames.toSeq ==
      Seq("year", "month", "day"))
    assert(scan.selectedPartitions.partitionCount == 1)
  }

  test("CSV snapshot carries a UTF-8 BOM and round-trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv").resolve("snap").toString
    val df = Seq(("d1", "disruption", 90.0), ("d2", "maintenance", 720.0))
      .toDF("disruption_id", "type", "duration_minutes")
    RawSource.writeCsvSnapshot(df, dir)

    val part = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    assert(part.nonEmpty)
    val head = Files.readAllBytes(part.head.toPath).take(3)
    assert(head.sameElements(Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte)))

    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("disruption_id", "type", "duration_minutes"))
  }
}
