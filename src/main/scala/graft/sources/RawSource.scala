package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.etl.NsSchemas

/** Sources / sinks for the raw NS disruption archive (SURVEY §2.1).
  *
  *  - S2-style raw JSON arrays (`data/raw/disruptions_<ts>.json`) read
  *    with `multiLine` + the explicit raw schema;
  *  - S4/S6 JSONL laid out as `year=/month=/day=` partitions — Spark's
  *    native JSON output is JSONL, and the directory layout gives
  *    day-level partition pruning for free (the reference needed Glue
  *    partition projection for the same effect,
  *    `terraform/modules/athena/main.tf:36-49`).
  */
object RawSource {

  /** Read one or more pretty-printed JSON-array snapshots. */
  def readRawJsonArray(
      spark: SparkSession,
      path: String,
      schema: StructType = NsSchemas.raw): DataFrame =
    spark.read
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .json(path)

  /** Write a raw batch as partitioned JSONL (one compact object per
    * line), partitioned by the fetch date — the S4 Athena layout.
    */
  def writePartitionedJsonl(df: DataFrame, root: String, fetchedAt: java.time.LocalDate): Unit =
    df
      .withColumn("year", lit(f"${fetchedAt.getYear}%04d"))
      .withColumn("month", lit(f"${fetchedAt.getMonthValue}%02d"))
      .withColumn("day", lit(f"${fetchedAt.getDayOfMonth}%02d"))
      .write
      .partitionBy("year", "month", "day")
      .mode(SaveMode.Append)
      .json(root)

  /** Cleaned-snapshot CSV sink (S5, `src/pipeline.py:103-110`): header
    * row, and the reference's `utf-8-sig` quirk — each part file gets
    * a UTF-8 BOM prepended (Excel compatibility), added in a driver
    * post-step since Spark's CSV writer has no BOM option.
    */
  def writeCsvSnapshot(df: DataFrame, path: String): Unit = {
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    fs.listStatus(hPath).filter(s => s.isFile &&
        s.getPath.getName.startsWith("part-")).foreach { s =>
      val tmp = new org.apache.hadoop.fs.Path(s.getPath + ".bom")
      val in = fs.open(s.getPath)
      val out = fs.create(tmp, true)
      try { out.write(bom); org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false) }
      finally { in.close(); out.close() }
      fs.delete(s.getPath, false)
      fs.rename(tmp, s.getPath)
    }
  }

  /** Read the JSONL archive back; `year/month/day` become partition
    * columns and filters on them prune directories before any file is
    * opened.
    */
  def readJsonl(
      spark: SparkSession,
      root: String,
      schema: StructType = NsSchemas.raw): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .option("basePath", root)
      .json(s"$root/year=*/month=*/day=*")
}
