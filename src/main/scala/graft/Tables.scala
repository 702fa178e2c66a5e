package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All tables are parquet; reads go through `spark.read.parquet` so
  * Catalyst gets column pruning + predicate pushdown into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet's ts has varied across driver testdata versions:
    // INT64 TIMESTAMP(NANOS) (Spark reads it only as raw longs under
    // nanosAsLong), or micros without isAdjustedToUTC (Spark 4 infers
    // TIMESTAMP_NTZ, which unix_micros & friends reject). Normalize
    // both to a plain session-TZ TimestampType — the session is pinned
    // UTC, so the NTZ cast is value-identity, matching how the DuckDB
    // oracle reads the same file (naive TIMESTAMP).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        case TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view for Spark SQL queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
