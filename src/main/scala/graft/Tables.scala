package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
    // events.parquet stores ts as INT64 TIMESTAMP(NANOS) which Spark's
    // parquet reader rejects; read it as raw nanos and convert to a
    // micros timestamp (the generated values are µs-precision, so the
    // integer DIV by 1000 is lossless).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view for Spark SQL queries. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
