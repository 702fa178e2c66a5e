package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source/sink format breadth beyond the reference's JSON/JSONL/CSV
  * (SURVEY §2.1): the same frame must survive a write→read round trip
  * bit-identically through every columnar and text format Spark ships
  * offline — parquet, ORC, JSON lines, and header CSV (schema-on-read
  * for the text formats, as at any real ingest boundary).
  */
class FormatRoundTripSpec extends SparkSpec {

  private def sample: DataFrame =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_returnflag", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")
      .limit(200)

  private def canon(df: DataFrame): Seq[String] =
    df.select(
        col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_returnflag"),
        // second-precision ISO form: CSV/JSON text round-trips are
        // second-exact; the source data is second-precision anyway
        date_format(col("l_shipdate").cast("timestamp"), "yyyy-MM-dd HH:mm:ss").as("ship"))
      .orderBy("l_orderkey", "l_linenumber")
      .collect().map(_.mkString("|")).toSeq

  test("parquet, orc, json and csv round-trip the same rows") {
    val base = Files.createTempDirectory("graft_fmt").toString
    val df = sample
    val expected = canon(df)
    assert(expected.size == 200)

    df.write.parquet(s"$base/p")
    assert(canon(spark.read.parquet(s"$base/p")) == expected)

    df.write.orc(s"$base/o")
    assert(canon(spark.read.orc(s"$base/o")) == expected)

    df.write.json(s"$base/j")
    assert(canon(spark.read.schema(df.schema).json(s"$base/j")) == expected)

    df.write.option("header", true)
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss")
      .csv(s"$base/c")
    assert(canon(spark.read.schema(df.schema)
      .option("header", true)
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss")
      .csv(s"$base/c")) == expected)
  }
}
