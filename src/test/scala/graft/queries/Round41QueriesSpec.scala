package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-41 gate queries. */
class Round41QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("skyline: pairwise non-domination holds against the raw table") {
    val out = graft.SparkEntry.queries("q282_skyline")(spark, dir).cache()
    assert(out.count() > 0)
    val o = graft.Tables.load(spark, dir, "orders").join(
      graft.Tables.load(spark, dir, "customer")
        .select("c_custkey", "c_mktsegment"),
      col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        col("o_totalprice").as("p2"),
        datediff(to_date(col("o_orderdate")),
          lit("1970-01-01").cast("date")).cast("long").as("ed2"))
    // no raw order may strictly dominate a skyline member
    val dominated = out.join(o, Seq("seg"))
      .filter(col("ed2") <= col("ed") && col("p2") <= col("price") &&
        (col("ed2") < col("ed") || col("p2") < col("price")))
    assert(dominated.isEmpty, "skyline members are non-dominated")
    out.unpersist()
  }

  test("event rle: runs conserve events and never repeat a type") {
    val out = graft.SparkEntry.queries("q283_event_rle")(spark, dir).cache()
    val raw = graft.Tables.load(spark, dir, "events")
      .filter(col("user_id") % 20 === 0)
    assert(out.agg(sum("run_len")).head().getLong(0) === raw.count(),
      "RLE conserves the event count")
    assert(out.filter(col("start_us") > col("end_us")).isEmpty)
    // consecutive islands of one user never carry the same type
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("island")
    val repeats = out.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") === col("event_type"))
    assert(repeats.isEmpty, "adjacent runs always change type")
    out.unpersist()
  }
}
