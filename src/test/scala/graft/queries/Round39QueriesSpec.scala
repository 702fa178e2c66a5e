package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-39 gate queries. */
class Round39QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("attribution: both models credit the same conversion population") {
    val out = graft.SparkEntry.queries("q278_attribution")(spark, dir).cache()
    assert(out.count() > 0)
    val byModel = out.groupBy("model").agg(sum("n_conversions").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byModel("first_touch") === byModel("last_touch"),
      "each attributed purchase appears once under either model")
    assert(out.filter(col("mean_latency_s") < 0.0).isEmpty,
      "a touch never postdates its purchase")
    assert(out.filter(!col("touch_type").isin("click", "view")).isEmpty)
    out.unpersist()
  }

  test("magnitude hist: buckets partition orders with consistent bounds") {
    val out = graft.SparkEntry.queries("q279_magnitude_hist")(spark, dir)
      .cache()
    val orders = graft.Tables.load(spark, dir, "orders").count()
    assert(out.agg(sum("n")).head().getLong(0) === orders,
      "every positive-value order lands in exactly one bucket")
    assert(out.filter(col("min_cents") < col("lo") ||
      col("max_cents") > col("hi")).isEmpty,
      "observed extremes stay inside the power-of-two bounds")
    assert(out.filter(col("hi") =!= col("lo") * 2 - 1).isEmpty)
    out.unpersist()
  }
}
