package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-15 gate queries. */
class Round15QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("matryoshka: retained energy is a fraction; head energy bounded by full") {
    val out = graft.SparkEntry.queries("q194_matryoshka")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("retained") < 0 || col("retained") > 1).isEmpty)
    assert(out.filter(col("e_head") > col("e_full")).isEmpty)
    out.unpersist()
  }

  test("temperature mixing: weights sum to 1 and compress the raw shares") {
    val out = graft.SparkEntry.queries("q195_temperature_mix")(spark, dir).cache()
    assert(out.count() > 1)
    val sums = out.agg(sum(col("mix_weight")).as("mw"), sum(col("raw_share")).as("rs"))
      .head()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-12)
    // alpha < 1 compresses toward uniform: above-average sources lose
    // weight, below-average gain, average-sized keep exactly their
    // share (the sf0.001 corpus is uniform, so equality must hold)
    val k = out.count().toDouble
    assert(out.filter(col("raw_share") > 1.0 / k + 1e-12 &&
      col("mix_weight") >= col("raw_share")).isEmpty)
    assert(out.filter(col("raw_share") < 1.0 / k - 1e-12 &&
      col("mix_weight") <= col("raw_share")).isEmpty)
    assert(out.filter(abs(col("raw_share") - 1.0 / k) <= 1e-12 &&
      abs(col("mix_weight") - col("raw_share")) > 1e-12).isEmpty)
    out.unpersist()
  }
}
