package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-74 gate queries. */
class Round74QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("novelty decay: first decile is fully novel") {
    val out = graft.SparkEntry.queries("q389_novelty_by_ingestion")(spark, dir)
      .orderBy("decile").cache()
    val first = out.first()
    assert(math.abs(first.getAs[Double]("novelty_rate") - 1.0) < 1e-12,
      "every shingle in the first decile first occurs there")
    assert(out.filter(col("novelty_rate") < 0.0 ||
      col("novelty_rate") > 1.0).isEmpty)
    assert(out.filter(col("novel") > col("n_shingles")).isEmpty)
    out.unpersist()
  }

  test("brand seasonality: swing consistent with min/max") {
    val out = graft.SparkEntry.queries("q390_brand_seasonal_swing")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("min_share") > col("max_share")).isEmpty)
    assert(out.filter(abs(col("swing") -
      (col("max_share") - col("min_share"))) > 1e-12).isEmpty)
    assert(out.filter(col("min_share") < 0.0 ||
      col("max_share") > 1.0).isEmpty)
    out.unpersist()
  }

  test("fano factor: non-negative with positive means") {
    val out = graft.SparkEntry.queries("q391_fano_factor")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("fano") < 0.0).isEmpty)
    assert(out.filter(col("mean_daily") <= 0.0).isEmpty)
    out.unpersist()
  }

  test("quiet periods: resumption follows the gap start") {
    val out = graft.SparkEntry.queries("q392_longest_quiet_period")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("max_quiet_days") < 0).isEmpty)
    assert(out.filter(col("resumed_on") <= col("quiet_started_after"))
      .isEmpty)
    out.unpersist()
  }

  test("activity histogram: shares partition users and events") {
    val out = graft.SparkEntry.queries("q393_activity_histogram")(spark, dir)
      .cache()
    assert(math.abs(out.agg(sum("user_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    assert(math.abs(out.agg(sum("event_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    assert(out.filter(col("bucket") < 0).isEmpty)
    out.unpersist()
  }
}
