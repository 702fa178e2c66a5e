package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-64 gate queries. */
class Round64QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("lorenz: shares sum to 1, cumulative share is convex-monotone") {
    val out = graft.SparkEntry.queries("q339_lorenz_points")(spark, dir)
      .orderBy("decile").cache()
    assert(out.count() === 10)
    assert(math.abs(out.agg(sum("rev_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    val cum = out.select("cum_share").collect().map(_.getDouble(0))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b + 1e-12 })
    assert(math.abs(cum.last - 1.0) < 1e-9)
    // deciles are revenue-ascending, so shares are non-decreasing too
    val shares = out.select("rev_share").collect().map(_.getDouble(0))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b + 1e-12 })
    out.unpersist()
  }

  test("repeat cohorts: customers partition, rates bounded") {
    val out = graft.SparkEntry.queries("q340_repeat_rate_cohort")(spark, dir)
      .cache()
    val customers = graft.Tables.load(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(out.agg(sum("n_customers")).first().getLong(0) === customers)
    assert(out.filter(col("repeat_rate") < 0.0 ||
      col("repeat_rate") > 1.0).isEmpty)
    assert(out.filter(col("mean_orders") < 1.0 - 1e-12).isEmpty)
    out.unpersist()
  }

  test("new-product share: first year is 100% new by construction") {
    val out = graft.SparkEntry.queries("q341_new_product_share")(spark, dir)
      .orderBy("yr").cache()
    val first = out.first()
    assert(math.abs(first.getAs[Double]("new_share") - 1.0) < 1e-12,
      "every part sold in the first year is new that year")
    assert(out.filter(col("new_share") < 0.0 ||
      col("new_share") > 1.0).isEmpty)
    assert(out.filter(col("new_rev") > col("total_rev")).isEmpty)
    out.unpersist()
  }

  test("weekend effect: lift consistent with the two means") {
    val out = graft.SparkEntry.queries("q342_weekend_effect")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("weekend_lift") <= 0.0).isEmpty)
    assert(out.filter(abs(col("weekend_lift") -
      col("we_mean") / col("wd_mean")) > 1e-9).isEmpty)
    out.unpersist()
  }

  test("nation growth: growth reconciles with the endpoint revenues") {
    val out = graft.SparkEntry.queries("q343_nation_growth")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("rev_first") <= 0.0).isEmpty)
    assert(out.filter(abs(col("growth") -
      (col("rev_last") - col("rev_first")) / col("rev_first")) > 1e-9)
      .isEmpty)
    assert(out.filter(col("y_first") > col("y_last")).isEmpty)
    out.unpersist()
  }
}
