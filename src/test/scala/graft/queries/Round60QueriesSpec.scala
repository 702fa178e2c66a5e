package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-60 gate queries. */
class Round60QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("supplier churn: retained + churned = active, rate in [0,1]") {
    val out = graft.SparkEntry.queries("q319_supplier_churn")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("churned") < 0 || col("new_next") < 0).isEmpty,
      "retained can exceed neither year's active set")
    assert(out.filter(col("retention_rate") < 0.0 ||
      col("retention_rate") > 1.0).isEmpty)
    out.unpersist()
  }

  test("reorder intervals: non-negative gaps, mean <= max") {
    val out = graft.SparkEntry.queries("q320_reorder_intervals")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("total_gap_days") < 0).isEmpty)
    assert(out.filter(col("mean_gap_days") > col("max_gap_days")
      .cast("double") + lit(1e-9)).isEmpty)
    out.unpersist()
  }

  test("mix shift: endpoint shares each sum to 1, deltas cancel") {
    val out = graft.SparkEntry.queries("q321_priority_mix_shift")(spark, dir)
      .cache()
    val sums = out.agg(sum("share_first"), sum("share_last"), sum("delta"))
      .first()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-9)
    assert(math.abs(sums.getDouble(2)) < 1e-9, "share deltas are zero-sum")
    out.unpersist()
  }

  test("discount-qty corr: coefficients bounded") {
    val out = graft.SparkEntry.queries("q322_discount_qty_corr")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(abs(col("corr")) > 1.0 + 1e-12).isEmpty)
    out.unpersist()
  }

  test("trade balance: balances are globally zero-sum") {
    val out = graft.SparkEntry.queries("q323_nation_trade_balance")(spark, dir)
      .cache()
    assert(out.count() > 0)
    // every shipped line is exported by one nation and imported by
    // another (possibly the same), so world exports = world imports
    val sums = out.agg(sum("exports"), sum("imports"), sum("balance")).first()
    assert(math.abs(sums.getDouble(0) - sums.getDouble(1)) < 1e-6)
    assert(math.abs(sums.getDouble(2)) < 1e-6)
    out.unpersist()
  }
}
