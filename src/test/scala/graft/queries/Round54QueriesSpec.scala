package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-54 gate query. */
class Round54QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("revenue bridge: effects reconstruct the delta") {
    val out = graft.SparkEntry.queries("q301_revenue_bridge")(spark, dir)
      .cache()
    assert(out.count() > 0)
    // volume + rate + interaction = delta (algebraic identity; the
    // doubles agree to rounding noise)
    val bad = out.filter(abs(col("volume_effect") + col("rate_effect") +
      col("interaction") - col("delta")) >
      lit(1e-6) * abs(col("delta")) + lit(1e-6))
    assert(bad.isEmpty, "the decomposition closes")
    assert(out.filter(abs(col("delta") -
      (col("rev_y2") - col("rev_y1"))) > 1e-6).isEmpty)
    // consecutive-year pairs only: every yr has a yr+1 in the data
    assert(out.filter(col("n1") <= 0 || col("n2") <= 0).isEmpty)
    out.unpersist()
  }
}
