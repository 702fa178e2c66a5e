package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-56 gate query. */
class Round56QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("waterfall: accounting identities close year by year") {
    val out = graft.SparkEntry.queries("q303_revenue_waterfall")(spark, dir)
      .cache()
    assert(out.count() >= 5)
    // gross - discount = net, exactly (both sides exact decimal sums)
    assert(out.filter(abs(col("gross") - col("discount_given") - col("net"))
      > lit(1e-6)).isEmpty, "the waterfall conserves money")
    assert(out.filter(col("discount_rate") < 0.0 ||
      col("discount_rate") > 0.2).isEmpty,
      "discounts are 0-10 percent in this data, rate stays low")
    assert(out.filter(col("effective_tax_rate") < 0.0 ||
      col("effective_tax_rate") > 0.2).isEmpty)
    out.unpersist()
  }
}
