package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-67 gate queries. */
class Round67QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("neyman: allocation shares sum to 1, floors fit the budget") {
    val out = graft.SparkEntry.queries("q354_neyman_allocation")(spark, dir)
      .cache()
    assert(math.abs(out.agg(sum("alloc_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    assert(out.agg(sum("alloc_n")).first().getLong(0) <= 1000,
      "floored allocations never exceed the budget")
    assert(out.filter(col("sd") < 0.0).isEmpty)
    out.unpersist()
  }

  test("dedup savings: after never exceeds before") {
    val out = graft.SparkEntry.queries("q355_dedup_savings")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("docs_after") > col("docs_before")).isEmpty)
    assert(out.filter(col("bytes_after") > col("bytes_before")).isEmpty)
    assert(out.filter(col("savings_rate") < 0.0 ||
      col("savings_rate") >= 1.0).isEmpty)
    out.unpersist()
  }

  test("sequence asymmetry: first-counts partition the tied-free users") {
    val out = graft.SparkEntry.queries("q356_sequence_asymmetry")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("a_first") + col("b_first") > col("n_users"))
      .isEmpty, "ties are the only users not counted either way")
    assert(out.filter(col("a_first_rate") < 0.0 ||
      col("a_first_rate") > 1.0).isEmpty)
    out.unpersist()
  }

  test("funnel latency: percentiles ordered") {
    val out = graft.SparkEntry.queries("q357_funnel_latency")(spark, dir)
      .cache()
    val r = out.first()
    assert(r.getAs[Long]("n_converted") > 0)
    assert(r.getAs[Long]("p25_s") <= r.getAs[Long]("p50_s"))
    assert(r.getAs[Long]("p50_s") <= r.getAs[Long]("p90_s"))
    assert(r.getAs[Long]("p90_s") <= r.getAs[Long]("max_s"))
    assert(r.getAs[Long]("p25_s") >= 0L)
    out.unpersist()
  }

  test("brand loyalty: segments partition customers and revenue") {
    val out = graft.SparkEntry.queries("q358_brand_loyalty")(spark, dir)
      .cache()
    assert(math.abs(out.agg(sum("customer_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    assert(math.abs(out.agg(sum("revenue_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    assert(out.filter(col("rev_per_customer") <= 0.0).isEmpty)
    out.unpersist()
  }
}
