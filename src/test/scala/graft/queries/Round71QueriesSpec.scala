package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-71 gate queries. */
class Round71QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kruskal-wallis: H non-negative, mean ranks centered") {
    val out = graft.SparkEntry.queries("q374_kruskal_wallis")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("kw_h") < -1e-9).isEmpty)
    // count-weighted mean rank is exactly (N+1)/2
    val nTot = out.agg(sum("n_orders")).first().getLong(0)
    val weighted = out.agg(sum(col("mean_rank") * col("n_orders")))
      .first().getDouble(0)
    assert(math.abs(weighted / nTot - (nTot + 1) / 2.0) < 1e-6)
    out.unpersist()
  }

  test("monthly quantiles: ordered within each month") {
    val out = graft.SparkEntry.queries("q375_monthly_value_quantiles")(
      spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("p50_cents") > col("p90_cents")).isEmpty)
    assert(out.filter(col("p90_cents") > col("p99_cents")).isEmpty)
    out.unpersist()
  }

  test("normalization tiers: each tier collapses at least as much") {
    val out = graft.SparkEntry.queries("q376_normalization_tiers")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("distinct_exact") > col("n_docs")).isEmpty)
    assert(out.filter(col("distinct_lower") > col("distinct_exact")).isEmpty,
      "lowercasing can only merge keys")
    assert(out.filter(col("distinct_norm") > col("distinct_lower")).isEmpty,
      "whitespace collapse can only merge further")
    assert(out.filter(col("extra_collapsed") < 0).isEmpty)
    out.unpersist()
  }

  test("stratified independence: chi2 non-negative per band") {
    val out = graft.SparkEntry.queries("q377_stratified_independence")(
      spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("chi2") < -1e-9).isEmpty)
    assert(out.filter(col("n_cells") < 1).isEmpty)
    out.unpersist()
  }

  test("early value share: shares bounded in [0,1]") {
    val out = graft.SparkEntry.queries("q378_early_value_share")(spark, dir)
      .cache()
    val r = out.first()
    assert(r.getAs[Long]("n_users") > 0)
    val pooled = r.getAs[Double]("pooled_share")
    val med = r.getAs[Double]("median_user_share")
    assert(pooled >= 0.0 && pooled <= 1.0)
    assert(med >= 0.0 && med <= 1.0)
    out.unpersist()
  }
}
