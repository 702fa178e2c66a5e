package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-70 gate queries. */
class Round70QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("winsorize effect: clipping can only shrink variance") {
    val out = graft.SparkEntry.queries("q369_winsorize_effect")(spark, dir)
      .cache()
    assert(out.count() === 8)
    assert(out.filter(col("wins_var") > col("raw_var") + 1e-12).isEmpty,
      "winsorization never increases variance")
    assert(out.filter(col("var_ratio") < 0.0 ||
      col("var_ratio") > 1.0 + 1e-12).isEmpty)
    out.unpersist()
  }

  test("part-name lift: support-weighted lifts recover the global mean") {
    val out = graft.SparkEntry.queries("q370_part_name_lift")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("lift") <= 0.0).isEmpty)
    assert(out.filter(col("mean_rev") <= 0.0).isEmpty)
    out.unpersist()
  }

  test("props corr: coefficients bounded") {
    val out = graft.SparkEntry.queries("q371_props_value_corr")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(abs(col("corr")) > 1.0 + 1e-12).isEmpty)
    out.unpersist()
  }

  test("robust anomalies: bounded by day count, mad non-negative") {
    val out = graft.SparkEntry.queries("q372_robust_anomaly_days")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_anomalies") > col("n_days")).isEmpty)
    assert(out.filter(col("mad") < 0).isEmpty)
    // by definition of the median, at least half the days sit within
    // one MAD — anomaly rate beyond 3 MAD can never reach 50%
    assert(out.filter(col("anomaly_rate") >= 0.5).isEmpty)
    out.unpersist()
  }

  test("mean ci: interval brackets the mean and is symmetric") {
    val out = graft.SparkEntry.queries("q373_mean_ci")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("ci_lo") > col("mean_chars")).isEmpty)
    assert(out.filter(col("ci_hi") < col("mean_chars")).isEmpty)
    assert(out.filter(abs((col("ci_hi") - col("mean_chars")) -
      (col("mean_chars") - col("ci_lo"))) > 1e-9).isEmpty,
      "normal CI is symmetric about the mean")
    out.unpersist()
  }
}
