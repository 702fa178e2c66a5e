package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-69 gate queries. */
class Round69QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("mix stability: TV bounded by 1, unstable days bounded") {
    val out = graft.SparkEntry.queries("q364_daily_mix_stability")(spark, dir)
      .cache()
    val r = out.first()
    assert(r.getAs[Long]("n_days") > 0)
    assert(r.getAs[Double]("max_tv") >= 0.0 &&
      r.getAs[Double]("max_tv") <= 1.0,
      "total variation distance lives in [0,1]")
    assert(r.getAs[Long]("n_unstable") <= r.getAs[Long]("n_days"))
    out.unpersist()
  }

  test("post-peak decay: retention consistent with counts") {
    val out = graft.SparkEntry.queries("q365_post_peak_decay")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("peak_events") < 1).isEmpty)
    // when the next calendar day exists, retention <= 1 (peak is max)
    assert(out.filter(col("retention").isNotNull &&
      col("retention") > 1.0 + 1e-12).isEmpty)
    out.unpersist()
  }

  test("template census: reuse ratio >= 1, sources bounded by docs") {
    val out = graft.SparkEntry.queries("q366_template_census")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("reuse_ratio") < 1.0 - 1e-12).isEmpty)
    assert(out.filter(col("n_sources") > col("n_docs")).isEmpty)
    assert(out.filter(col("n_texts") > col("n_docs")).isEmpty)
    out.unpersist()
  }

  test("tail heaviness: ratios at least 1") {
    val out = graft.SparkEntry.queries("q367_tail_heaviness")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("p99_over_p50") < 1.0 - 1e-12).isEmpty,
      "P99 >= P50 always")
    assert(out.filter(col("max_over_p99") < 1.0 - 1e-12).isEmpty,
      "max >= P99 always")
    out.unpersist()
  }

  test("factorial effects: interactions are zero-sum over the grid") {
    val out = graft.SparkEntry.queries("q368_hour_weekpart_effects")(
      spark, dir).cache()
    assert(out.count() === 4, "2x2 factorial grid")
    // weighted by cell counts, interaction effects cancel exactly
    val weighted = out
      .agg(sum(col("interaction") * col("n_events"))).first().getDouble(0)
    val total = out.agg(sum("n_events")).first().getLong(0)
    assert(math.abs(weighted / total) < 1e-6,
      "count-weighted interactions sum to ~0")
    out.unpersist()
  }
}
