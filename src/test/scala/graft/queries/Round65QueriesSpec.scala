package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-65 gate queries. */
class Round65QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("clip plan: thresholds ordered, clip rate near 2 percent") {
    val out = graft.SparkEntry.queries("q344_embedding_clip_plan")(spark, dir)
      .cache()
    assert(out.count() === 8)
    assert(out.filter(col("lo") > col("hi")).isEmpty)
    // P1/P99 clipping removes at most ~2% + discreteness slack
    assert(out.filter(col("clip_rate") > 0.05).isEmpty)
    out.unpersist()
  }

  test("basket depth: mean line value consistent with order value") {
    val out = graft.SparkEntry.queries("q345_basket_depth_curve")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(abs(col("mean_line_value") * col("depth") -
      col("mean_order_value")) > 1e-6).isEmpty,
      "order value = line value x depth by construction")
    out.unpersist()
  }

  test("ab srm: arms partition the corpus, chi2 small for a fair hash") {
    val out = graft.SparkEntry.queries("q346_ab_srm_check")(spark, dir)
      .cache()
    val r = out.first()
    val total = r.getAs[Long]("arm_a") + r.getAs[Long]("arm_b")
    assert(total === graft.Tables.load(spark, dir, "documents").count())
    // md5 parity is fair: the SRM statistic stays far below the
    // p=0.001 chi-square threshold (10.8) on any honest split
    assert(r.getAs[Double]("srm_chi2") < 10.8)
    out.unpersist()
  }

  test("peak days: peaks bounded by interior days") {
    val out = graft.SparkEntry.queries("q347_peak_days")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_peaks") > col("n_interior_days")).isEmpty)
    assert(out.filter(col("peak_rate") < 0.0 ||
      col("peak_rate") > 1.0).isEmpty)
    // a strict local maximum can occur at most every other day
    assert(out.filter(col("peak_rate") > 0.5 + 1e-12).isEmpty)
    out.unpersist()
  }

  test("postings gaps: max gap at least the mean gap") {
    val out = graft.SparkEntry.queries("q348_postings_gaps")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("max_gap") < 1).isEmpty)
    assert(out.filter(col("max_gap").cast("double") + lit(1e-9) <
      col("mean_gap")).isEmpty, "max >= mean for any gap distribution")
    out.unpersist()
  }
}
