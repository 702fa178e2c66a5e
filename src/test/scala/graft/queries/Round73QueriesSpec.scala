package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-73 gate queries. */
class Round73QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("single-source risk: shares partition parts and revenue") {
    val out = graft.SparkEntry.queries("q384_single_source_risk")(spark, dir)
      .cache()
    assert(math.abs(out.agg(sum("part_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    assert(math.abs(out.agg(sum("revenue_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    assert(out.filter(col("n_suppliers") < 1).isEmpty)
    out.unpersist()
  }

  test("sequence position: bands cover every event") {
    val out = graft.SparkEntry.queries("q385_seq_position_value")(spark, dir)
      .cache()
    val total = out.agg(sum("n_events")).first().getLong(0)
    assert(total === graft.Tables.load(spark, dir, "events").count())
    assert(out.filter(col("band") < 0).isEmpty)
    assert(out.filter(col("mean_value") < 0.0).isEmpty)
    out.unpersist()
  }

  test("retention triangle: week zero retains the full cohort") {
    val out = graft.SparkEntry.queries("q386_retention_triangle")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("wk_idx") === 0 &&
      abs(col("retention") - 1.0) > 1e-12).isEmpty,
      "every user is active in their cohort week")
    assert(out.filter(col("retention") < 0.0 ||
      col("retention") > 1.0).isEmpty)
    assert(out.filter(col("users") > col("cohort_size")).isEmpty)
    out.unpersist()
  }

  test("topk stability: overlap bounded by k") {
    val out = graft.SparkEntry.queries("q387_topk_stability")(spark, dir)
      .cache()
    val r = out.first()
    assert(r.getAs[Long]("n_overlap") >= 0L &&
      r.getAs[Long]("n_overlap") <= 20L)
    val j = r.getAs[Double]("jaccard")
    assert(j >= 0.0 && j <= 1.0)
    out.unpersist()
  }

  test("seasonal autocorr: coefficients bounded") {
    val out = graft.SparkEntry.queries("q388_hourly_seasonal_autocorr")(
      spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(abs(col("autocorr_24h")) > 1.0 + 1e-12).isEmpty)
    assert(out.filter(col("n_pairs") < 2).isEmpty)
    out.unpersist()
  }
}
