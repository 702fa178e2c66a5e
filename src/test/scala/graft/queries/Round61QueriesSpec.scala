package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-61 gate queries. */
class Round61QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("returns trend: rates bounded, returned never exceeds total") {
    val out = graft.SparkEntry.queries("q324_returns_trend")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_returned") > col("n_lines")).isEmpty)
    assert(out.filter(col("return_rate") < 0.0 ||
      col("return_rate") > 1.0).isEmpty)
    assert(out.filter(col("value_return_rate") < 0.0 ||
      col("value_return_rate") > 1.0).isEmpty)
    out.unpersist()
  }

  test("fulfillment progress: buckets in 0..10, shares sum to 1 per year") {
    val out = graft.SparkEntry.queries("q325_fulfillment_progress")(spark, dir)
      .cache()
    assert(out.filter(col("bucket") < 0 || col("bucket") > 10).isEmpty)
    val perYear = out.groupBy("yr").agg(sum("share").as("s")).collect()
    assert(perYear.nonEmpty)
    perYear.foreach(r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, s"year ${r.get(0)}"))
    out.unpersist()
  }

  test("line position effect: position 1 is its own baseline") {
    val out = graft.SparkEntry.queries("q326_line_position_effect")(spark, dir)
      .cache()
    val first = out.filter(col("pos") === 1).first()
    assert(math.abs(first.getAs[Double]("vs_first") - 1.0) < 1e-12)
    assert(out.filter(col("vs_first") <= 0.0).isEmpty)
    assert(out.filter(col("mean_qty") <= 0.0).isEmpty)
    // total lines reconcile with the fact table
    val total = out.agg(sum("n_lines")).first().getLong(0)
    assert(total === graft.Tables.load(spark, dir, "lineitem").count())
    out.unpersist()
  }

  test("sourcing complexity: shares sum to 1, nations bounded by suppliers") {
    val out = graft.SparkEntry.queries("q327_sourcing_complexity")(spark, dir)
      .cache()
    val sums = out.agg(sum("order_share"), sum("revenue_share")).first()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-9)
    assert(out.filter(col("max_nations") > col("n_supp")).isEmpty,
      "an order cannot touch more nations than suppliers")
    out.unpersist()
  }

  test("dom uniformity: observed totals reconcile with expectation") {
    val out = graft.SparkEntry.queries("q328_dom_uniformity")(spark, dir)
      .cache()
    assert(out.count() === 31)
    assert(out.filter(col("chi2_part") < 0.0).isEmpty)
    val obsSum = out.agg(sum("obs")).first().getLong(0)
    val expSum = out.agg(sum("expected")).first().getDouble(0)
    assert(math.abs(obsSum.toDouble - expSum) < 1e-6,
      "expected counts sum to the observed total")
    out.unpersist()
  }
}
