package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-42 gate queries. */
class Round42QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("decile lift: capture is monotone to 1.0, lift decays to 1.0") {
    val out = graft.SparkEntry.queries("q284_decile_lift")(spark, dir).cache()
    assert(out.count() === 10, "ten deciles")
    val rows = out.orderBy("decile").collect()
    val captures = rows.map(_.getAs[Double]("capture"))
    assert(captures.zip(captures.tail).forall { case (a, b) => b >= a },
      "cumulative capture never decreases")
    assert(math.abs(captures.last - 1.0) < 1e-12,
      "the full population captures every positive")
    assert(math.abs(rows.last.getAs[Double]("lift") - 1.0) < 1e-12,
      "lift over the whole population is exactly 1")
    val custs = graft.Tables.load(spark, dir, "customer").count()
    assert(out.agg(sum("n")).head().getLong(0) === custs)
    out.unpersist()
  }

  test("lead time: ordered percentiles bracketed by observed extremes") {
    val out = graft.SparkEntry.queries("q285_lead_time")(spark, dir).cache()
    assert(out.count() === 5, "one row per priority")
    assert(out.filter(col("p50") > col("p90") || col("p90") > col("p99"))
      .isEmpty, "percentiles are ordered")
    assert(out.filter(col("mean_days") < col("p50") - 100.0 ||
      col("mean_days") > col("p99").cast("double")).isEmpty,
      "the mean sits inside the distribution")
    assert(out.filter(col("p50") < 0).isEmpty,
      "lineitems never ship before the order date")
    out.unpersist()
  }
}
