package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-43 gate queries. */
class Round43QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("peak rate: every user scored, peak bounded by activity") {
    val out = graft.SparkEntry.queries("q286_peak_rate")(spark, dir).cache()
    val users = graft.Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(out.count() === users)
    assert(out.filter(col("peak_60s") < 1).isEmpty,
      "the window containing an event counts at least itself")
    assert(out.filter(col("peak_60s") > col("n_events")).isEmpty,
      "no minute can contain more events than the user produced")
    out.unpersist()
  }

  test("minhash calibration: estimates and truths are probabilities, " +
    "identical docs would agree") {
    val out = graft.SparkEntry.queries("q287_minhash_calibration")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("est_jaccard") < 0.0 || col("est_jaccard") > 1.0)
      .isEmpty)
    assert(out.filter(col("exact_jaccard") < 0.0 ||
      col("exact_jaccard") > 1.0).isEmpty)
    assert(out.filter(col("abs_err") < 0.0 || col("abs_err") > 1.0).isEmpty)
    // the error column really is |est - exact|
    assert(out.filter(abs(col("abs_err") -
      abs(col("est_jaccard") - col("exact_jaccard"))) > 1e-12).isEmpty)
    out.unpersist()
  }
}
