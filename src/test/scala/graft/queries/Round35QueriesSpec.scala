package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-35 gate queries. */
class Round35QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("simpson: probabilities bounded, complement consistent") {
    val out = graft.SparkEntry.queries("q269_simpson_diversity")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("simpson") < 0.0 || col("simpson") > 1.0).isEmpty,
      "Simpson's index is a probability")
    assert(out.filter(abs(col("diversity") - (lit(1.0) - col("simpson")))
      > 1e-12).isEmpty)
    assert(out.filter(col("n_terms") > col("n_tokens")).isEmpty,
      "distinct terms can never exceed total tokens")
    out.unpersist()
  }

  test("hellinger: bounded distance, h2 consistent, drift is nonzero") {
    val out = graft.SparkEntry.queries("q270_hellinger_drift")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("h2") < -1e-12 || col("h2") > 1.0 + 1e-12).isEmpty,
      "squared Hellinger distance lies in [0, 1]")
    assert(out.filter(abs(col("hellinger") * col("hellinger") - col("h2"))
      > 1e-12).isEmpty)
    assert(out.filter(col("n_shared_terms") > col("n_tokens")).isEmpty)
    // sources draw from distinct vocabularies, so none coincides with
    // the pooled corpus distribution exactly
    assert(out.filter(col("h2") <= 0.0).isEmpty)
    out.unpersist()
  }
}
