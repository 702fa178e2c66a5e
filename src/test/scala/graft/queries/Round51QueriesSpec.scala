package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-51 gate query. */
class Round51QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cvar: tail mean below the boundary, tail sized ceil(n/20)") {
    val out = graft.SparkEntry.queries("q297_cvar")(spark, dir).cache()
    assert(out.count() >= 5)
    assert(out.filter(col("cvar_5pct") > col("var_5pct")).isEmpty,
      "the mean of the worst days can never exceed the VaR boundary")
    assert(out.filter(col("tail_days") =!=
      expr("(n_days + 19) div 20")).isEmpty, "tail size is ceil(n/20)")
    assert(out.filter(col("cvar_5pct") <= 0.0).isEmpty,
      "revenue is positive")
    out.unpersist()
  }
}
