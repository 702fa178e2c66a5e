package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-55 gate query. */
class Round55QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("hhi: bounded by 1/n and 1, effective size within [1, n]") {
    val out = graft.SparkEntry.queries("q302_market_hhi")(spark, dir).cache()
    assert(out.count() > 0)
    // HHI of n shares lies in [1/n, 1]
    assert(out.filter(col("hhi") >
      lit(1.0) + 1e-9).isEmpty)
    assert(out.filter(col("hhi") * col("n_suppliers").cast("double") <
      lit(1.0) - 1e-9).isEmpty, "HHI >= 1/n (equality iff equal shares)")
    assert(out.filter(col("effective_suppliers") <
      lit(1.0) - 1e-9).isEmpty)
    assert(out.filter(col("effective_suppliers") >
      col("n_suppliers").cast("double") + 1e-9).isEmpty,
      "effective suppliers can never exceed actual suppliers")
    out.unpersist()
  }
}
