package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-50 gate query. */
class Round50QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("band migration: full 4x4 matrix with stochastic rows") {
    val out = graft.SparkEntry.queries("q296_band_migration")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("band_from") < 1 || col("band_from") > 4 ||
      col("band_to") < 1 || col("band_to") > 4).isEmpty)
    assert(out.filter(col("share") <= 0.0 || col("share") > 1.0).isEmpty)
    // each from-band's shares sum to exactly 1
    val rows = out.groupBy("band_from")
      .agg(sum("share").as("s")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"band ${r.getLong(0)} shares must sum to 1"))
    out.unpersist()
  }
}
