package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-52 gate query. */
class Round52QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fk integrity: five edges audited, orphans bounded, dims clean") {
    val out = graft.SparkEntry.queries("q298_fk_integrity")(spark, dir).cache()
    assert(out.count() === 5)
    assert(out.filter(col("n_orphans") > col("n_rows")).isEmpty)
    assert(out.filter(col("orphan_share") < 0.0 ||
      col("orphan_share") > 1.0).isEmpty)
    // the synthetic star is referentially clean against its dims
    val dimEdges = out.filter(col("fk_edge").isin(
      "customer->nation", "supplier->nation"))
    assert(dimEdges.filter(col("n_orphans") =!= 0L).isEmpty,
      "nation keys always resolve")
    out.unpersist()
  }
}
