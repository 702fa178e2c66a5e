package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-13 gate queries. */
class Round13QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx percentiles honor the sketch accuracy bound vs exact order statistics") {
    // the gate now emits in-band FLAGS (oracle-pinnable); the raw
    // estimates are still pinned here, computed with the gate's exact
    // sketch parameters
    val raw = graft.Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_percentile(col("l_extendedprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"),
        expr("percentile(l_extendedprice, 0.4)").as("e40"),
        expr("percentile(l_extendedprice, 0.6)").as("e60"),
        expr("percentile(l_extendedprice, 0.85)").as("e85"),
        expr("percentile(l_extendedprice, 0.95)").as("e95"))
      .select(col("l_returnflag"),
        element_at(col("ap"), 1).as("p50"),
        element_at(col("ap"), 2).as("p90"),
        element_at(col("ap"), 3).as("p99"),
        col("e40"), col("e60"), col("e85"), col("e95"))
    // accuracy 10000 on ~2k-row groups: rank error well inside ±10%
    assert(raw.filter(col("p50") < col("e40") || col("p50") > col("e60")).isEmpty)
    assert(raw.filter(col("p90") < col("e85") || col("p90") > col("e95")).isEmpty)
    assert(raw.filter(col("p50") > col("p90") || col("p90") > col("p99")).isEmpty)
    // and the gate's own band flags must all hold
    val out = graft.SparkEntry.queries("q190_approx_percentile")(spark, dir)
    assert(out.filter(col("p50_in_band") =!= 1 || col("p90_in_band") =!= 1 ||
      col("p99_in_band") =!= 1).isEmpty)
  }

  test("disjunctive join equals the naive OR join, duplicates deduplicated") {
    val out = graft.SparkEntry.queries("q191_disjunctive_join")(spark, dir).cache()
    val o = graft.Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_orderkey") % 1500).as("gift_key"))
    val c = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    val naive = o.join(c,
        col("o_custkey") === col("c_custkey") ||
          col("gift_key") === col("c_custkey"))
      .select("o_orderkey", "c_custkey", "c_acctbal").distinct()
    assert(out.count() === naive.count())
    assert(out.exceptAll(naive).isEmpty && naive.exceptAll(out).isEmpty)
    out.unpersist()
  }
}
