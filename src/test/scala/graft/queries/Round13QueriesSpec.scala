package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-13 gate queries. */
class Round13QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx percentiles honor the sketch accuracy bound vs exact order statistics") {
    val out = graft.SparkEntry.queries("q190_approx_percentile")(spark, dir).cache()
    val exact = graft.Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.4)").as("e40"),
        expr("percentile(l_extendedprice, 0.6)").as("e60"),
        expr("percentile(l_extendedprice, 0.85)").as("e85"),
        expr("percentile(l_extendedprice, 0.95)").as("e95"))
    val j = out.join(exact, "l_returnflag")
    // accuracy 10000 on ~2k-row groups: rank error well inside ±10%
    assert(j.filter(col("p50") < col("e40") || col("p50") > col("e60")).isEmpty)
    assert(j.filter(col("p90") < col("e85") || col("p90") > col("e95")).isEmpty)
    assert(j.filter(col("p50") > col("p90") || col("p90") > col("p99")).isEmpty)
    out.unpersist()
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
