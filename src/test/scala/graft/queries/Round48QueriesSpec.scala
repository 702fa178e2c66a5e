package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-48 gate query. */
class Round48QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("multi distinct: inclusion bounds between the distinct grains") {
    val out = graft.SparkEntry.queries("q294_multi_distinct")(spark, dir)
      .cache()
    assert(out.count() === 5)
    // pairs are at least as numerous as either margin, at most n_orders
    assert(out.filter(col("n_cust_days") < col("n_custs") ||
      col("n_cust_days") < col("n_days") ||
      col("n_cust_days") > col("n_orders")).isEmpty)
    assert(out.filter(col("orders_per_cust_day") < 1.0).isEmpty,
      "every (customer, day) pair has at least one order")
    // the plan stays on the hash path despite three distinct groups
    val plan = graft.SparkEntry.queries("q294_multi_distinct")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "multi-distinct plans an Expand")
    assert(!plan.contains("SortAggregate"),
      "all aggregate buffers stay hashable")
    out.unpersist()
  }
}
