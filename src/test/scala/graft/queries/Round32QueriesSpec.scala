package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-32 gate queries. */
class Round32QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("proration: every order's allocations sum exactly to the budget") {
    val out = graft.SparkEntry.queries("q259_proration")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("order_total") =!= 1000000L).isEmpty,
      "largest-remainder must conserve the budget exactly")
    // each allocation is within one unit of the exact proportional share:
    // base ≤ alloc ≤ base+1  ⇔  -tot < alloc·tot − B·cents ≤ tot
    val w = Window.partitionBy("l_orderkey")
    val bounds = out.withColumn("tot", sum(col("cents")).over(w))
      .withColumn("delta",
        col("alloc") * col("tot") - lit(1000000L) * col("cents"))
    assert(bounds.filter(col("delta") <= -col("tot") ||
      col("delta") > col("tot")).isEmpty,
      "every allocation stays within one unit of the exact share")
    out.unpersist()
  }

  test("spearman: bounded, full-coverage years, rank symmetry") {
    val out = graft.SparkEntry.queries("q260_spearman")(spark, dir).cache()
    assert(out.count() >= 5, "the order history spans multiple years")
    assert(out.filter(col("spearman") < -1.0 || col("spearman") > 1.0).isEmpty,
      "a correlation must lie in [-1, 1]")
    assert(out.filter(col("n_days") < 10).isEmpty,
      "every kept year aggregates a real daily series")
    out.unpersist()
  }

  test("rfm: segments partition the customer base with valid codes") {
    val out = graft.SparkEntry.queries("q261_rfm_segments")(spark, dir).cache()
    val custs = graft.Tables.load(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(out.agg(sum("n_customers")).head().getLong(0) === custs,
      "every ordering customer lands in exactly one segment")
    val digitsOk = out.filter(
      col("segment") % 10 < 1 || col("segment") % 10 > 5 ||
        expr("(segment % 100) div 10") < 1 ||
        expr("(segment % 100) div 10") > 5 ||
        expr("segment div 100") < 1 || expr("segment div 100") > 5)
    assert(digitsOk.isEmpty, "segment digits are quintile codes 1-5")
    out.unpersist()
  }

  test("knn classify: one verdict per held-out vector, votes within k") {
    val out = graft.SparkEntry.queries("q262_knn_classify")(spark, dir).cache()
    val holdout = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 10 === 0).count()
    assert(out.count() === holdout, "every held-out vector gets a label")
    assert(out.select("q_id").distinct().count() === holdout)
    assert(out.filter(col("votes") < 1 || col("votes") > 7).isEmpty,
      "the winning label's votes come from the 7 nearest neighbors")
    out.unpersist()
  }
}
