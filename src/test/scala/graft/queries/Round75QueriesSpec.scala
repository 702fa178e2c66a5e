package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-75 gate queries. */
class Round75QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rank divergence: divergent days bounded by the calendar") {
    val out = graft.SparkEntry.queries("q394_rank_divergence_days")(spark, dir)
      .cache()
    val r = out.first()
    assert(r.getAs[Long]("n_divergent") <= r.getAs[Long]("n_days"))
    assert(r.getAs[Long]("max_rank_gap") < r.getAs[Long]("n_days"))
    val rate = r.getAs[Double]("divergent_rate")
    assert(rate >= 0.0 && rate <= 1.0)
    out.unpersist()
  }

  test("shingle df spectrum: type shares partition the vocabulary") {
    val out = graft.SparkEntry.queries("q395_shingle_df_spectrum")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(math.abs(out.agg(sum("type_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    assert(out.filter(col("band") < 1 || col("band") > 10).isEmpty)
    out.unpersist()
  }

  test("customer trajectory: classes cover all multi-order customers") {
    val out = graft.SparkEntry.queries("q396_customer_trajectory")(spark, dir)
      .cache()
    val counted = out.agg(sum("n_customers")).first().getLong(0)
    val expected = graft.Tables.load(spark, dir, "orders")
      .groupBy("o_custkey").count().filter(col("count") >= 2).count()
    assert(counted === expected)
    out.unpersist()
  }

  test("quantile grid: medians never exceed P90") {
    val out = graft.SparkEntry.queries("q397_quantile_grid")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("p50_cents") > col("p90_cents")).isEmpty)
    assert(out.filter(col("n_orders") < 1).isEmpty)
    out.unpersist()
  }

  test("brevity law: quintiles partition terms, occurrences decrease") {
    val out = graft.SparkEntry.queries("q398_brevity_law")(spark, dir)
      .orderBy("quintile").cache()
    assert(out.count() === 5)
    assert(out.filter(col("mean_term_len") <= 0.0).isEmpty)
    // quintile 1 holds the most frequent terms, so its occurrence
    // mass dominates the last quintile's
    val occ = out.select("occurrences").collect().map(_.getLong(0))
    assert(occ.head >= occ.last)
    out.unpersist()
  }
}
