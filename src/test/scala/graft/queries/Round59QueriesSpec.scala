package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-59 gate queries. */
class Round59QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("time to threshold: crossing value is at or past the threshold") {
    val out = graft.SparkEntry.queries("q314_time_to_threshold")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("value_at_cross") < 1000.0).isEmpty,
      "first crossing is >= the threshold")
    assert(out.filter(col("n_events_to_cross") < 1).isEmpty)
    // one row per crossing user
    assert(out.select("user_id").distinct().count() === out.count())
    out.unpersist()
  }

  test("relative bands: mid band sits between its language's quartiles") {
    val out = graft.SparkEntry.queries("q315_relative_length_bands")(spark, dir)
      .cache()
    // every language contributes a mid band (P25..P75 is never empty
    // for a non-empty group: percentile_disc picks real members)
    val langs = graft.Tables.load(spark, dir, "documents")
      .select("lang").distinct().count()
    assert(out.filter(col("band") === "mid").count() === langs)
    // bands partition each language's documents
    val total = out.agg(sum("n_docs")).first().getLong(0)
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    assert(total === nDocs)
    assert(out.filter(col("min_chars") > col("max_chars")).isEmpty)
    out.unpersist()
  }

  test("dominant profile: users partition, dominance within (0,1]") {
    val out = graft.SparkEntry.queries("q316_dominant_type_profile")(spark, dir)
      .cache()
    val users = graft.Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(out.agg(sum("n_users")).first().getLong(0) === users)
    assert(out.filter(col("dominance") <= 0.0 || col("dominance") > 1.0).isEmpty)
    assert(out.filter(col("events_covered") > col("total_events")).isEmpty)
    out.unpersist()
  }

  test("seasonal-naive backtest: MAE >= |bias| per type") {
    val out = graft.SparkEntry.queries("q317_seasonal_naive_backtest")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("mae") < 0.0).isEmpty)
    // triangle inequality: mean |e| >= |mean e|
    assert(out.filter(col("mae") + lit(1e-9) < abs(col("bias"))).isEmpty)
    out.unpersist()
  }

  test("burst top users: burst bounded by the user's event count") {
    val out = graft.SparkEntry.queries("q318_burst_top_users")(spark, dir)
      .cache()
    assert(out.count() > 0 && out.count() <= 20)
    assert(out.filter(col("max_burst") < 1).isEmpty)
    assert(out.filter(col("max_burst") > col("n_events")).isEmpty,
      "a 10-minute burst cannot exceed the user's total events")
    out.unpersist()
  }
}
