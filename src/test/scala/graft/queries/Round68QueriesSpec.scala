package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-68 gate queries. */
class Round68QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("split leakage: within + cross = all pairs") {
    val out = graft.SparkEntry.queries("q359_split_leakage")(spark, dir)
      .cache()
    val r = out.first()
    assert(r.getAs[Long]("n_within") + r.getAs[Long]("n_cross") ===
      r.getAs[Long]("n_pairs"))
    val rate = r.getAs[Double]("leakage_rate")
    assert(rate >= 0.0 && rate <= 1.0)
    out.unpersist()
  }

  test("user age curve: day zero covers every user") {
    val out = graft.SparkEntry.queries("q360_user_age_curve")(spark, dir)
      .orderBy("age_d").cache()
    val users = graft.Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    val first = out.first()
    assert(first.getAs[Long]("age_d") === 0L)
    assert(first.getAs[Long]("n_users") === users,
      "every user is active on their own first day")
    assert(out.filter(col("events_per_user") < 1.0 - 1e-12).isEmpty)
    out.unpersist()
  }

  test("price dispersion: medians non-negative") {
    val out = graft.SparkEntry.queries("q361_price_dispersion")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("median_dispersion") < 0.0).isEmpty)
    assert(out.filter(col("n_parts") < 1).isEmpty)
    out.unpersist()
  }

  test("bucket skew: loads average to 1, chi2 parts non-negative") {
    val out = graft.SparkEntry.queries("q362_bucket_skew_audit")(spark, dir)
      .cache()
    val k = out.count()
    val loadSum = out.agg(sum("load_factor")).first().getDouble(0)
    assert(math.abs(loadSum - k.toDouble) < 1e-6,
      "mean load factor is exactly 1")
    assert(out.filter(col("chi2_part") < 0.0).isEmpty)
    assert(out.filter(col("max_load_factor") + 1e-12 < col("load_factor"))
      .isEmpty)
    out.unpersist()
  }

  test("ingestion drift: deciles partition, baseline is 1") {
    val out = graft.SparkEntry.queries("q363_ingestion_drift")(spark, dir)
      .cache()
    assert(out.count() === 10)
    val total = out.agg(sum("n_docs")).first().getLong(0)
    assert(total === graft.Tables.load(spark, dir, "documents").count())
    val first = out.orderBy("decile").first()
    assert(math.abs(first.getAs[Double]("vs_first_decile") - 1.0) < 1e-12)
    out.unpersist()
  }
}
