package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-36 gate queries. */
class Round36QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("vocab overlap: one row per unordered pair, bounded jaccard") {
    val out = graft.SparkEntry.queries("q271_source_vocab_overlap")(spark, dir)
      .cache()
    val ns = graft.Tables.load(spark, dir, "documents")
      .select("source").distinct().count()
    assert(out.count() === ns * (ns - 1) / 2,
      "every source pair shares at least one term in a common corpus")
    assert(out.filter(col("src_a") >= col("src_b")).isEmpty)
    assert(out.filter(col("jaccard") < 0.0 || col("jaccard") > 1.0).isEmpty)
    assert(out.filter(col("inter") > col("na") ||
      col("inter") > col("nb")).isEmpty,
      "an intersection can never exceed either set")
    out.unpersist()
  }

  test("interarrival cv: every active user scored, moments sane") {
    val out = graft.SparkEntry.queries("q272_interarrival_cv")(spark, dir)
      .cache()
    val users = graft.Tables.load(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3).count()
    assert(out.count() >= users,
      "every user with 2+ gaps and nonzero span gets a score")
    assert(out.filter(col("cv") < 0.0).isEmpty, "a CV is nonnegative")
    assert(out.filter(col("mean_gap_s") <= 0.0).isEmpty)
    assert(out.filter(col("n_gaps") < 2).isEmpty)
    out.unpersist()
  }

  test("trimmed mean: interior average sits within the winsor bounds") {
    val out = graft.SparkEntry.queries("q273_trimmed_mean")(spark, dir).cache()
    assert(out.count() === 5, "one row per order priority")
    assert(out.filter(col("n_kept") > col("n_total")).isEmpty)
    // exactly n - 2*(n div 10) interior rows survive
    assert(out.filter(col("n_kept") =!=
      col("n_total") - lit(2L) * expr("n_total div 10")).isEmpty)
    // the trimmed mean is bracketed by the group's min and max
    val bounds = graft.Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("p"))
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    assert(out.join(bounds, "p")
      .filter(col("trimmed_mean") < col("lo") ||
        col("trimmed_mean") > col("hi")).isEmpty)
    out.unpersist()
  }
}
