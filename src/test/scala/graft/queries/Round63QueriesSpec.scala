package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-63 gate queries. */
class Round63QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("qq table: quantiles non-decreasing within each language") {
    val out = graft.SparkEntry.queries("q334_qq_table")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("qq_ratio") <= 0.0).isEmpty)
    val rows = out.orderBy("lang", "decile")
      .select("lang", "lang_q", "corpus_q").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val lq = rs.map(_.getLong(1))
      assert(lq.zip(lq.tail).forall { case (a, b) => a <= b },
        "language quantiles are monotone")
      val cq = rs.map(_.getLong(2))
      assert(cq.zip(cq.tail).forall { case (a, b) => a <= b },
        "corpus quantiles are monotone")
    }
    out.unpersist()
  }

  test("changepoint scan: magnitude in [0,1), index within range") {
    val out = graft.SparkEntry.queries("q335_changepoint_scan")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("magnitude") < 0.0 ||
      col("magnitude") >= 1.0).isEmpty)
    assert(out.filter(col("day_index") < 1 ||
      col("day_index") > col("n_days")).isEmpty)
    out.unpersist()
  }

  test("exit state: one exit per user, shares sum to 1") {
    val out = graft.SparkEntry.queries("q336_exit_state")(spark, dir).cache()
    val users = graft.Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(out.agg(sum("n_users")).first().getLong(0) === users)
    val s = out.agg(sum("share")).first().getDouble(0)
    assert(math.abs(s - 1.0) < 1e-9)
    out.unpersist()
  }

  test("dup propensity: docs reconcile, mean copies >= 1") {
    val out = graft.SparkEntry.queries("q337_dup_propensity")(spark, dir)
      .cache()
    val total = out.agg(sum("n_docs")).first().getLong(0)
    assert(total === graft.Tables.load(spark, dir, "documents").count())
    assert(out.filter(col("mean_copies") < 1.0 - 1e-12).isEmpty)
    assert(out.filter(col("n_texts") > col("n_docs")).isEmpty)
    out.unpersist()
  }

  test("rank location: percentiles centered and bounded") {
    val out = graft.SparkEntry.queries("q338_source_rank_location")(spark, dir)
      .cache()
    assert(out.filter(col("mean_percentile") <= 0.0 ||
      col("mean_percentile") >= 1.0).isEmpty)
    // weighted mean of source percentiles is the corpus mean rank:
    // Σ_src Σranks / (N·(N+1)) = (N·(N+1)/2) / (N·(N+1)) = 0.5 exactly
    val nDocs = graft.Tables.load(spark, dir, "documents").count().toDouble
    val weighted = out
      .agg(sum(col("mean_percentile") * col("n_docs"))).first().getDouble(0)
    assert(math.abs(weighted / nDocs - 0.5) < 1e-9)
    out.unpersist()
  }
}
