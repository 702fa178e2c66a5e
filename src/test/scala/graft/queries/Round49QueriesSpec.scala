package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-49 gate query. */
class Round49QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bounce rate: session accounting closes against q42's rule") {
    val out = graft.SparkEntry.queries("q295_bounce_rate")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("bounces") > col("n_sessions")).isEmpty)
    assert(out.filter(col("bounce_rate") < 0.0 || col("bounce_rate") > 1.0)
      .isEmpty)
    // session count across days equals the independent q42 session count
    // (same 30-minute gap rule over the same events)
    val q42Sessions = graft.SparkEntry.queries("q42_sessionize_batch")(
      spark, dir)
    val totalSessions = out.agg(sum("n_sessions")).head().getLong(0)
    val q42Total = q42Sessions.agg(sum("n_sessions")).head().getLong(0)
    assert(totalSessions === q42Total,
      "both sessionizations count the same sessions")
    out.unpersist()
  }
}
