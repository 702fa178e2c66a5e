package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-38 gate queries. */
class Round38QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("new vs returning: decomposition conserves actives, first week is all-new") {
    val out = graft.SparkEntry.queries("q276_new_vs_returning")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("new_users") + col("returning_users")
      =!= col("active_users")).isEmpty)
    // total new users across weeks = total distinct users
    val users = graft.Tables.load(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(out.agg(sum("new_users")).head().getLong(0) === users,
      "every user is new in exactly one week")
    // the earliest week can only contain new users
    val firstWeek = out.orderBy("wk").head()
    assert(firstWeek.getAs[Long]("returning_users") === 0L)
    out.unpersist()
  }

  test("weighted overlap: bounded by the set version from above") {
    val w = graft.SparkEntry.queries("q277_weighted_vocab_overlap")(spark, dir)
      .cache()
    assert(w.count() > 0)
    assert(w.filter(col("weighted_jaccard") < 0.0 ||
      col("weighted_jaccard") > 1.0).isEmpty)
    assert(w.filter(col("sum_min") > col("sum_max")).isEmpty)
    // weighted jaccard uses frequencies of SHARED terms only in the
    // numerator, so a pair sharing no terms is absent — mirror q271
    val setv = graft.SparkEntry.queries("q271_source_vocab_overlap")(spark, dir)
      .select(col("src_a"), col("src_b"), col("jaccard").as("set_j"))
    assert(w.join(setv, Seq("src_a", "src_b")).count() === w.count(),
      "the pair grids of the set and multiset versions coincide")
    w.unpersist()
  }
}
