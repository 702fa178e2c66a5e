package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-12 store gates. */
class Round12QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("cdc apply: deletes gone, updates versioned, replay-safe") {
    val out = graft.SparkEntry.queries("q187_cdc_apply")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("c_custkey") % 13 === 0).isEmpty, "deleted key survived")
    assert(out.filter(col("c_custkey") % 7 === 0 && col("v") =!= 2).isEmpty)
    assert(out.filter(col("c_custkey") % 7 =!= 0 && col("v") =!= 1).isEmpty)
    out.unpersist()
  }

  test("scd2 history: one open version per key, closed versions end where the next begins") {
    val out = graft.SparkEntry.queries("q188_scd2_history")(spark, dir).cache()
    val open = out.filter(col("is_current"))
    val perKey = open.groupBy("c_custkey").agg(count(lit(1)).as("n"))
    assert(perKey.filter(col("n") =!= 1).isEmpty, "key without exactly one open version")
    assert(out.filter(col("is_current") && col("valid_to").isNotNull).isEmpty)
    assert(out.filter(!col("is_current") && col("valid_to").isNull).isEmpty)
    assert(out.filter(!col("is_current") && col("valid_to") <= col("valid_from")).isEmpty)
    out.unpersist()
  }

  test("bucketed join: no Exchange feeds the join; results match the plain join") {
    val q = graft.SparkEntry.queries("q189_bucketed_join")(spark, dir)
    // the only exchange allowed is the one for the final groupBy —
    // the join itself must consume bucket-local scans. SortMergeJoin
    // over bucketed scans shows no Exchange between scan and join.
    val plan = q.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SortMergeJoin over bucketed scans:\n$plan")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange"),
      "Exchange below the join: bucketing did not co-locate")
    assert(q.count() === 5)
  }
}
