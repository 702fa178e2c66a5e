package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-19 gate queries. */
class Round19QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bag dup groups: supersets of exact-text duplicates") {
    val out = graft.SparkEntry.queries("q213_bag_dup_groups")(spark, dir).cache()
    // exact-text duplicate pairs must also be bag-duplicates
    val exactDupDocs = graft.Tables.load(spark, dir, "documents")
      .groupBy("text").agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
      .filter(col("n") > 1)
    if (exactDupDocs.count() > 0) {
      val bagDups = out.agg(sum("n_docs")).head().getLong(0)
      val exactDups = exactDupDocs.agg(sum("n")).head().getLong(0)
      assert(bagDups >= exactDups,
        "every exact-text duplicate is also a bag-of-words duplicate")
    }
    assert(out.filter(col("n_docs") <= 1).isEmpty)
    out.unpersist()
  }

  test("percentile_cont: quartiles are ordered and inside the value range") {
    val out = graft.SparkEntry.queries("q214_percentile_cont")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("p25") > col("p50") || col("p50") > col("p75")).isEmpty,
      "quartiles must be monotone")
    val bounds = graft.Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    val j = out.join(bounds, "o_orderpriority")
    assert(j.filter(col("p25") < col("lo") - 0.01 || col("p75") > col("hi") + 0.01).isEmpty)
    out.unpersist()
  }

  test("numeric range frame: frame always contains the current row") {
    val out = graft.SparkEntry.queries("q215_numeric_range_frame")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_near") < 1).isEmpty,
      "RANGE ... AND CURRENT ROW includes the row itself (and its ties)")
    assert(out.filter(col("sum_near") < col("n_near") * -100000L).isEmpty)
    out.unpersist()
  }

  test("native bitmap distinct equals countDistinct exactly") {
    val out = graft.SparkEntry.queries("q216_native_bitmap_agg")(spark, dir)
    val exact = graft.Tables.load(spark, dir, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("exact"))
    assert(out.join(exact, "event_type")
      .filter(col("n_distinct_users") =!= col("exact")).isEmpty)
  }
}
