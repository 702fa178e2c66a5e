package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-72 gate queries. */
class Round72QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("harmonic centrality: consistent with hop counts") {
    val out = graft.SparkEntry.queries("q379_harmonic_centrality")(spark, dir)
      .cache()
    assert(out.count() > 0 && out.count() <= 20)
    assert(out.filter(col("harmonic") < col("n1").cast("double") - 1e-9)
      .isEmpty, "harmonic >= direct-neighbor count")
    assert(out.filter(col("n1") < 1).isEmpty)
    out.unpersist()
  }

  test("jaccard histogram: buckets in 0..10 and populated") {
    val out = graft.SparkEntry.queries("q380_jaccard_histogram")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("bucket") < 0 || col("bucket") > 10).isEmpty)
    assert(out.filter(col("n_pairs") < 1).isEmpty)
    out.unpersist()
  }

  test("mom growth: first month has no growth value") {
    val out = graft.SparkEntry.queries("q381_mom_growth")(spark, dir)
      .orderBy("month").cache()
    assert(out.count() > 0)
    assert(out.first().isNullAt(out.first().fieldIndex("mom_growth")),
      "no previous month for the first row")
    assert(out.filter(col("revenue") <= 0.0).isEmpty)
    out.unpersist()
  }

  test("quality funnel: combinations partition the corpus") {
    val out = graft.SparkEntry.queries("q382_quality_flag_funnel")(spark, dir)
      .cache()
    val total = out.agg(sum("n_docs")).first().getLong(0)
    assert(total === graft.Tables.load(spark, dir, "documents").count())
    assert(math.abs(out.agg(sum("share")).first().getDouble(0) - 1.0) < 1e-9)
    out.unpersist()
  }

  test("gap spectrum: shares sum to 1, buckets non-negative") {
    val out = graft.SparkEntry.queries("q383_reorder_gap_spectrum")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("week_bucket") < 0).isEmpty)
    assert(math.abs(out.agg(sum("share")).first().getDouble(0) - 1.0) < 1e-9)
    out.unpersist()
  }
}
