package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-33 gate queries. */
class Round33QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("twap: bounded by the day's observed extremes") {
    val out = graft.SparkEntry.queries("q263_twap")(spark, dir).cache()
    assert(out.count() > 0)
    val raw = graft.Tables.load(spark, dir, "events")
      .filter(col("user_id") % 10 === 0)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min("value").as("lo"), max("value").as("hi"),
        count(lit(1)).as("n_raw"))
    val joined = out.join(raw, Seq("user_id", "day"))
    assert(joined.count() === out.count(), "every TWAP row has raw events")
    // a duration-weighted mean can never escape the value range
    assert(joined.filter(col("twap") < col("lo") - 1e-9 ||
      col("twap") > col("hi") + 1e-9).isEmpty,
      "TWAP must lie within [min, max] of the day's values")
    assert(joined.filter(col("n_events") =!= col("n_raw")).isEmpty)
    out.unpersist()
  }

  test("k-anonymity: tallies conserve the corpus") {
    val out = graft.SparkEntry.queries("q264_k_anonymity")(spark, dir).cache()
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(out.agg(sum("n_docs")).head().getLong(0) === total,
      "every document lands in exactly one (lang, source) row")
    assert(out.filter(col("suppressed_docs") + col("kept_docs")
      =!= col("n_docs")).isEmpty)
    assert(out.filter(col("suppressed_groups") > col("n_groups")).isEmpty)
    assert(out.filter(col("suppressed_docs") < col("suppressed_groups")).isEmpty,
      "each suppressed group contributes at least one suppressed doc")
    out.unpersist()
  }

  test("label noise: one verdict per audited vector, consistent vote math") {
    val out = graft.SparkEntry.queries("q265_label_noise")(spark, dir).cache()
    val audited = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 5 === 0).count()
    assert(out.count() === audited, "every audited vector gets a verdict")
    assert(out.filter(col("agree_n") < 0 || col("agree_n") > 5).isEmpty,
      "agreement counts come from 5 neighbors")
    assert(out.filter(col("suspect") =!= (col("agree_n") <= 2)).isEmpty,
      "suspect is exactly the minority-agreement predicate")
    // an absolute majority of agreeing neighbors forces the modal label
    assert(out.filter(col("agree_n") >= 3 &&
      col("modal_label") =!= col("a_label")).isEmpty,
      "3-of-5 agreement implies the modal neighbor label is the own label")
    out.unpersist()
  }
}
