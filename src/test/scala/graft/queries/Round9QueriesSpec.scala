package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-9 gate queries (the DuckDB gate
  * hash-checks exact values at sf0.01; these pin the properties that
  * must hold at ANY scale).
  */
class Round9QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("novelty: doc 0 is fully novel; fractions bounded; counts consistent") {
    val out = graft.SparkEntry.queries("q176_ngram_novelty")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_novel") > col("n_grams")).isEmpty)
    assert(out.filter(col("novelty") < 0 || col("novelty") > 1).isEmpty)
    // the first document can only contain first-seen grams
    val first = out.orderBy("doc_id").limit(1)
    assert(first.filter(col("n_novel") =!= col("n_grams")).isEmpty)
    out.unpersist()
  }

  test("label centroids: every label x kept dim present, counts match label sizes") {
    val out = graft.SparkEntry.queries("q177_label_centroids")(spark, dir).cache()
    val labels = graft.Tables.load(spark, dir, "embeddings")
      .groupBy("label").agg(count(lit(1)).as("n"))
    // 4 kept dims (0,16,32,48) per label
    val perLabel = out.groupBy("label").agg(count(lit(1)).as("dims"))
    assert(perLabel.filter(col("dims") =!= 4).isEmpty)
    val j = out.join(labels, "label")
    assert(j.filter(col("n_vecs") =!= col("n")).isEmpty)
    // embeddings are roughly unit-scale: centroids must stay in [-1, 1]
    assert(out.filter(abs(col("centroid")) > 1).isEmpty)
    out.unpersist()
  }

  test("interval frame: trailing window includes the current day") {
    val out = graft.SparkEntry.queries("q178_interval_frame")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_days_7d") < 1).isEmpty)
    // frame sum includes at least the current day's revenue
    assert(out.filter(col("rev_7d") < col("rev")).isEmpty)
    out.unpersist()
  }

  test("tz bucketing: shifted rows bounded by the day's total; Amsterdam is ahead of UTC") {
    val out = graft.SparkEntry.queries("q180_tz_bucket")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_shifted") > col("n")).isEmpty)
    // Amsterdam is UTC+1/+2: a local day can only borrow rows from the
    // PREVIOUS UTC day, never lend to it — so some shifts must exist
    // over a year of uniform events
    assert(out.agg(sum(col("n_shifted"))).head().getLong(0) > 0)
    out.unpersist()
  }

  test("sql pivot: per-status counts sum to the priority's order count") {
    val out = graft.SparkEntry.queries("q179_sql_pivot")(spark, dir).cache()
    assert(out.count() === 5)
    val orders = graft.Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("prio")).agg(count(lit(1)).as("n_orders"))
    val j = out.join(orders, "prio")
    assert(j.filter(col("o_n") + col("f_n") + col("p_n") =!= col("n_orders")).isEmpty)
    out.unpersist()
  }
}
