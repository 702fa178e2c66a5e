package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-62 gate queries. */
class Round62QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("survivor bias: shares each sum to 1, shifts cancel") {
    val out = graft.SparkEntry.queries("q329_dedup_survivor_bias")(spark, dir)
      .cache()
    val sums = out.agg(sum("share_before"), sum("share_after"), sum("shift"))
      .first()
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-9)
    assert(math.abs(sums.getDouble(2)) < 1e-9, "mixture shifts are zero-sum")
    assert(out.filter(col("n_after") > col("n_before")).isEmpty,
      "dedup cannot add documents")
    out.unpersist()
  }

  test("fisher scores: non-negative with all classes present") {
    val out = graft.SparkEntry.queries("q330_fisher_scores")(spark, dir)
      .cache()
    assert(out.count() === 8)
    assert(out.filter(col("fisher") < 0.0).isEmpty,
      "between- and within-class sums of squares are non-negative")
    val k = graft.Tables.load(spark, dir, "embeddings")
      .select("label").distinct().count()
    assert(out.filter(col("n_classes") =!= k).isEmpty)
    out.unpersist()
  }

  test("token position: relative positions live in [0,1]") {
    val out = graft.SparkEntry.queries("q331_token_position_stats")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("mean_rel_pos") < 0.0 ||
      col("mean_rel_pos") > 1.0).isEmpty)
    out.unpersist()
  }

  test("simgraph degrees: histogram covers every document") {
    val out = graft.SparkEntry.queries("q332_simgraph_degree_hist")(spark, dir)
      .cache()
    val total = out.agg(sum("n_docs")).first().getLong(0)
    assert(total === graft.Tables.load(spark, dir, "documents").count(),
      "degree histogram (incl. isolated) partitions the corpus")
    assert(out.filter(col("degree") < 0).isEmpty)
    out.unpersist()
  }

  test("audience overlap: jaccard bounded, intersections bounded") {
    val out = graft.SparkEntry.queries("q333_audience_overlap")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("jaccard") < 0.0 || col("jaccard") > 1.0).isEmpty)
    assert(out.filter(col("type_a") >= col("type_b")).isEmpty,
      "upper-triangle pairs only")
    out.unpersist()
  }
}
