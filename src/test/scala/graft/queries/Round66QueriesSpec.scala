package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-66 gate queries. */
class Round66QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("abc: classes partition parts, A deciles carry the most revenue") {
    val out = graft.SparkEntry.queries("q349_abc_classification")(spark, dir)
      .cache()
    assert(out.count() === 3)
    assert(math.abs(out.agg(sum("part_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    assert(math.abs(out.agg(sum("rev_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    val a = out.filter(col("cls") === "A").first()
    assert(a.getAs[Double]("rev_share") <= 0.8 + 1e-9,
      "class A holds at most 80% of revenue by construction")
    out.unpersist()
  }

  test("intra-label coherence: cosine means bounded in [-1, 1]") {
    val out = graft.SparkEntry.queries("q350_intra_label_coherence")(
      spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(abs(col("intra_cosine")) > 1.0 + 1e-9).isEmpty)
    assert(out.filter(col("n_vecs") < 2).isEmpty)
    out.unpersist()
  }

  test("cluster purity: mixed clusters bounded by cluster count") {
    val out = graft.SparkEntry.queries("q351_cluster_purity")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_mixed") > col("n_clusters")).isEmpty)
    assert(out.filter(col("max_langs") > col("size")).isEmpty,
      "distinct languages cannot exceed members")
    assert(out.filter(col("size") < 2).isEmpty,
      "a transitive-closure cluster has at least one pair")
    out.unpersist()
  }

  test("seasonality strength: R2 bounded in [0, 1]") {
    val out = graft.SparkEntry.queries("q352_seasonality_strength")(
      spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("seasonality_r2") < -1e-9 ||
      col("seasonality_r2") > 1.0 + 1e-9).isEmpty)
    out.unpersist()
  }

  test("effective dims: participation ratio within [1, 8], shares sum to 1") {
    val out = graft.SparkEntry.queries("q353_effective_dims")(spark, dir)
      .cache()
    assert(out.count() === 8)
    assert(math.abs(out.agg(sum("var_share")).first().getDouble(0) - 1.0)
      < 1e-9)
    val ed = out.select("effective_dims").first().getDouble(0)
    assert(ed >= 1.0 - 1e-9 && ed <= 8.0 + 1e-9,
      "PR of 8 non-negative variances lives in [1, 8]")
    // random embeddings are near-isotropic: PR should be high
    assert(ed > 4.0)
    out.unpersist()
  }
}
