package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-57 gate queries. */
class Round57QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("dim corr: bounded coefficients, symmetric-free pair ordering") {
    val out = graft.SparkEntry.queries("q304_dim_corr")(spark, dir).cache()
    assert(out.count() === 28, "C(8,2) probe-dim pairs")
    assert(out.filter(col("d1") >= col("d2")).isEmpty, "upper triangle only")
    assert(out.filter(abs(col("corr")) > 1.0 + 1e-12).isEmpty,
      "Pearson r stays in [-1, 1]")
    // random embedding dims: no pair should be perfectly correlated
    assert(out.filter(abs(col("corr")) > 0.99).isEmpty)
    out.unpersist()
  }

  test("source dup matrix: ordered pairs with positive sharing") {
    val out = graft.SparkEntry.queries("q305_source_dup_matrix")(spark, dir)
      .cache()
    assert(out.filter(col("src_a") >= col("src_b")).isEmpty)
    assert(out.filter(col("shared_fps") < 1).isEmpty,
      "a reported pair shares at least one fingerprint")
    out.unpersist()
  }

  test("zipf audit: rank 1 is the max term, ratio normalized to 1 there") {
    val out = graft.SparkEntry.queries("q306_zipf_audit")(spark, dir)
      .orderBy("rank").cache()
    val first = out.first()
    assert(first.getAs[Long]("rank") === 1L)
    assert(math.abs(first.getAs[Double]("zipf_ratio") - 1.0) < 1e-12,
      "rank-1 ratio is freq·1/maxfreq = 1")
    // frequencies are non-increasing down the rank order
    val freqs = out.select("freq").collect().map(_.getLong(0))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    out.unpersist()
  }

  test("norm calibration: deciles partition the table, rates in [0,1]") {
    val out = graft.SparkEntry.queries("q307_norm_calibration")(spark, dir)
      .cache()
    assert(out.count() === 10)
    val total = out.agg(sum("n_vecs")).first().getLong(0)
    val nEmb = graft.Tables.load(spark, dir, "embeddings").count()
    assert(total === nEmb, "deciles cover every vector exactly once")
    assert(out.filter(col("pos_rate") < 0.0 || col("pos_rate") > 1.0).isEmpty)
    assert(out.filter(col("mean_sq_norm") <= 0.0).isEmpty)
    // mean squared norm is non-decreasing across deciles (ordered split)
    val norms = out.orderBy("decile").select("mean_sq_norm").collect()
      .map(_.getDouble(0))
    assert(norms.zip(norms.tail).forall { case (a, b) => a <= b })
    out.unpersist()
  }

  test("lsh band stats: bucket accounting is internally consistent") {
    val out = graft.SparkEntry.queries("q308_lsh_band_stats")(spark, dir)
      .cache()
    assert(out.count() === 4, "4 bands of 2 hashes")
    assert(out.filter(col("max_bucket") < 1).isEmpty)
    assert(out.filter(col("singletons") > col("n_buckets")).isEmpty)
    // a band with all singleton buckets proposes zero candidate pairs
    assert(out.filter(col("singletons") === col("n_buckets") &&
      col("cand_pairs") =!= 0L).isEmpty)
    out.unpersist()
  }
}
