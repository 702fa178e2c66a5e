package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-58 gate queries. */
class Round58QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("l-diversity: l never exceeds k, flags fire iff thresholds break") {
    val out = graft.SparkEntry.queries("q309_l_diversity")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("l_div") > col("k_size")).isEmpty,
      "distinct sensitive values cannot exceed group size")
    assert(out.filter(col("at_risk") =!=
      (col("k_size") < 5 || col("l_div") < 3)).isEmpty)
    out.unpersist()
  }

  test("mixture reweight: shares sum to 1, kept respects the cap") {
    val out = graft.SparkEntry.queries("q310_mixture_reweight")(spark, dir)
      .cache()
    val shareSum = out.agg(sum("share")).first().getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-9)
    assert(out.filter(col("multiplier") > 1.0 + 1e-12).isEmpty,
      "downsample-only: no source is upweighted")
    assert(out.filter(col("kept") > col("n_docs")).isEmpty)
    assert(out.filter(col("kept") < 0).isEmpty)
    out.unpersist()
  }

  test("dup token inflation: ratio >= 1 and consistent with counts") {
    val out = graft.SparkEntry.queries("q311_dup_token_inflation")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("freq_dedup") < 1).isEmpty)
    assert(out.filter(col("freq_raw") < col("freq_dedup")).isEmpty,
      "dedup can only remove occurrences")
    assert(out.filter(col("inflation") < 1.0 - 1e-12).isEmpty)
    out.unpersist()
  }

  test("ks by source: statistic bounded in [0,1], one row per source") {
    val out = graft.SparkEntry.queries("q312_ks_by_source")(spark, dir).cache()
    val nSrc = graft.Tables.load(spark, dir, "documents")
      .select("source").distinct().count()
    assert(out.count() === nSrc)
    assert(out.filter(col("ks") < 0.0 || col("ks") > 1.0).isEmpty)
    out.unpersist()
  }

  test("rare token docs: groups partition the corpus") {
    val out = graft.SparkEntry.queries("q313_rare_token_docs")(spark, dir)
      .cache()
    val total = out.agg(sum("n_docs")).first().getLong(0)
    // docs with >= 3 words all land in exactly one min-df group; the
    // corpus generator emits multi-word texts only
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    assert(total === nDocs)
    assert(out.filter(col("min_df") < 1).isEmpty)
    assert(out.filter(col("mean_chars") <= 0.0).isEmpty)
    out.unpersist()
  }
}
