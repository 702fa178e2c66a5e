package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-16 gate queries. */
class Round16QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("vocab health: hapax bounded by vocab, coverages are fractions") {
    val out = graft.SparkEntry.queries("q196_vocab_health")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_hapax") > col("n_vocab")).isEmpty)
    assert(out.filter(col("n_vocab") > col("n_tokens")).isEmpty)
    assert(out.filter(col("hapax_share") < 0 || col("hapax_share") > 1).isEmpty)
    assert(out.filter(col("top10_coverage") < 0 || col("top10_coverage") > 1).isEmpty)
    out.unpersist()
  }

  test("skip-gram pairs: symmetric window means symmetric counts") {
    val out = graft.SparkEntry.queries("q197_skipgram_pairs")(spark, dir).cache()
    assert(out.count() === 30)
    // a ±2 window is symmetric: count(a→b) must equal count(b→a).
    // The top-30 cut can split a mirrored pair, so check against the
    // full table rather than within the head.
    val tok = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val probes = tok.select(col("doc_id"), col("w").as("center"),
      explode(array(col("pos") - 2, col("pos") - 1,
        col("pos") + 1, col("pos") + 2)).as("pb"))
    val full = tok.select(col("doc_id"), col("pos").as("pb"), col("w").as("context"))
    val all = probes.join(full, Seq("doc_id", "pb"))
      .groupBy("center", "context").agg(count(lit(1)).as("n"))
    val mirrored = all.select(col("context").as("center"),
      col("center").as("context"), col("n").as("n_rev"))
    val j = out.join(mirrored, Seq("center", "context"))
    assert(j.filter(col("n") =!= col("n_rev")).isEmpty,
      "asymmetric counts under a symmetric window")
    out.unpersist()
  }
}
