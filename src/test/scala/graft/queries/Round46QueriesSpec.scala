package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-46 gate query. */
class Round46QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("lsh precision/recall: confusion counts close, ratios bounded") {
    val out = graft.SparkEntry.queries("q291_lsh_precision_recall")(spark, dir)
      .head()
    val (nT, nC, tp, fp, fn) = (out.getAs[Long]("n_truth"),
      out.getAs[Long]("n_candidates"), out.getAs[Long]("tp"),
      out.getAs[Long]("fp"), out.getAs[Long]("fn"))
    assert(tp <= nT && tp <= nC, "true positives bounded by both sets")
    assert(fp === nC - tp && fn === nT - tp, "confusion counts close")
    assert(out.getAs[Double]("precision") >= 0.0 &&
      out.getAs[Double]("precision") <= 1.0)
    assert(out.getAs[Double]("recall") >= 0.0 &&
      out.getAs[Double]("recall") <= 1.0)
    // the banding exists to find near-dups: on this corpus it must
    // recover a substantial share of the truth pairs
    assert(out.getAs[Double]("recall") >= 0.5,
      "2-row bands at jaccard>=0.4 recover most true pairs")
  }
}
