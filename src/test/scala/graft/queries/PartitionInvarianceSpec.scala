package graft.queries

import graft.SparkSpec

/** Executes the determinism-sensitive gate queries under different
  * shuffle fan-outs and asserts bit-identical results — the
  * partition-layout-independence contract every hash-gated query
  * claims (exact integer/DECIMAL moments, ordered folds, total-order
  * ranking). A query whose result depended on partial-aggregation
  * order or fold order would differ between 2 and 7 shuffle
  * partitions.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the queries whose determinism rests on a nontrivial argument:
  // ordered double folds (q270/q287), rank statistics on ties
  // (q260/q274), remainder ranking (q259), window-over-window
  // cascades (q282/q286)
  private val sensitive = Seq(
    "q259_proration", "q260_spearman", "q270_hellinger_drift",
    "q274_kendall_tau", "q282_skyline", "q286_peak_rate",
    "q287_minhash_calibration", "q297_cvar", "q300_corpus_datasheet",
    "q302_market_hhi")

  private def snapshot(name: String): Seq[String] = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect().map(_.toString).toSeq
  }

  test("results are identical under 2-way and 7-way shuffles") {
    val original = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      sensitive.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        val two = snapshot(name)
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val seven = snapshot(name)
        assert(two === seven,
          s"$name changes under a different shuffle fan-out")
        assert(two.nonEmpty, s"$name returned no rows")
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", original)
    }
  }
}
