package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 10, part 2): push the LSH curation path
  * — the adjudicated 100 TB regime for dense corpora — one more doc
  * decade (/tmp/sfd10: 500 k docs on the fixed 31-word vocabulary).
  *
  * The open question is the BAND-BUCKET hot-key class: the MinHashLsh
  * candidate stage joins bands to bands on bkey, so a band key shared
  * by B documents emits B² candidate rows from ONE join key — the
  * same single-task shape that killed q288 on the round-9 skew rung.
  * On a duplicate-heavy corpus (exactly where dedup matters) band
  * buckets grow with the corpus, so "posting-linear" only holds while
  * buckets stay bounded. This harness measures, per rung:
  *  - the density probe (exact-pair predictor, SCALING.md ladder);
  *  - the band-bucket census (max / p99 bucket size, candidate pairs
  *    implied by buckets = Σ C(B,2) — the LSH analogue of the probe);
  *  - the wall time of the full LSH-curation audit.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def evaluate(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); evaluate(f); (System.nanoTime() - t0) / 1e9
    }

    val rungs = Seq("/root/testdata/sf0.1", "/tmp/sfd10")

    // 1. density probe + band-bucket census per rung (all bounded
    // aggregates; the census is the LSH-side twin of the exact probe)
    for (d <- rungs) {
      val docs = graft.Tables.load(spark, d, "documents")
      val sh = docs.select(col("doc_id"), explode(array_distinct(
        graft.functions.WordShingles(spark, lower(col("text")), 3))).as("s"))
      val nDocs = docs.count()
      val probe = graft.pipelines.CorpusCuration.NearDupCandidates
        .probePairsPerPosting(sh, 100000)
      val bands = graft.dedup.LshIndex.bandsFromPostings(sh, 8, 2)
      val bs = bands.groupBy("bkey").agg(count(lit(1)).as("b"))
      // bounded-collect: O(1) — one global aggregate row
      val c = bs.agg(max(col("b")).as("maxB"),
        expr("cast(percentile_disc(0.99) WITHIN GROUP (ORDER BY b) as bigint)")
          .as("p99B"),
        expr("sum(b * (b - 1) DIV 2)").as("lshPairs"),
        count(lit(1)).as("nBuckets")).collect()(0)
      println(f"CENSUS $d%-22s docs=$nDocs%8d probe=$probe%9.1f " +
        f"maxBucket=${c.getLong(0)}%8d p99Bucket=${c.getLong(1)}%6d " +
        f"lshPairs=${c.getLong(2)}%d buckets=${c.getLong(3)}%d")
      System.out.flush()
    }

    // 2. the full LSH curation audit per rung (warm, then min of 2)
    for (d <- rungs) {
      val docs = graft.Tables.load(spark, d, "documents")
      def audit = graft.pipelines.CorpusCuration.audit(docs,
        graft.pipelines.CorpusCuration.Config(candidates =
          graft.pipelines.CorpusCuration.NearDupCandidates.MinHashLsh(8, 2)))
      val t = Seq(timed(audit), timed(audit)).min
      println(f"LSH-AUDIT $d%-22s ${t}%8.2f s")
      System.out.flush()
    }
    spark.stop()
  }
}
