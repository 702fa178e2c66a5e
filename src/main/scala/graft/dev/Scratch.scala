package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 10): push the round-9 regime decisions
  * one more decade — at the /tmp/sf10 rung (60 M lineitem), does the
  * quantile adjudication hold?
  *  - FEW-LARGE groups (q190's shape, 3 l_returnflag groups):
  *    ExactQuantiles rank-select won at sf1 (7.8 → 6.0 s). Does the
  *    margin grow with the per-group buffer?
  *  - MANY-SMALL groups (q361's shape, one group per partkey):
  *    the built-in buffer won/washed at sf0.1 and sf1. Does it still
  *    hold when the table is ×10?
  * Same-JVM, interleaved A-B-A-B, min-of-3 per variant (the repo's
  * measured cross-JVM drift is ±30-40% — adjudications are only
  * valid inside one JVM).
  *
  * Also prints the corpus-density probe (pairs-per-posting,
  * NearDupCandidates.probePairsPerPosting) per rung — the measured
  * predictor for the exact-pair family where a full sf10 corpus run
  * is out of budget (pairs/shingle ∝ df², ×~100 per doc decade).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SCRATCH_SF_DIR", "/tmp/sf10")

    def evaluate(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); evaluate(f); (System.nanoTime() - t0) / 1e9
    }
    def ab(name: String, a: => DataFrame, b: => DataFrame): Unit = {
      evaluate(a); evaluate(b) // warm: Janino + AQE shapes for both
      val as = Seq.newBuilder[Double]; val bs = Seq.newBuilder[Double]
      for (_ <- 1 to 3) { as += timed(a); bs += timed(b) } // interleaved
      val (am, bm) = (as.result().min, bs.result().min)
      println(f"AB $name%-34s A=$am%7.2fs  B=$bm%7.2fs  (A/B=${am / bm}%.2f)")
      System.out.flush()
    }

    val li = graft.Tables.load(spark, dir, "lineitem")
    val ps = Seq(("b50lo", 0.49), ("b50hi", 0.51), ("b90lo", 0.89),
      ("b90hi", 0.91), ("b99lo", 0.985), ("b99hi", 0.995))

    // FEW-LARGE: q190's band frame — A = shipped rank-select, B = built-in
    ab("few-large (q190 bands)",
      graft.operators.ExactQuantiles.cont(
        li, Seq("l_returnflag"), "l_extendedprice", ps),
      li.groupBy("l_returnflag").agg(
        ps.map { case (n, p) =>
          expr(s"percentile(l_extendedprice, $p)").as(n)
        }.head, ps.tail.map { case (n, p) =>
          expr(s"percentile(l_extendedprice, $p)").as(n)
        } :+ count(lit(1)).as("__group_n"): _*))

    // MANY-SMALL: q361's shape — one group per partkey, ~30 rows each;
    // A = shipped built-in percentile_disc, B = rank-select rewrite
    ab("many-small (q361 per-part p50)",
      li.groupBy("l_partkey").agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
        count(lit(1)).as("n")),
      graft.operators.ExactQuantiles.disc(
        li, Seq("l_partkey"), "l_quantity", Seq(("p50", 0.5))))

    // corpus-density probe per rung: the measured predictor for the
    // exact pair family (bounded collect, one aggregate row per rung)
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf1", dir)) {
      val sh = graft.Tables.load(spark, d, "documents")
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.WordShingles(spark, lower(col("text")), 3))).as("s"))
      val nDocs = graft.Tables.load(spark, d, "documents").count()
      val probe = graft.pipelines.CorpusCuration.NearDupCandidates
        .probePairsPerPosting(sh, 100000)
      println(f"PROBE $d%-22s docs=$nDocs%8d pairs/posting=$probe%12.1f")
      System.out.flush()
    }
    spark.stop()
  }
}
