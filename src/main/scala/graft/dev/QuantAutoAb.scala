package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev harness: [[graft.operators.ExactQuantiles.autoDisc]]'s probe
  * verified on the real rungs whose A/B numbers set its cutoff
  * (SCALING.md sf10 quantile regime): the few-large shape
  * (l_returnflag groups) must probe orders above 10⁴ and route to
  * rank-select; the many-small shape (per-partkey groups) must probe
  * ~30 and keep the built-in. Routing check, not a re-timing — the
  * min-of-3 interleaved numbers already exist.
  *
  * Usage: runMain graft.dev.QuantAutoAb [dir] (default /tmp/sf10)
  */
object QuantAutoAb {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables.load(spark, dir, "lineitem")
    for ((label, keys) <- Seq(
        "few-large(l_returnflag)" -> Seq("l_returnflag"),
        "many-small(l_partkey)" -> Seq("l_partkey"))) {
      val t0 = System.nanoTime()
      val probe = graft.operators.ExactQuantiles
        .probeAvgGroupSize(li, keys, "l_extendedprice")
      val t = (System.nanoTime() - t0) / 1e9
      // threshold taken from the operator's own default so the printed
      // label cannot drift from the route autoDisc actually takes
      val form = if (probe > graft.operators.ExactQuantiles.DefaultLargeGroupCutoff)
        "rank-select" else "built-in"
      println(f"QUANTAUTO $dir $label%-26s probe=$probe%12.1f " +
        f"rows/group probeWall=$t%5.2fs form=$form")
      System.out.flush()
    }
    spark.stop()
  }
}
