package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev harness: [[graft.operators.Hits.authoritiesAuto]] measured
  * end-to-end at the two rungs whose explicit-variant numbers set its
  * cutoff (SCALING.md §Round 10 graph decade: sf1 ~2·10⁵ nodes where
  * broadcast wins 20.2 vs 60.4 s; sf10 ~2·10⁶ where co-partitioned
  * wins 64.1 vs 461.4 s). The spec pins the ROUTING structurally on a
  * toy graph; this pins it on the real rungs — Auto must land within
  * noise of the winning explicit variant at BOTH rungs, probe
  * included. One run per rung (the explicit variants' min-of-N
  * numbers already exist; this is a routing check, not a re-timing).
  *
  * Usage: runMain graft.dev.Q472AutoAb [dir ...]
  * (default /tmp/sf1 /tmp/sf10)
  */
object Q472AutoAb {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sf1", "/tmp/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def evaluate(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (dir <- dirs) {
      val edges = graft.queries.GraphGateSource.custPartEdges(spark, dir)
      val t0 = System.nanoTime()
      val nProbe = graft.operators.Hits.probeMaxNodes(edges)
      val tProbe = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      evaluate(graft.operators.Hits.authoritiesAuto(edges, iters = 6))
      val tAuto = (System.nanoTime() - t1) / 1e9
      println(f"Q472AUTO $dir%-12s probeNodes=$nProbe%9d " +
        f"probe=$tProbe%6.2fs auto=$tAuto%8.2fs " +
        // label derived from the operator's own default so the harness
        // cannot drift from the route actually taken
        s"form=${if (nProbe > graft.operators.Hits.DefaultMaxBroadcastNodes)
          "copartitioned" else "broadcast"}")
      System.out.flush()
    }
    spark.stop()
  }
}
