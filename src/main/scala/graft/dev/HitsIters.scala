package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: is the co-partitioned HITS top-10 (rnk, part) ranking
  * already settled at fewer than 6 iterations? Prints the top-10 part
  * ids per iteration count so the gate (and its oracle) can run the
  * cheapest iteration count whose output is identical to 6.
  */
object HitsIters {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val edges = graft.queries.GraphGateSource.custPartEdges(spark, dir)
      for (iters <- Seq(1, 2, 3, 4, 6)) {
        // bounded-collect: limit(10) — the gate's own top-10 shape
        val top = graft.operators.Hits
          .authorities(edges, iters = iters, parts = 0, copartitioned = true)
          .orderBy(col("authority").desc, col("p")).limit(10)
          .select("p").collect().map(_.getLong(0)).toSeq
        println(s"HITS $dir iters=$iters top10=${top.mkString(",")}")
      }
    }
    spark.stop()
  }
}
