package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 7): broadcast vs co-partitioned HITS
  * ([[graft.operators.Hits]]) on the sf0.1 co-purchase graph —
  * interleaved in one JVM, warm + min-of-two per variant, per the
  * A/B protocol (cross-JVM Prof comparisons carry ±30-40% noise).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SCRATCH_SF_DIR", "/root/testdata/sf0.1")

    def edges(): DataFrame =
      graft.Tables.load(spark, dir, "lineitem")
        .join(graft.Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("p"))
        .distinct()

    def top10(copart: Boolean): DataFrame =
      graft.operators.Hits.authorities(edges(), iters = 6,
          parts = if (copart) 0 else 8, copartitioned = copart)
        .orderBy(col("authority").desc, col("p")).limit(10)

    def time(label: String, mk: () => DataFrame): Unit = {
      mk().count()
      val t0 = System.nanoTime(); mk().count()
      val t1 = System.nanoTime(); mk().count()
      val t2 = System.nanoTime()
      println(f"SCRATCH $label ${math.min(t1 - t0, t2 - t1) / 1e9}%.3f")
    }
    // interleaved so ambient load hits both variants equally
    time("broadcast_1", () => top10(copart = false))
    time("copart_1", () => top10(copart = true))
    time("broadcast_2", () => top10(copart = false))
    time("copart_2", () => top10(copart = true))
    spark.stop()
  }
}
