package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def co(): DataFrame = {
      val trainOrders = graft.Tables.load(spark, dir, "orders")
        .filter(to_date(col("o_orderdate")) < lit("1999-01-01").cast(DateType))
        .select(col("o_orderkey"))
      val op = graft.Tables.load(spark, dir, "lineitem")
        .join(trainOrders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      op.as("a").join(op.as("b"), Seq("o"))
        .filter(col("a.p") =!= col("b.p"))
        .groupBy(col("a.p").as("part"), col("b.p").as("rec"))
        .agg(count(lit(1)).as("w"))
    }

    def viaWindow(): DataFrame = {
      val wnd = Window.partitionBy("part").orderBy(col("w").desc, col("rec"))
      co().withColumn("rk", row_number().over(wnd))
        .filter(col("rk") <= 3).select("part", "rec", "rk")
    }
    def viaHeap(): DataFrame =
      graft.plans.TopKPerKey.perKey(co(), Seq("part"),
        Seq(col("w").desc, col("rec")), 3).select("part", "rec", "rk")

    def time(label: String, mk: () => DataFrame): Unit = {
      mk().count()
      val t0 = System.nanoTime(); mk().count()
      val t1 = System.nanoTime(); mk().count()
      val t2 = System.nanoTime()
      println(f"SCRATCH $label ${math.min(t1 - t0, t2 - t1) / 1e9}%.3f")
    }
    time("window", () => viaWindow())
    time("heap", () => viaHeap())
    time("window2", () => viaWindow())
    time("heap2", () => viaHeap())
    spark.stop()
  }
}
