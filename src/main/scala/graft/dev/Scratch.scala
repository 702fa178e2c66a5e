package graft.dev

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

    def hits(nPart: Int): DataFrame = {
      val s = spark
      val edges = graft.Tables.load(s, dir, "lineitem")
        .join(graft.Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("u"), col("l_partkey").as("p"))
        .distinct()
      val eP = edges.repartition(nPart, col("p")).persist()
      val eU = edges.repartition(nPart, col("u")).persist()
      def foldSum(key: String, v: String): Column =
        graft.functions.KeyOrderedFold.sum(
          s, collect_list(struct(col(key), col(v))))
      def foldSumSq(key: String, v: String): Column =
        sqrt(graft.functions.KeyOrderedFold.sumSq(
          s, collect_list(struct(col(key), col(v)))))
      var h = eU.select("u").distinct()
        .select(col("u"), lit(1.0).as("h")).localCheckpoint()
      var a: DataFrame = null
      for (_ <- 1 to 6) {
        val aRaw = eP.join(broadcast(h), "u").groupBy("p")
          .agg(foldSum("u", "h").as("araw"))
          .localCheckpoint(eager = false)
        val aNrm = aRaw.agg(foldSumSq("p", "araw").as("nrm"))
        a = aRaw.crossJoin(broadcast(aNrm))
          .select(col("p"), (col("araw") / col("nrm")).as("a"))
        val hRaw = eU.join(broadcast(a), "p").groupBy("u")
          .agg(foldSum("p", "a").as("hraw"))
          .localCheckpoint(eager = false)
        val hNrm = hRaw.agg(foldSumSq("u", "hraw").as("nrm"))
        h = hRaw.crossJoin(broadcast(hNrm))
          .select(col("u"), (col("hraw") / col("nrm")).as("h"))
      }
      eP.unpersist(); eU.unpersist()
      val top = a.orderBy(col("a").desc, col("p")).limit(10)
      top.select(
          row_number().over(Window.orderBy(col("a").desc, col("p")))
            .cast(LongType).as("rnk"),
          col("p").cast(LongType).as("part"), col("a").as("authority"))
        .orderBy("rnk")
    }

    def time(label: String, mk: () => DataFrame): Unit = {
      mk().count()
      val t0 = System.nanoTime(); mk().count()
      val t1 = System.nanoTime(); mk().count()
      val t2 = System.nanoTime()
      println(f"SCRATCH $label ${math.min(t1 - t0, t2 - t1) / 1e9}%.3f")
    }
    time("p8", () => hits(8))
    time("p4", () => hits(4))
    time("p16", () => hits(16))
    time("p8b", () => hits(8))
    time("p4b", () => hits(4))
    spark.stop()
  }
}
