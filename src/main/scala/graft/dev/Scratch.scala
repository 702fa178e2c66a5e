package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

    def viaString(): DataFrame = {
      val e0 = graft.Tables.load(spark, dir, "lineitem")
        .join(graft.Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
        .persist()
      val edges = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.PageRank.ranks(edges, iters = 2)
        .select(col("node"), col("r").as("rank_fp"))
        .orderBy(col("rank_fp").desc, col("node"))
        .limit(20)
    }

    def viaLong(): DataFrame = {
      val e0 = graft.Tables.load(spark, dir, "lineitem")
        .join(graft.Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
        .persist()
      val edges = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.PageRank.ranks(edges, iters = 2)
        .select(
          when(col("node") % 2 === 0, concat(lit("c"), (col("node") / 2).cast("long")))
            .otherwise(concat(lit("s"), ((col("node") - 1) / 2).cast("long")))
            .as("node"),
          col("r").as("rank_fp"))
        .orderBy(col("rank_fp").desc, col("node"))
        .limit(20)
    }

    def time(label: String, mk: () => DataFrame): Unit = {
      mk().count()
      val t0 = System.nanoTime(); mk().count()
      val t1 = System.nanoTime(); mk().count()
      val t2 = System.nanoTime()
      println(f"SCRATCH $label ${math.min(t1 - t0, t2 - t1) / 1e9}%.3f")
    }
    // parity check first: same top-20
    // bounded-collect: both frames are .limit(20) outputs
    val a = viaString().collect().map(_.toString).toSeq
    val b = viaLong().collect().map(_.toString).toSeq
    println("SCRATCH parity " + (a == b))
    time("string", () => viaString())
    time("long", () => viaLong())
    time("string2", () => viaString())
    time("long2", () => viaLong())
    spark.stop()
  }
}
