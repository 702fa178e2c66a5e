package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 9): does q288's SHUFFLE_HASH lesson
  * (SMJ was sorting the huge stream side; the win only shows at the
  * sf1 rung) transfer to q379's 2-hop expansion?
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

    def evaluate(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def q379(hinted: Boolean): DataFrame = {
      val cw = graft.queries.GraphGateSource.copurchaseW(spark, dir)
      val e = cw.select(col("u"), col("v"))
        .unionAll(cw.select(col("v").as("u"), col("u").as("v")))
      val h1 = e.filter(col("u") % 50 === 0)
      val h1x = if (hinted) h1.as("x").hint("shuffle_hash") else h1.as("x")
      val h2 = h1x.join(e.as("y"), col("x.v") === col("y.u"))
        .select(col("x.u").as("u"), col("y.v").as("v"))
        .filter(col("u") =!= col("v")).distinct()
        .join(broadcast(h1), Seq("u", "v"), "left_anti")
      val c1 = h1.groupBy("u").agg(count(lit(1)).as("n1"))
      val c2 = h2.groupBy("u").agg(count(lit(1)).as("n2"))
      c1.join(c2, Seq("u"), "left")
        .withColumn("n2", coalesce(col("n2"), lit(0L)))
        .select(col("u").as("part"), col("n1"), col("n2"),
          (col("n1").cast("double") +
            col("n2").cast("double") / lit(2.0d)).as("harmonic"))
        .orderBy(desc("harmonic"), asc("part")).limit(20)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q379_unhinted" -> (() => q379(hinted = false)),
      "q379_hinted  " -> (() => q379(hinted = true)))

    variants.foreach { case (_, f) => evaluate(f()) }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to 3; (name, f) <- variants) {
      val t0 = System.nanoTime(); evaluate(f()); val dt = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
    }
    variants.foreach { case (name, _) => println(f"SCRATCH $name ${best(name)}%.3f") }
    spark.stop()
  }
}
