package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 9): how much of the tier-2 gates'
  * ~1.5 s floor is the SINGLE-TASK scan? The driver's parquet files
  * have ONE row group each (pyarrow-checked), so a scan cannot split
  * and the fused scan→project→partial-agg pipeline runs on one core
  * while 31 idle. Probes: bare count, plain decimal-revenue agg, and
  * the same agg behind a repartition(32) that trades one 30 MB
  * shuffle for 32-way arithmetic parallelism.
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
    def t(name: String): DataFrame = graft.Tables.load(spark, dir, name)

    def evaluate(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) -
        col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))

    def monthAgg(src: DataFrame): DataFrame = src
      .groupBy(date_trunc("month", to_date(col("l_shipdate")))
        .cast("date").as("month"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        sum(rev).as("rev"),
        sum(when(col("l_returnflag") === "R", rev)
          .otherwise(lit(0).cast(DecimalType(18, 4)))).as("rev_returned"))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scan_count " -> (() => t("lineitem").groupBy().count()),
      "agg_1task  " -> (() => monthAgg(t("lineitem"))),
      "agg_repart " -> (() => monthAgg(t("lineitem").repartition(32))))

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
