package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 9): FULL same-JVM re-adjudication of the
  * quantile-gate rewrites. The cross-JVM Prof numbers that motivated
  * them are suspect (the built-in percentile buffer is
  * DISTINCT-compressed — an OpenHashMap of value→count — so its cost
  * is O(distinct), not O(rows), and the first "before" measurements
  * may have been contended JVMs). Every shipped rewrite gets its old
  * shape timed against the registry shape in ONE JVM, interleaved.
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
    def gate(n: String): DataFrame = graft.SparkEntry.queries(n)(spark, dir)

    def evaluate(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---------- old q40
    def q40Old(): DataFrame = {
      val li = t("lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.99D), 1000)")
            .as("pa"),
          expr("percentile(l_extendedprice, array(0.45D, 0.55D, 0.985D, 0.995D))")
            .as("pe"))
        .select(col("l_returnflag"), col("exact_parts"),
          (col("ap").cast("double") >= col("exact_parts") * 0.9 &&
            col("ap").cast("double") <= col("exact_parts") * 1.1)
            .cast("long").as("hll_within_10pct"),
          (element_at(col("pa"), 1) >= element_at(col("pe"), 1) &&
            element_at(col("pa"), 1) <= element_at(col("pe"), 2))
            .cast("long").as("p50_in_band"),
          (element_at(col("pa"), 2) >= element_at(col("pe"), 3) &&
            element_at(col("pa"), 2) <= element_at(col("pe"), 4))
            .cast("long").as("p99_in_band"))
        .orderBy("l_returnflag")
    }

    // ---------- old q190
    def q190Old(): DataFrame = t("lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_percentile(col("l_extendedprice"), array(lit(0.5), lit(0.9), lit(0.99)),
          lit(10000)).as("approx_p"),
        expr("percentile(l_extendedprice, array(0.49D, 0.51D, 0.89D, " +
          "0.91D, 0.985D, 0.995D))").as("bands"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n"),
        (element_at(col("approx_p"), 1) >= element_at(col("bands"), 1) &&
          element_at(col("approx_p"), 1) <= element_at(col("bands"), 2))
          .cast("long").as("p50_in_band"),
        (element_at(col("approx_p"), 2) >= element_at(col("bands"), 3) &&
          element_at(col("approx_p"), 2) <= element_at(col("bands"), 4))
          .cast("long").as("p90_in_band"),
        (element_at(col("approx_p"), 3) >= element_at(col("bands"), 5) &&
          element_at(col("approx_p"), 3) <= element_at(col("bands"), 6))
          .cast("long").as("p99_in_band"))
      .orderBy("l_returnflag")

    // ---------- old q164
    def q164Old(): DataFrame = t("lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY l_quantity)").as("p10"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").as("p90"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice)").as("price_p99"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

    // ---------- old q361
    def q361Old(): DataFrame = {
      val n4 = ((col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2))))
        .cast(DecimalType(18, 4)) * 10000).cast(LongType)
      val cents = expr("n4 DIV (100 * qty)")
      val per = t("lineitem")
        .join(broadcast(t("part")), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"), col("l_partkey").as("pk"),
          n4.as("n4"), col("l_quantity").cast(LongType).as("qty"))
        .select(col("brand"), col("pk"), cents.as("c"))
        .groupBy("brand", "pk")
        .agg(count(lit(1)).as("n_sales"),
          expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("p10"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("p50"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("p90"))
        .filter(col("n_sales") >= 3 && col("p50") > 0)
        .withColumn("disp",
          (col("p90") - col("p10")).cast("double") / col("p50").cast("double"))
      per.groupBy("brand")
        .agg(count(lit(1)).as("n_parts"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY disp)")
            .as("median_dispersion"))
        .orderBy("brand")
    }

    // ---------- old q402
    def q402Old(): DataFrame = {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)
      def pd(p: Double) =
        expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY cents)")
          .cast(LongType)
      t("orders")
        .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), cents.as("cents"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_orders"),
          pd(0.125).as("e1"), pd(0.25).as("q1"), pd(0.375).as("e3"),
          pd(0.5).as("q2"), pd(0.625).as("e5"), pd(0.75).as("q3"),
          pd(0.875).as("e7"))
        .orderBy("segment")
    }

    // ---------- old q419 cut stage (isolated)
    def q419CutOld(): DataFrame = {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)
      val cy = t("orders")
        .groupBy(col("o_custkey"),
          year(to_date(col("o_orderdate"))).cast(LongType).as("yr"))
        .agg(sum(cents).as("spend"))
      cy.groupBy("yr")
        .agg(expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY spend)")
          .cast(LongType).as("p90"))
    }
    def q419CutNew(): DataFrame = {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)
      val cy = t("orders")
        .groupBy(col("o_custkey"),
          year(to_date(col("o_orderdate"))).cast(LongType).as("yr"))
        .agg(sum(cents).as("spend"))
      graft.operators.ExactQuantiles.disc(cy, Seq("yr"), "spend", Seq(("p90d", 0.9)))
        .select(col("yr"), col("p90d").cast(LongType).as("p90"))
    }

    // q40 with ONLY the countDistinct split (builtin percentile bands):
    // isolates whether ExactQuantiles contributes anything to q40's win
    def q40SplitOnly(): DataFrame = {
      val li = t("lineitem")
      val exact = li.select("l_returnflag", "l_partkey").distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_parts"))
      li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.99D), 1000)")
            .as("pa"),
          expr("percentile(l_extendedprice, array(0.45D, 0.55D, 0.985D, 0.995D))")
            .as("pe"))
        .join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"),
          (col("ap").cast("double") >= col("exact_parts") * 0.9 &&
            col("ap").cast("double") <= col("exact_parts") * 1.1)
            .cast("long").as("hll_within_10pct"),
          (element_at(col("pa"), 1) >= element_at(col("pe"), 1) &&
            element_at(col("pa"), 1) <= element_at(col("pe"), 2))
            .cast("long").as("p50_in_band"),
          (element_at(col("pa"), 2) >= element_at(col("pe"), 3) &&
            element_at(col("pa"), 2) <= element_at(col("pe"), 4))
            .cast("long").as("p99_in_band"))
        .orderBy("l_returnflag")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q40_old    " -> (() => q40Old()),
      "q40_new    " -> (() => gate("q40_approx_distinct")),
      "q40_split  " -> (() => q40SplitOnly()),
      "q190_old   " -> (() => q190Old()),
      "q190_new   " -> (() => gate("q190_approx_percentile")),
      "q164_old   " -> (() => q164Old()),
      "q164_new   " -> (() => gate("q164_percentile_disc")),
      "q361_old   " -> (() => q361Old()),
      "q361_new   " -> (() => gate("q361_price_dispersion")),
      "q402_old   " -> (() => q402Old()),
      "q402_new   " -> (() => gate("q402_robust_shape")),
      "q419cut_old" -> (() => q419CutOld()),
      "q419cut_new" -> (() => q419CutNew()))

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
