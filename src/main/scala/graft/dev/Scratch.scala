package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 9, continued): same-JVM adjudication of
  * the two remaining rewrites that only had cross-JVM evidence —
  * q444's TopKPerKey swap and q519's per-part whitespace fold — at
  * sf0.1 and the sf1 rung.
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

    // ---- q444 old: row_number window top-20 per month
    def q444Old(): DataFrame = {
      val li = t("lineitem")
        .select(col("l_partkey"),
          (year(to_date(col("l_shipdate"))) * 12 +
            month(to_date(col("l_shipdate")))).cast(LongType).as("mk"),
          ((col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(4, 2)) -
              col("l_discount").cast(DecimalType(4, 2)))) * 10000)
            .cast(LongType).as("rev4"))
      val pm = li.groupBy("mk", "l_partkey").agg(sum("rev4").as("rev"))
      val w = Window.partitionBy("mk")
        .orderBy(col("rev").desc, col("l_partkey"))
      val top = pm.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("mk"), col("l_partkey"))
      val sizes = top.groupBy("mk").agg(count(lit(1)).as("sz"))
      val nxt = top.select((col("mk") - 1L).as("mk"), col("l_partkey"))
      val common = top.join(nxt, Seq("mk", "l_partkey"))
        .groupBy("mk").agg(count(lit(1)).as("n_common"))
      sizes.as("s1")
        .join(sizes.as("s2").select((col("mk") - 1L).as("mk"),
          col("sz").as("sz_next")), Seq("mk"))
        .join(common, Seq("mk"), "left")
        .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
        .select(col("mk"), col("sz"), col("sz_next"), col("n_common"),
          (col("n_common").cast("double") /
            (col("sz") + col("sz_next") - col("n_common")).cast("double"))
            .as("jaccard"))
        .orderBy("mk")
    }

    // ---- q519 old: pairs-join + left-anti probe
    def q519Old(): DataFrame = {
      val sb = t("lineitem")
        .join(t("orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t("customer").select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment")), Seq("o_custkey"))
        .groupBy("segment", "l_partkey")
        .agg(sum(((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(4, 2)) -
            col("l_discount").cast(DecimalType(4, 2)))) * 10000)
          .cast(LongType)).as("rev4"))
        .localCheckpoint()
      val segs = sb.select("segment").distinct()
      val pairs = segs.as("a").crossJoin(segs.as("b"))
        .filter(col("a.segment") =!= col("b.segment"))
        .select(col("a.segment").as("seg_a"), col("b.segment").as("seg_b"))
      pairs
        .join(sb.select(col("segment").as("seg_a"), col("l_partkey"),
          col("rev4")), Seq("seg_a"))
        .join(sb.select(col("segment").as("seg_b"), col("l_partkey"),
          lit(true).as("b_has")), Seq("seg_b", "l_partkey"), "left")
        .filter(col("b_has").isNull)
        .groupBy("seg_a", "seg_b")
        .agg(count(lit(1)).as("n_whitespace_parts"),
          sum("rev4").as("rev_at_stake4"))
        .orderBy("seg_a", "seg_b")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q444_old" -> (() => q444Old()),
      "q444_new" -> (() => gate("q444_topk_turnover")),
      "q519_old" -> (() => q519Old()),
      "q519_new" -> (() => gate("q519_assortment_whitespace")))

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
