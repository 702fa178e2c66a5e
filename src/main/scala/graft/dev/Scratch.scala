package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 9): same-JVM interleaved A/B of the
  * Expand-elimination rewrites (two-level pre-aggregate replacing
  * countDistinct-next-to-other-aggs) against the original shapes —
  * Prof's one-JVM-per-variant numbers drift ±30-40% between JVMs,
  * so only interleaved timings in ONE JVM decide whether a rewrite
  * ships.
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

    // ---- q358 ORIGINAL shape: countDistinct + sum in one agg (Expand)
    def q358Old(): DataFrame = {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      val per = t("lineitem")
        .join(broadcast(t("part")), col("l_partkey") === col("p_partkey"))
        .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(countDistinct(col("p_brand")).as("n_brands"),
          sum(rev).cast(DecimalType(38, 4)).as("r"))
        .withColumn("segment",
          when(col("n_brands") === 1, "1_loyal")
            .when(col("n_brands") <= 3, "2_mixed")
            .otherwise("3_broad"))
      val tot = per.agg(sum(col("r")).cast(DecimalType(38, 4)).as("t"),
        count(lit(1)).as("nc"))
      per.groupBy("segment")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("r")).cast(DecimalType(38, 4)).as("seg_rev"))
        .crossJoin(broadcast(tot))
        .select(col("segment"), col("n_customers"),
          (col("n_customers").cast("double") / col("nc").cast("double"))
            .as("customer_share"),
          (col("seg_rev").cast("double") / col("t").cast("double"))
            .as("revenue_share"),
          (col("seg_rev").cast("double") / col("n_customers").cast("double"))
            .as("rev_per_customer"))
        .orderBy("segment")
    }

    // ---- q327 ORIGINAL shape: double countDistinct (Expand x3)
    def q327Old(): DataFrame = {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      val per = t("lineitem")
        .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("s_nationkey")).as("n_nations"),
          sum(rev).as("rev"))
      val tot = per.agg(count(lit(1)).as("t_orders"), sum(col("rev")).as("t_rev"))
      per.groupBy("n_supp")
        .agg(count(lit(1)).as("n_orders"),
          max(col("n_nations")).as("max_nations"),
          sum(col("rev")).as("class_rev"))
        .crossJoin(broadcast(tot))
        .select(col("n_supp"), col("n_orders"), col("max_nations"),
          (col("n_orders").cast("double") / col("t_orders").cast("double"))
            .as("order_share"),
          (col("class_rev").cast("double") / col("t_rev").cast("double"))
            .as("revenue_share"))
        .orderBy("n_supp")
    }

    // ---- q288 with SHUFFLE_HASH hints on the wedge-closing probe:
    // the ~40M-row wedge frame is the stream side; hinting the edge
    // side as the hash build avoids SORTING the wedge stream (SMJ's
    // dominant cost) while keeping both sides partitioned — no
    // broadcast, same 100 TB shape.
    def q288Hashed(): DataFrame = {
      val e = graft.queries.GraphGateSource.copurchaseW(spark, dir).select("u", "v")
      val deg = e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val und = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val orient = und
        .join(deg.select(col("node").as("uu"), col("deg").as("du")),
          col("u") === col("uu"))
        .join(deg.select(col("node").as("vv"), col("deg").as("dv")),
          col("v") === col("vv"))
        .filter(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")))
        .select("u", "v")
        .localCheckpoint()
      val wedge = orient.as("e1").join(orient.as("e2").hint("shuffle_hash"),
          col("e1.u") === col("e2.u"))
        .filter(col("e1.v") < col("e2.v"))
        .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
      val tri = wedge.join(e.hint("shuffle_hash"),
        col("b") === col("u") && col("c") === col("v"))
        .select(col("a"), col("b"), col("c"))
      val triPerNode = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri"))
      deg.join(triPerNode, Seq("node"), "left")
        .withColumn("tri", coalesce(col("tri"), lit(0L)))
        .filter(col("deg") >= 2)
        .select(col("node"), col("deg"), col("tri"),
          ((lit(2L) * col("tri")).cast("double") /
            (col("deg") * (col("deg") - 1L)).cast("double")).as("coeff"))
        .orderBy(desc("deg"), asc("node"))
        .limit(50)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q358_old" -> (() => q358Old()),
      "q358_new" -> (() => graft.SparkEntry.queries("q358_brand_loyalty")(spark, dir)),
      "q327_old" -> (() => q327Old()),
      "q327_new" -> (() => graft.SparkEntry.queries("q327_sourcing_complexity")(spark, dir)),
      "q288_old" -> (() => graft.SparkEntry.queries("q288_clustering_coeff")(spark, dir)),
      "q288_hsh" -> (() => q288Hashed()))

    // warm all (codegen + AQE shapes)
    variants.foreach { case (_, f) => evaluate(f()) }
    // interleaved passes, min per variant
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to 3; (name, f) <- variants) {
      val t0 = System.nanoTime(); evaluate(f()); val dt = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
    }
    variants.foreach { case (name, _) => println(f"SCRATCH $name ${best(name)}%.3f") }
    spark.stop()
  }
}
