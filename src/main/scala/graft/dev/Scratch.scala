package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 9): PageRank's per-iteration
  * localCheckpoints are EAGER — one scheduler job each. HITS uses
  * lazy checkpoints for its half-step frames. Does lazy save the
  * fixed job overhead at shallow iteration counts without losing the
  * lineage truncation?
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

    def decode(node: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(node % 2 === 0, concat(lit("c"), (node / 2).cast("long")))
        .otherwise(concat(lit("s"), ((node - 1) / 2).cast("long")))

    def viaOperator(): DataFrame = {
      val e0 = graft.queries.GraphGateSource.cached(spark, "cust-supp:" + dir)(
        graft.Tables.load(spark, dir, "lineitem")
          .join(graft.Tables.load(spark, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct())
      val edges = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.PageRank.ranks(edges, iters = 2)
        .select(decode(col("node")).as("node"), col("r").as("rank_fp"))
        .orderBy(col("rank_fp").desc, col("node"))
        .limit(20)
    }

    // lazy-checkpoint variant of PageRank.ranks (iters = 2)
    def lazyRanks(edges: DataFrame, iters: Int): DataFrame = {
      val scale = 1000000000000L
      val e = edges.repartition(col("src")).persist()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().persist()
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .localCheckpoint(eager = false)
      val nRow = nodes.agg(count(lit(1)).as("n"))
      val teleport = expr(s"(15 * ($scale DIV n)) DIV 100")
      var r = nodes.crossJoin(broadcast(nRow))
        .select(col("node"), expr(s"$scale DIV n").as("r"))
        .localCheckpoint(eager = false)
      for (_ <- 1 to iters) {
        val contrib = e
          .join(r, e("src") === r("node"))
          .join(deg, "src")
          .select(col("dst").as("node"), expr("r DIV outdeg").as("c"))
          .groupBy("node").agg(sum(col("c")).as("contrib"))
        r = nodes.join(contrib, Seq("node"), "left")
          .crossJoin(broadcast(nRow))
          .select(col("node"),
            (teleport + expr(s"(85 * coalesce(contrib, 0L)) DIV 100")).as("r"))
          .localCheckpoint(eager = false)
      }
      r
    }

    def viaLazy(): DataFrame = {
      val e0 = graft.queries.GraphGateSource.cached(spark, "cust-supp:" + dir)(
        graft.Tables.load(spark, dir, "lineitem")
          .join(graft.Tables.load(spark, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct())
      val edges = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      lazyRanks(edges, iters = 2)
        .select(decode(col("node")).as("node"), col("r").as("rank_fp"))
        .orderBy(col("rank_fp").desc, col("node"))
        .limit(20)
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "pr_eager" -> (() => viaOperator()),
      "pr_lazy " -> (() => viaLazy()))

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
