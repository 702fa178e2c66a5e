package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 9): price of the q105-class rogue-
  * broadcast pin on q22's pair pipeline at the sf1 rung — hinted
  * (registry) vs unhinted sizes joins, same JVM, interleaved.
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

    // q22's pair pipeline WITHOUT the shuffle_hash pin (pre-audit shape)
    def q22Unhinted(): DataFrame = {
      val sh = t("documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(graft.functions.WordShingles(spark, col("text"), 3)).as("s"))
      val sizes = sh.groupBy("doc_id").agg(countDistinct(col("s")).as("n"))
      val ds = col("ds")
      val pairs = sh.groupBy("s")
        .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(ds).between(2, 1000))
        .select(explode(graft.functions.OrderedPairs(spark, ds)).as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("common"))
      pairs
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard",
          col("common").cast("double") / (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= 0.4)
        .select("doc_a", "doc_b", "common", "na", "nb", "jaccard")
        .orderBy("doc_a", "doc_b")
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q22_unhinted" -> (() => q22Unhinted()),
      "q22_hinted  " -> (() => gate("q22_ngram_jaccard")))

    variants.foreach { case (_, f) => evaluate(f()) }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (_ <- 1 to 2; (name, f) <- variants) {
      val t0 = System.nanoTime(); evaluate(f()); val dt = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
    }
    variants.foreach { case (name, _) => println(f"SCRATCH $name ${best(name)}%.3f") }
    spark.stop()
  }
}
