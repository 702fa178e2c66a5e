package graft.dev

import org.apache.spark.sql.SparkSession

/** Throwaway measurement harness for plan experiments (not part of
  * the library surface; contents change per investigation).
  *
  * Current experiment (round 9): does `count()` — the action Bench
  * and ScaleSlopes use — let Catalyst ELIMINATE cardinality-preserving
  * left joins (right side distinct on the join key), silently pruning
  * a gate's real work out of the measurement? Hypothesis raised by
  * q109/q530 showing byte-identical shuffle totals at sf1 despite
  * different candidate stages. Prints the optimized count() plan vs
  * the full-evaluation (noop-sink) plan for both gates, plus timings
  * under each action.
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

    for (gate <- Seq("q109_curation_pipeline", "q530_curation_lsh")) {
      val fn = graft.SparkEntry.queries(gate)
      val dfCount = fn(spark, dir).groupBy().count()
      val countPlan = dfCount.queryExecution.optimizedPlan.toString
      val dfFull = fn(spark, dir)
      val fullPlan = dfFull.queryExecution.optimizedPlan.toString
      def sig(p: String): String = Seq(
        "minhash" -> p.toLowerCase.contains("minhash"),
        "orderedpairs" -> p.toLowerCase.contains("orderedpairs"),
        "joins" -> ("n=" + "Join".r.findAllIn(p).length)).map {
        case (k, v) => s"$k:$v"
      }.mkString(" ")
      println(s"SCRATCH $gate count-plan  ${sig(countPlan)}")
      println(s"SCRATCH $gate full-plan   ${sig(fullPlan)}")

      def time(label: String, act: () => Unit): Unit = {
        act() // warm
        val t0 = System.nanoTime(); act()
        val t1 = System.nanoTime(); act()
        val t2 = System.nanoTime()
        println(f"SCRATCH $gate $label ${math.min(t1 - t0, t2 - t1) / 1e9}%.3f")
      }
      time("count", () => { fn(spark, dir).count(); () })
      time("noop ", () => fn(spark, dir).write
        .format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
