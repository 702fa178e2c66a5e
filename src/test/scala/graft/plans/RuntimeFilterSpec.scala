package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** At 100 TB the cheapest row is the one never shuffled: Spark's
  * runtime bloom-filter injection builds a filter from the selective
  * (dimension) side of a shuffle join and applies it to the fact side
  * BEFORE the exchange, cutting shuffle volume by the join
  * selectivity. This spec pins the conditions under which the
  * optimizer actually injects it (shuffle join, selective creation
  * side, thresholds), so the engine's scale story isn't folklore.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective join side injects a bloom filter on the fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("rtf").toString
    import spark.implicits._
    spark.range(100000).select(col("id").as("k"),
      (col("id") % 1000).as("v")).write.parquet(s"$dir/fact")
    spark.range(10000).select(col("id").as("k"),
      (col("id") % 7).as("cat")).write.parquet(s"$dir/dim")

    val old = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // the local test data is KBs; drop the size gate that exists to
      // keep tiny scans from paying the filter-build cost
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join — a broadcast join already prunes via
      // the broadcast relation, bloom filters only help exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 3)
      val joined = fact.join(dim, "k")
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("might_contain"),
        s"no bloom filter injected:\n$physical")
      // and it still computes the right thing
      assert(joined.count() == 10000 / 7 + 1)
    } finally old.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
