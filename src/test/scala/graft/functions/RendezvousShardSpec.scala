package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RendezvousShardSpec extends SparkSpec {

  test("assignments are in range, deterministic, and roughly balanced") {
    import spark.implicits._
    val keys = (0L until 2000L).toDF("k")
    val counts = keys
      .select(RendezvousShard.shardOf(col("k"), 8).as("s"))
      .groupBy("s").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet.forall(s => s >= 0 && s < 8))
    assert(counts.size == 8, s"empty shards: $counts")
    // md5 weights spread uniformly; 2000 keys over 8 shards ≈ 250 ± noise
    assert(counts.values.forall(c => c > 150 && c < 350), counts.toString)
    // determinism: re-evaluation yields the identical assignment
    val twice = keys.select(
      RendezvousShard.shardOf(col("k"), 8).as("a"),
      RendezvousShard.shardOf(col("k"), 8).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(twice == 0L)
  }

  test("growing n by one moves ~1/(n+1) of keys and never unmoved winners") {
    import spark.implicits._
    val keys = (0L until 2000L).toDF("k")
    val moved = keys.select(
      RendezvousShard.shardOf(col("k"), 8).as("s8"),
      RendezvousShard.shardOf(col("k"), 9).as("s9"))
    val n = moved.count()
    val m = moved.filter(col("s8") =!= col("s9")).count()
    // expected 1/9 ≈ 11%; allow generous noise either side
    assert(m.toDouble / n > 0.05 && m.toDouble / n < 0.20,
      s"moved $m of $n keys on 8->9 grow")
    // a moved key must land on the NEW shard (id 8): the old winner
    // among shards 0-7 cannot change when shard 8 is added
    val wrong = moved.filter(col("s8") =!= col("s9") && col("s9") =!= 8).count()
    assert(wrong == 0L, s"$wrong keys moved to a non-new shard")
  }
}
