package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Highest-random-weight (rendezvous) shard assignment as a pure
  * column expression.
  *
  * `shardOf(key, n)` hashes the key once PER SHARD (md5 of
  * `key:shardId`) and assigns the shard whose hash wins — so growing
  * `n → n+1` moves only the keys whose NEW shard wins the weight
  * race, an expected 1/(n+1) of the corpus, where `key % n` reshuffles
  * ~n/(n+1) of it. That resize-stability is what makes rendezvous the
  * right router for sticky state at scale (per-shard dedup indexes,
  * session stores, cache shards): a topology change invalidates the
  * theoretical minimum, not everything.
  *
  * Mechanics: each arm packs a 56-bit md5-derived integer with its
  * shard id (`·16 + s`, ids < 16) so the `greatest` argmax needs ONE
  * long per arm and the winning id unpacks with `% 16` — narrow
  * per-row expressions, no explode, no aggregate, embarrassingly
  * parallel. md5 of identical strings is engine-identical, so
  * assignments reproduce anywhere (gated cross-engine as
  * `q232_rendezvous_sharding`).
  */
object RendezvousShard {

  /** Max shards packable next to the 56-bit weight. */
  val MaxShards = 16

  private def weight(key: Column, i: Int): Column =
    conv(substring(md5(concat(key.cast("string"),
      lit(s":$i")).cast("binary")), 1, 14), 16, 10).cast("long") * 16 + i

  /** Winning shard id in [0, n) for `key` under `n` shards. */
  def shardOf(key: Column, n: Int): Column = {
    require(n > 0 && n <= MaxShards, s"n must be in [1, $MaxShards], got $n")
    greatest((0 until n).map(weight(key, _)): _*) % MaxShards
  }
}
