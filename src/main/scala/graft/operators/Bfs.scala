package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop breadth-first search over an edge list — the frontier
  * query behind "everything within k hops of these seeds" (blast
  * radius, neighborhood sampling, graph decontamination). Distances
  * are exact integers, so results are partition-invariant and
  * SQL-oracle-checkable (q152), like [[PageRank]].
  *
  * Each hop is one edges⋈distances equi-join + a min-aggregation —
  * cost linear in |E| per hop. The relaxation joins the FULL
  * distance table rather than only the new frontier: one join per
  * hop instead of frontier bookkeeping, and the min() absorbs
  * re-reached nodes. (With a small active frontier an anti-join
  * narrowing would trade an extra shuffle for a smaller probe; at
  * the gate's density the simple form wins.) Like PageRank, the
  * edge list is hash-partitioned on src once and cached, so per-hop
  * shuffles move only the distance vector.
  */
object Bfs {

  /** (node, dist) for every node within `maxHops` of any seed.
    * `edges` has string columns (`src`, `dst`); `seeds` a `node`
    * column. Unreached nodes are absent, seeds are dist 0.
    */
  def distances(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val e = edges.repartition(col("src")).persist()
    var d = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("dist"))
    for (_ <- 1 to maxHops) {
      d = d.unionAll(
          e.join(d, e("src") === d("node"))
            .select(e("dst").as("node"), (col("dist") + 1).as("dist")))
        .groupBy("node").agg(min(col("dist")).as("dist"))
    }
    // materialize, then release the cached edge blocks — without this
    // every invocation leaks |E| cached partitions until a periodic
    // GC happens to run (the final localCheckpoint makes the result
    // independent of e's lineage, so the unpersist is safe)
    val res = if (maxHops > 0) d.localCheckpoint() else d
    e.unpersist()
    res
  }

  /** Per-seed distances for MANY seeds in one relaxation: (seed,
    * node, dist) for every node within `maxHops` of each seed. All
    * seeds share each hop's single edges⋈frontier join (the state is
    * keyed by (seed, node)), so k seeds cost one traversal, not k —
    * the difference between 6 and 6k shuffles for a hop-histogram
    * over sampled seeds (q496). Each hop localCheckpoints: the state
    * self-references once per hop and eager materialization keeps
    * every hop a shallow job instead of one 6-level chain.
    */
  def perSeedDistances(edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val e = edges.repartition(col("src")).persist()
    var d = seeds.select(col("node")).distinct()
      .select(col("node").as("seed"), col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    for (_ <- 1 to maxHops) {
      d = d.unionAll(
          e.join(d, e("src") === d("node"))
            .select(col("seed"), e("dst").as("node"),
              (col("dist") + 1).as("dist")))
        .groupBy("seed", "node").agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    // the last hop's localCheckpoint already materialized d
    // independent of e's lineage — release the cached edge blocks
    // instead of leaking them until a periodic GC
    e.unpersist()
    d
  }
}
