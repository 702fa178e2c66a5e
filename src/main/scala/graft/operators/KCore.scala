package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition membership over an undirected edge list —
  * the maximal subgraph in which every node keeps at least k
  * neighbors. The standard "dense nucleus" extractor behind
  * community seeding, spam-farm detection, and graph sparsification;
  * completes the iterative-graph family next to [[Bfs]] (frontier
  * expansion) and [[PageRank]] (fixpoint scores).
  *
  * Algorithm: iterative peeling. Each round drops every node whose
  * current degree is below k, removes its edges, and repeats until
  * the surviving node count stops changing. Each round is one
  * groupBy (degree) + two semi-join-shaped equi-joins — all
  * hash-partitioned on node id, linear in |E| per round, no
  * driver-side data. Convergence is graph-dependent (the gate graph
  * fixpoints in ≈11 rounds); at cluster scale the per-round
  * `persist` should graduate to `localCheckpoint` every few rounds
  * to truncate lineage, exactly like [[PageRank]]'s loop.
  *
  * Degrees are exact integers, so membership and in-core degree are
  * partition-invariant and SQL-oracle-checkable: the q452 oracle
  * re-runs the same peel as an unrolled CTE chain in DuckDB.
  */
object KCore {

  /** (node, deg) for every node of the k-core, where `deg` is the
    * node's degree INSIDE the core. `edges` needs columns (`u`,`v`)
    * with each undirected edge listed once; self-loops are dropped.
    */
  def core(edges: DataFrame, k: Int, maxIter: Int = 100): DataFrame = {
    require(k >= 1 && maxIter >= 1)
    val one = edges.select(col("u"), col("v")).filter(col("u") =!= col("v"))
    // every round references `cur` three times (degree count + both
    // join sides), so without lineage truncation the plan tree grows
    // 3^rounds — localCheckpoint each round keeps it constant-depth
    // (reliable checkpoint() on a real cluster)
    var cur = one
      .unionAll(one.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint()
    var nodes = -1L
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val keep = cur.groupBy("u").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("u")
      val n = keep.count()
      if (n == nodes) done = true
      else {
        nodes = n
        cur = cur.join(keep, Seq("u"))
          .join(keep.select(col("u").as("v")), Seq("v"))
          .select("u", "v")
          .localCheckpoint()
      }
      iter += 1
    }
    // a partial peel is NOT a k-core: nodes with in-subgraph degree
    // < k would silently survive and diverge from any fixpoint
    // consumer (q452's oracle unrolls a FIXED round count that must
    // exceed the true fixpoint depth at every tested SF) — fail
    // loudly instead of returning a wrong subgraph
    if (!done)
      throw new IllegalStateException(
        s"k-core peel did not reach a fixpoint within $maxIter rounds " +
          "— raise maxIter (convergence depth is graph-dependent)")
    cur.groupBy("u").agg(count(lit(1)).as("deg"))
      .select(col("u").as("node"), col("deg"))
  }
}
