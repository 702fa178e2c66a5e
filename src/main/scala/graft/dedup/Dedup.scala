package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level near-duplicate removal: pairs → clusters → keep one
  * canonical document per cluster.
  *
  * Clustering is iterative min-id label propagation over the pair
  * edges (connected components without a graph library): each round,
  * every doc adopts the smallest label among itself and its
  * neighbours; fixed-point is reached in O(log(diameter)) rounds and
  * near-dup clusters are tiny (pairs/triples), so `maxIters` of 5 is
  * generous. Each round is one join + one aggregation — all
  * shuffle-shaped, no driver-side looping over rows.
  */
object Dedup {

  /** Connected components over undirected `pairs` (doc_a, doc_b).
    * Returns (doc_id, cluster_id = min doc id reachable).
    */
  def clusters(pairs: DataFrame, maxIters: Int = 5): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("doc_id"))
      .distinct()
      .withColumn("label", col("doc_id"))
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      val neighbourMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("label")).as("nmin"))
      val next = labels.join(neighbourMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .cache()
      converged = next.join(labels.withColumnRenamed("label", "old"), "doc_id")
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
      i += 1
    }
    edges.unpersist()
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** Remove near-duplicates: given the corpus and its near-dup pairs,
    * keep the lowest-id document of every cluster (plus all unpaired
    * docs untouched).
    */
  def dropNearDuplicates(
      corpus: DataFrame,
      pairs: DataFrame,
      idCol: String): DataFrame = {
    val cl = clusters(pairs)
    val losers = cl.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }
}
