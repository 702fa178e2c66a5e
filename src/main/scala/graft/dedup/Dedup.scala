package graft.dedup

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level near-duplicate removal: pairs → clusters → keep one
  * canonical document per cluster.
  *
  * Clustering is min-id label propagation with pointer jumping over
  * the pair edges (connected components without a graph library).
  * Each round does (1) adopt the smallest label among self and
  * neighbours — one hop — then (2) label-on-label doubling
  * (`label := label(label)`), which halves the remaining pointer
  * depth, so a chain of diameter d converges in O(log d) rounds —
  * plain one-hop propagation would need d rounds. Each round is two
  * joins + one aggregation — all shuffle-shaped, no driver-side
  * looping over rows. If `maxIters` is exhausted before the fixed
  * point a warning is logged: some clusters would then have more
  * than one canonical doc (under-deduplication), never a wrong merge.
  */
object Dedup extends Logging {

  /** Connected components over undirected `pairs` (doc_a, doc_b).
    * Returns (doc_id, cluster_id = min doc id reachable).
    */
  def clusters(pairs: DataFrame, maxIters: Int = 8): DataFrame = {
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
      // (1) one-hop min propagation. localCheckpoint truncates the
      // lineage each round — an iterative plan otherwise grows
      // exponentially and chokes the optimizer long before the data
      // does (at cluster scale use reliable checkpoint() instead).
      val neighbourMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("label")).as("nmin"))
      // checkpointed so the jump self-join reads it instead of
      // re-running the propagation twice (measured 6x slower without)
      val propagated = labels.join(neighbourMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint()
      // (2) pointer jumping: adopt your label's label (labels only
      // shrink, so this is safe and halves chain depth per round)
      val next = propagated.as("a")
        .join(
          propagated.select(col("doc_id").as("p_id"), col("label").as("p_label")),
          col("a.label") === col("p_id"), "left")
        .select(col("a.doc_id").as("doc_id"),
          coalesce(col("p_label"), col("a.label")).as("label"))
        .localCheckpoint()
      converged = next.join(labels.withColumnRenamed("label", "old"), "doc_id")
        .filter(col("label") =!= col("old")).isEmpty
      labels = next
      i += 1
    }
    if (!converged)
      logWarning(s"Dedup.clusters did not converge in $maxIters rounds; " +
        "some duplicate chains may retain multiple canonical docs — raise maxIters")
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
