package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbour index.
  *
  * Brute-force cosine search is O(corpus × queries); the IVF scale
  * path clusters the corpus once (deterministic Lloyd's k-means) and
  * searches only the `nprobe` clusters nearest each query — at 100 TB
  * the cluster id becomes the partition key, so a query touches
  * `nprobe / k` of the data and each cluster scans independently.
  *
  * Determinism (so results are test- and gate-stable): centroids
  * initialize from the `k` lowest-id vectors, assignment ties break by
  * cluster id via lexicographic `min(struct(dist, cid))`, and centroid
  * means are exact averages of deterministic member sets.
  */
object IvfIndex {

  /** Squared L2 distance between a float-vector column and a
    * double-vector column, as a single fused HOF expression.
    */
  private def sqDist(v: Column, c: Column): Column =
    aggregate(
      zip_with(v, c, (x, y) => {
        val d = x.cast("double") - y
        d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Train `k` centroids with `iters` Lloyd iterations. Returns
    * (cluster_id: Int, centroid: Array[Double]). Centroid state lives
    * on the driver between iterations (k × dim doubles — model
    * parameters, not data).
    */
  def trainCentroids(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._

    var centroids: Seq[(Int, Seq[Double])] = emb
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](0).map(_.toDouble) }
      .toSeq

    for (_ <- 1 to iters) {
      val cdf = broadcast(centroids.toDF("cid", "centroid"))
      val assigned = emb.select(col(idCol), col(vecCol))
        .crossJoin(cdf)
        .groupBy(col(idCol), col(vecCol))
        .agg(min(struct(sqDist(col(vecCol), col("centroid")).as("d"),
          col("cid"))).getField("cid").as("cid"))
      centroids = assigned
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
        .toSeq.sortBy(_._1)
    }
    centroids.toDF("cid", "centroid")
  }

  /** Assign every corpus vector to its nearest centroid — the
    * "index build"; persist/partition the result by `cid` at scale.
    */
  def assign(emb: DataFrame, centroids: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .groupBy(emb.columns.map(col): _*)
      .agg(min(struct(sqDist(col(vecCol), col("centroid")).as("d"), col("cid")))
        .getField("cid").as("cid"))

  /** Top-`topK` cosine neighbours per query, scanning only each
    * query's `nprobe` nearest clusters.
    */
  def search(
      index: DataFrame,      // corpus with cid (from assign)
      centroids: DataFrame,
      queries: DataFrame,    // (q_id, q_emb)
      idCol: String,
      vecCol: String,
      nprobe: Int,
      topK: Int): DataFrame = {
    val probeW = Window.partitionBy("q_id").orderBy("d", "cid")
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("d", sqDist(col("q_emb"), col("centroid")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cid"))

    val cos = graft.functions.CosineSimilarity(
      index.sparkSession, col("q_emb"), col(vecCol))
    val rankW = Window.partitionBy("q_id").orderBy(desc("cos"), col(idCol))
    probes.join(index, Seq("cid"))
      .filter(col("q_id") =!= col(idCol))
      .withColumn("cos", cos)
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= topK)
      .select(col("q_id"), col(idCol).as("n_id"), col("cos"),
        col("rk").cast("long").as("rk"))
  }
}
