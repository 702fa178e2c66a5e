package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Round-6 gates: hash oracles for the deterministic half of the two
  * ANN recall gates (q45 IVF, q106 PQ). Their k-means indexes cannot
  * have a SQL oracle, but their brute-force recall BASELINES are
  * plain cosine top-k — these siblings run the exact same
  * [[AnnBaseline]] code path the recall floors consume and
  * hash-compare it against DuckDB, so the floors measure the indexes
  * against a proven baseline (see AnnBaseline's scaladoc).
  */
object Round102Queries {

  // ------------------------------------------- q45's baseline, hashed
  private val q45b = QueryDef(
    "q45b_ivf_bf_baseline",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
      val queries = AnnBaseline.queryPool(emb, stride = 50L)
      AnnBaseline.bruteForceTopK(s, emb, queries, k = 3, rankName = "bf_rk")
        .orderBy("q_id", "bf_rk")
    },
    Some(AnnBaseline.oracleSql(stride = 50L, k = 3, rankName = "bf_rk")),
    covers = Seq("SIM-ivf"))

  // ------------------------------------------ q106's baseline, hashed
  private val q106b = QueryDef(
    "q106b_pq_bf_baseline",
    (s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
      val queries = AnnBaseline.queryPool(emb, stride = 100L)
      AnnBaseline.bruteForceTopK(s, emb, queries, k = 5, rankName = "bf_rk")
        .orderBy("q_id", "bf_rk")
    },
    Some(AnnBaseline.oracleSql(stride = 100L, k = 5, rankName = "bf_rk")),
    covers = Seq("T-ann-pq"))

  val all: Seq[QueryDef] = Seq(q45b, q106b)
}
