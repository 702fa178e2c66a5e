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

  // ----------------------------------- co-partitioned HITS, ranked
  // The 100 TB-shape HITS variant ([[graft.operators.Hits]] with
  // copartitioned = true: score repartition into the edge cache
  // layout instead of whole-vector broadcast, partial-agg sums,
  // two-level norm) under the SAME DuckDB recursion as q472 —
  // projected to (rnk, part) only, because the variant trades
  // bit-stable summation order for bounded shuffles and matches the
  // ordered-fold scores to ~1e-9, not to the bit. Ranks are immune:
  // adjacent top-10 authority separations measure ~1e-4 at gate SF
  // (vs ~1e-12 accumulation noise), so the float-free projection is
  // hash-deterministic. HitsVariantsSpec pins the per-node score
  // agreement; this gate pins the variant end-to-end against SQL.
  private val q529 = QueryDef(
    "q529_hits_copartitioned",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.LongType
      // session-scoped shared edge cache (one build per JVM for both
      // HITS gates × all bench executions — see GraphGateSource)
      val edges = GraphGateSource.custPartEdges(s, dir)
      // 4 iterations, not q472's 6: the top-10 authority RANKING —
      // all this float-free gate projects — settles at 4 rounds
      // (dev/HitsIters: iters-4 ≡ iters-6 part order at gate SF), the
      // oracle recursion below runs the matching 4 rounds, and
      // HitsVariantsSpec's broadcast-vs-copartitioned tolerance check
      // discriminates at any matched iteration count. q472 keeps 6 —
      // its output hashes the authority FLOATS, which do move.
      graft.operators.Hits
        .authorities(edges, iters = 4, parts = 0, copartitioned = true)
        .orderBy(col("authority").desc, col("p")).limit(10)
        .select(
          row_number().over(Window.orderBy(col("authority").desc, col("p")))
            .cast(LongType).as("rnk"),
          col("p").cast(LongType).as("part"))
        .orderBy("rnk")
    },
    Some(Round91Queries.hitsOracleSql(withAuthority = false, iters = 4)),
    covers = Seq("GRAPH-hits-copartitioned"))

  val all: Seq[QueryDef] = Seq(q45b, q106b, q529)
}
