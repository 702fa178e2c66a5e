package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 gate additions (q190+): the quantile member of the
  * sketch family (HLL q40/q96, CMS q160, Bloom q99 — approx
  * percentile completes the set), and the disjunctive-join rewrite
  * that keeps OR-predicate joins off the nested-loop path.
  */
object Round13Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------ approx percentiles
  // Mergeable quantile summary (Greenwald-Khanna) per group — the
  // sketch answer to q50's exact sort-based percentiles. The sketch
  // returns an element within rank-error n/accuracy of the true
  // order statistic, so the raw values can't hash-match an oracle —
  // but the rank BANDS can: each approx percentile is checked
  // against generous exact interpolated bands (±1 rank percent for
  // p50/p90, [98.5, 99.5] for p99 — accuracy 10000 keeps the true
  // error two orders below the band), and the oracle pins the flags
  // to 1. Round13QueriesSpec still pins the raw estimates against
  // exact order statistics. At 100 TB the sketch is one pass + tiny
  // merges where exact percentiles need a full sort per group.
  private val q190 = QueryDef(
    "q190_approx_percentile",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      // exact bands via graft.operators.ExactQuantiles (distinct-value
      // rank-select, bit-identical to percentile() — fuzz-pinned in
      // ExactQuantilesSpec). Regime note (same-JVM A/B): with FEW
      // LARGE groups the built-in's per-group value buffer grows with
      // the data and loses one decade up (sf1: 7.8 s vs 6.0 s) while
      // costing slightly less at sf0.1 — the shipped shape is the one
      // that survives the scale-up
      val bands = graft.operators.ExactQuantiles.cont(
        li, Seq("l_returnflag"), "l_extendedprice",
        Seq(("b50lo", 0.49), ("b50hi", 0.51), ("b90lo", 0.89),
          ("b90hi", 0.91), ("b99lo", 0.985), ("b99hi", 0.995)))
      li.groupBy("l_returnflag")
        .agg(
          approx_percentile(col("l_extendedprice"), array(lit(0.5), lit(0.9), lit(0.99)),
            lit(10000)).as("approx_p"),
          count(lit(1)).as("n"))
        .join(bands, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"),
          (element_at(col("approx_p"), 1) >= col("b50lo") &&
            element_at(col("approx_p"), 1) <= col("b50hi"))
            .cast("long").as("p50_in_band"),
          (element_at(col("approx_p"), 2) >= col("b90lo") &&
            element_at(col("approx_p"), 2) <= col("b90hi"))
            .cast("long").as("p90_in_band"),
          (element_at(col("approx_p"), 3) >= col("b99lo") &&
            element_at(col("approx_p"), 3) <= col("b99hi"))
            .cast("long").as("p99_in_band"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(1 AS BIGINT) AS p50_in_band,
        CAST(1 AS BIGINT) AS p90_in_band,
        CAST(1 AS BIGINT) AS p99_in_band
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    covers = Seq("A-approx-percentile"))

  // ------------------------------------------------- disjunctive join
  // OR-predicate equi-join: orders match customers directly
  // (o_custkey) OR through a second derived key. Planned naively the
  // OR forces BroadcastNestedLoopJoin — O(n·m) predicate
  // evaluations. The engine form is the standard rewrite: one
  // equi-join PER disjunct, unioned, deduplicated on the output key
  // (a pair matching both arms must appear once) — all hash joins,
  // plan-guarded. The oracle writes the naive OR join; agreement
  // proves the rewrite exact, duplicates included.
  private val q191 = QueryDef(
    "q191_disjunctive_join",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_orderkey") % 1500).as("gift_key"))
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
      val direct = o.join(c, col("o_custkey") === col("c_custkey"))
      val gifted = o.join(c, col("gift_key") === col("c_custkey"))
      direct.unionByName(gifted)
        .select(col("o_orderkey"), col("c_custkey"), col("c_acctbal"))
        .distinct()
        .orderBy("o_orderkey", "c_custkey")
    },
    Some("""SELECT DISTINCT o_orderkey, c_custkey, c_acctbal
      FROM (SELECT o_orderkey, o_custkey, o_orderkey % 1500 AS gift_key
            FROM orders WHERE o_orderkey % 50 = 0) o
      JOIN customer ON o_custkey = c_custkey OR gift_key = c_custkey
      ORDER BY o_orderkey, c_custkey"""),
    covers = Seq("J-disjunctive"))

  val all: Seq[QueryDef] =
    Seq(q190, q191)
}
