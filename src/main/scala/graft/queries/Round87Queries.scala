package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.dedup.Dedup
import graft.operators.KCore

/** Round-87 gate additions (q452–q456): iterative graph structure
  * (k-core, percolation components) gated against unrolled DuckDB
  * fixpoint re-derivations, plus record-breaking days, Lorenz
  * asymmetry, and quartile price dispersion. The graph oracles are
  * program-generated CTE chains — peeling and min-label propagation
  * unrolled past their measured fixpoint (11 rounds on the gate
  * graph), so the iterative operators are hash-gated exactly, not
  * rows-only.
  */
object Round87Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Co-purchase part pairs (u < v) with their order-co-occurrence
    * weight — the shared edge base of q452/q456.
    */
  // session-scoped shared weighted co-purchase cache — one
  // order-part self-join per JVM for the whole graph-gate family
  private def copurchase(s: SparkSession, dir: String): DataFrame =
    GraphGateSource.copurchaseW(s, dir)

  private val copurchaseSql: String =
    """op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem),
      pw AS MATERIALIZED (SELECT a.p AS u, b.p AS v,
        CAST(COUNT(*) AS BIGINT) AS w
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2)"""

  // ------------------------------------------------- k-core
  // 3-core of the repeat-co-purchase graph (weight ≥ 2): the dense
  // nucleus of the catalog after peeling every weakly-attached part.
  // Spark side iterates graft.operators.KCore to the true fixpoint;
  // the oracle replays the same peel as a 14-round unrolled CTE
  // chain (the gate graph fixpoints in 11) — an iterative operator
  // under an exact hash gate.
  private val q452 = QueryDef(
    "q452_kcore",
    (s, dir) => {
      val e = copurchase(s, dir).filter(col("w") >= 2).select("u", "v")
      KCore.core(e, 3)
        .select(col("node").cast(LongType).as("node"), col("deg"))
        .orderBy("node")
    },
    Some {
      val peel = (0 until 14).map { i =>
        s"""k$i AS MATERIALIZED (SELECT u FROM e$i GROUP BY u HAVING COUNT(*) >= 3),
      e${i + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e$i e
        JOIN k$i a ON a.u = e.u JOIN k$i b ON b.u = e.v)"""
      }.mkString(",\n      ")
      s"""WITH $copurchaseSql,
      ew AS MATERIALIZED (SELECT u, v FROM pw WHERE w >= 2),
      e0 AS MATERIALIZED (SELECT u, v FROM ew UNION ALL SELECT v, u FROM ew),
      $peel
      SELECT CAST(u AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS deg
      FROM e14 GROUP BY u ORDER BY node"""
    },
    covers = Seq("GRAPH-kcore"))

  // ------------------------------------------------- percolation
  // Component structure of the co-purchase graph as the edge-weight
  // threshold rises — the percolation curve that locates where the
  // giant component dissolves into islands. Components from
  // graft.dedup.Dedup (union-find / label propagation); the oracle
  // re-derives min-reachable labels by 14 unrolled rounds of
  // min-label propagation per threshold.
  private val q456 = QueryDef(
    "q456_percolation",
    (s, dir) => {
      // one-pass incremental census: the three thresholded edge sets
      // are nested, so Dedup.percolation collects the weighted edges
      // ONCE and grows a single size-tracking union-find from thr=3
      // down to thr=1 — replacing three independent collect + solve +
      // aggregate rounds (co-purchase graphs stay ≤ a few M edges
      // even at sf1, well under the cap; past it the same call falls
      // back to per-threshold distributed label propagation)
      Dedup.percolation(copurchase(s, dir), Seq(1L, 2L, 3L),
          maxIters = 20, localEdgeCap = 1L << 23)
        .select(col("threshold"), col("n_nodes"), col("n_components"),
          col("giant"),
          (col("giant").cast("double") / col("n_nodes").cast("double"))
            .as("giant_share"))
        .orderBy("threshold")
    },
    Some {
      def perThreshold(thr: Int): String = {
        val prop = (0 until 14).map { i =>
          s"""l${thr}_${i + 1} AS MATERIALIZED (SELECT e.u AS node,
          LEAST(MIN(l.lab), MIN(s.lab)) AS lab
        FROM ed$thr e JOIN l${thr}_$i l ON l.node = e.v
        JOIN l${thr}_$i s ON s.node = e.u GROUP BY e.u)"""
        }.mkString(",\n      ")
        s"""ew$thr AS MATERIALIZED (SELECT u, v FROM pw WHERE w >= $thr),
      ed$thr AS MATERIALIZED (SELECT u, v FROM ew$thr
        UNION ALL SELECT v, u FROM ew$thr),
      l${thr}_0 AS MATERIALIZED (SELECT u AS node, u AS lab
        FROM (SELECT DISTINCT u FROM ed$thr)),
      $prop,
      cs$thr AS (SELECT lab, CAST(COUNT(*) AS BIGINT) AS sz
        FROM l${thr}_14 GROUP BY lab),
      st$thr AS (SELECT CAST($thr AS BIGINT) AS threshold,
        CAST(SUM(sz) AS BIGINT) AS n_nodes,
        CAST(COUNT(*) AS BIGINT) AS n_components,
        CAST(MAX(sz) AS BIGINT) AS giant,
        CAST(MAX(sz) AS DOUBLE) / CAST(SUM(sz) AS DOUBLE)
          AS giant_share
        FROM cs$thr)"""
      }
      s"""WITH $copurchaseSql,
      ${perThreshold(1)},
      ${perThreshold(2)},
      ${perThreshold(3)}
      SELECT * FROM st1 UNION ALL SELECT * FROM st2
      UNION ALL SELECT * FROM st3 ORDER BY threshold"""
    },
    covers = Seq("GRAPH-percolation"))

  // ------------------------------------------------- record days
  // Record-breaking revenue days per segment: a day is a record when
  // it strictly exceeds every earlier day's revenue. Exact cents
  // against a shifted running max — the "all-time high" census whose
  // expected count grows only logarithmically for exchangeable
  // series, so an excess is itself a trend signal.
  private val q453 = QueryDef(
    "q453_record_days",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val daily = t(s, dir, "orders").join(seg, Seq("o_custkey"))
        .groupBy(col("segment"), to_date(col("o_orderdate")).as("day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType)).as("rev"))
      val w = Window.partitionBy("segment").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
      daily.withColumn("prevmax", max("rev").over(w))
        .withColumn("is_record",
          col("prevmax").isNull || col("rev") > col("prevmax"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("is_record"), 1L).otherwise(0L)).as("n_records"),
          max(when(col("is_record"), col("day"))).as("last_record_day"))
        .orderBy("segment")
    },
    Some("""WITH daily AS (SELECT c.c_mktsegment AS segment,
          CAST(o.o_orderdate AS DATE) AS day,
          CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS rev
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      r AS (SELECT segment, day, rev,
          MAX(rev) OVER (PARTITION BY segment ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS prevmax
        FROM daily)
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(COUNT(*) FILTER (WHERE prevmax IS NULL OR rev > prevmax)
          AS BIGINT) AS n_records,
        MAX(day) FILTER (WHERE prevmax IS NULL OR rev > prevmax)
          AS last_record_day
      FROM r GROUP BY segment ORDER BY segment"""),
    covers = Seq("STAT-record-days"))

  // ------------------------------------------------- Lorenz asymmetry
  // Is inequality driven by a few giants or many minnows? The Lorenz
  // asymmetry coefficient S = F(μ) + L(μ): the population share
  // below the mean plus their spend share. Membership is decided by
  // the exact integer comparison n·x < Σx (never a float mean), the
  // two shares are single divisions; S < 1 means inequality comes
  // from the small end, S > 1 from the giants.
  private val q454 = QueryDef(
    "q454_lorenz_asymmetry",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val spend = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType)).as("x"))
        .join(seg, Seq("o_custkey"))
      val tot = spend.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"))
      spend.join(broadcast(tot), Seq("segment"))
        .withColumn("below", col("n") * col("x") < col("sx"))
        .groupBy("segment", "n", "sx")
        .agg(sum(when(col("below"), 1L).otherwise(0L)).as("n_below"),
          sum(when(col("below"), col("x")).otherwise(0L)).as("sx_below"))
        .select(col("segment"), col("n").as("n_cust"), col("n_below"),
          (col("n_below").cast("double") / col("n").cast("double"))
            .as("f_mu"),
          (col("sx_below").cast("double") / col("sx").cast("double"))
            .as("l_mu"),
          (col("n_below").cast("double") / col("n").cast("double") +
            col("sx_below").cast("double") / col("sx").cast("double"))
            .as("asymmetry"))
        .orderBy("segment")
    },
    Some("""WITH spend AS (SELECT o.o_custkey,
          c.c_mktsegment AS segment,
          CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS x
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      tot AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx
        FROM spend GROUP BY segment)
      SELECT s.segment, t.n AS n_cust,
        CAST(COUNT(*) FILTER (WHERE t.n * s.x < t.sx) AS BIGINT)
          AS n_below,
        CAST(COUNT(*) FILTER (WHERE t.n * s.x < t.sx) AS DOUBLE) /
          CAST(t.n AS DOUBLE) AS f_mu,
        CAST(SUM(s.x) FILTER (WHERE t.n * s.x < t.sx) AS DOUBLE) /
          CAST(t.sx AS DOUBLE) AS l_mu,
        CAST(COUNT(*) FILTER (WHERE t.n * s.x < t.sx) AS DOUBLE) /
          CAST(t.n AS DOUBLE) +
        CAST(SUM(s.x) FILTER (WHERE t.n * s.x < t.sx) AS DOUBLE) /
          CAST(t.sx AS DOUBLE) AS asymmetry
      FROM spend s JOIN tot t ON t.segment = s.segment
      GROUP BY s.segment, t.n, t.sx ORDER BY s.segment"""),
    covers = Seq("STAT-lorenz-asymmetry"))

  // ------------------------------------------------- price CQV
  // Quartile coefficient of dispersion of catalog prices per brand:
  // (Q3−Q1)/(Q3+Q1) from percentile_disc integer picks — the
  // outlier-robust relative spread that survives the heavy tail a
  // CV would chase. One division per brand.
  private val q455 = QueryDef(
    "q455_price_cqv",
    (s, dir) => {
      val p = t(s, dir, "part")
        .select(col("p_brand"),
          (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("cents"))
      p.groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)")
            .cast(LongType).as("q1"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)")
            .cast(LongType).as("med"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)")
            .cast(LongType).as("q3"))
        .select(col("p_brand"), col("n_parts"), col("q1"), col("med"),
          col("q3"),
          ((col("q3") - col("q1")).cast("double") /
            (col("q3") + col("q1")).cast("double")).as("cqv"))
        .orderBy("p_brand")
    },
    Some("""WITH p AS (SELECT p_brand,
          CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents
        FROM part)
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
        CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
          AS BIGINT) AS q1,
        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)
          AS BIGINT) AS med,
        CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents)
          AS BIGINT) AS q3,
        CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) -
          percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
          AS DOUBLE) /
        CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) +
          percentile_disc(0.25) WITHIN GROUP (ORDER BY cents)
          AS DOUBLE) AS cqv
      FROM p GROUP BY p_brand ORDER BY p_brand"""),
    covers = Seq("STAT-price-cqv"))

  val all: Seq[QueryDef] = Seq(q452, q453, q454, q455, q456)
}
