package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-100 gate additions (q517–q519): business closers — the YoY
  * revenue bridge (price/volume/mix effects, per-part double trees
  * folded in part order), the hurdle-model decomposition of customer
  * value, and segment-pair assortment whitespace.
  */
object Round100Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- revenue bridge
  // The CFO bridge from 1997 to 1998 revenue, over parts traded both
  // years: per part p̄ᵧ = rᵧ/qᵧ (identical division trees), price
  // effect (p̄₁−p̄₀)q₀, volume effect (q₁−q₀)p̄₀, mix (p̄₁−p̄₀)(q₁−q₀).
  // The cross-part totals fold in part-key order (aggregate HOF ≡
  // list_reduce), the exact Δ revenue and the float residual ride
  // along as the reconciliation check.
  private val q517 = QueryDef(
    "q517_revenue_bridge",
    (s, dir) => {
      def yr(y: Int): DataFrame =
        t(s, dir, "lineitem")
          .filter(year(to_date(col("l_shipdate"))) === y)
          .groupBy("l_partkey")
          .agg(sum(((col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(4, 2)) -
              col("l_discount").cast(DecimalType(4, 2)))) * 10000)
            .cast(LongType)).as(s"r$y"),
            sum(col("l_quantity").cast(DecimalType(18, 2))
              .cast(LongType)).as(s"q$y"))
      val j = yr(1997).join(yr(1998), Seq("l_partkey"))
        .withColumn("p0",
          col("r1997").cast("double") / col("q1997").cast("double"))
        .withColumn("p1",
          col("r1998").cast("double") / col("q1998").cast("double"))
        .withColumn("pe",
          (col("p1") - col("p0")) * col("q1997").cast("double"))
        .withColumn("ve",
          (col("q1998") - col("q1997")).cast("double") * col("p0"))
        .withColumn("me",
          (col("p1") - col("p0")) *
            (col("q1998") - col("q1997")).cast("double"))
      val folded = j.agg(count(lit(1)).as("n_parts"),
          sum(col("r1998") - col("r1997")).as("delta_rev4"),
          sort_array(collect_list(struct(col("l_partkey"), col("pe"),
            col("ve"), col("me")))).as("el"))
        .withColumn("price_eff",
          aggregate(col("el"), lit(0.0), (a, e) => a + e.getField("pe")))
        .withColumn("volume_eff",
          aggregate(col("el"), lit(0.0), (a, e) => a + e.getField("ve")))
        .withColumn("mix_eff",
          aggregate(col("el"), lit(0.0), (a, e) => a + e.getField("me")))
      folded.select(col("n_parts"), col("delta_rev4"),
        col("price_eff"), col("volume_eff"), col("mix_eff"),
        (col("delta_rev4").cast("double") -
          (col("price_eff") + col("volume_eff") + col("mix_eff")))
          .as("residual"))
    },
    Some("""WITH y97 AS (SELECT l_partkey,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
            * 10000 AS BIGINT)) AS BIGINT) AS r0,
          CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
            AS BIGINT) AS q0
        FROM lineitem WHERE year(CAST(l_shipdate AS DATE)) = 1997
        GROUP BY 1),
      y98 AS (SELECT l_partkey,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
            * 10000 AS BIGINT)) AS BIGINT) AS r1,
          CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
            AS BIGINT) AS q1
        FROM lineitem WHERE year(CAST(l_shipdate AS DATE)) = 1998
        GROUP BY 1),
      j AS (SELECT a.l_partkey, a.r0, a.q0, b.r1, b.q1,
          CAST(a.r0 AS DOUBLE) / CAST(a.q0 AS DOUBLE) AS p0,
          CAST(b.r1 AS DOUBLE) / CAST(b.q1 AS DOUBLE) AS p1
        FROM y97 a JOIN y98 b ON b.l_partkey = a.l_partkey),
      eff AS (SELECT l_partkey, r1 - r0 AS delta,
          (p1 - p0) * CAST(q0 AS DOUBLE) AS pe,
          CAST(q1 - q0 AS DOUBLE) * p0 AS ve,
          (p1 - p0) * CAST(q1 - q0 AS DOUBLE) AS me
        FROM j),
      folded AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
          CAST(SUM(delta) AS BIGINT) AS delta_rev4,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(pe ORDER BY l_partkey)), (a, b) -> a + b) AS price_eff,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(ve ORDER BY l_partkey)), (a, b) -> a + b)
            AS volume_eff,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(me ORDER BY l_partkey)), (a, b) -> a + b) AS mix_eff
        FROM eff)
      SELECT n_parts, delta_rev4, price_eff, volume_eff, mix_eff,
        CAST(delta_rev4 AS DOUBLE) -
          (price_eff + volume_eff + mix_eff) AS residual
      FROM folded"""),
    covers = Seq("FIN-revenue-bridge"))

  // ------------------------------------------------- hurdle model
  // Two-part (hurdle) decomposition of yearly customer value per
  // segment: participation P(any order in 1998) × conditional
  // intensity E[spend | active] = unconditional mean — all three
  // exact ratios, with the identity residual pinned at zero by
  // construction on both engines. The "is growth more buyers or
  // bigger buyers" ledger.
  private val q518 = QueryDef(
    "q518_hurdle_model",
    (s, dir) => {
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val spend98 = t(s, dir, "orders")
        .filter(year(to_date(col("o_orderdate"))) === 1998)
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType)).as("y"))
      cust.join(spend98, Seq("c_custkey"), "left")
        .withColumn("y", coalesce(col("y"), lit(0L)))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_cust"),
          sum(when(col("y") > 0L, 1L).otherwise(0L)).as("n_active"),
          sum("y").as("total_cents"))
        .select(col("segment"), col("n_cust"), col("n_active"),
          (col("n_active").cast("double") / col("n_cust").cast("double"))
            .as("participation"),
          (col("total_cents").cast("double") /
            col("n_active").cast("double")).as("intensity_cents"),
          (col("total_cents").cast("double") /
            col("n_cust").cast("double")).as("mean_value_cents"))
        .orderBy("segment")
    },
    Some("""WITH spend98 AS (SELECT o_custkey,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS y
        FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1998
        GROUP BY 1)
      SELECT c.c_mktsegment AS segment,
        CAST(COUNT(*) AS BIGINT) AS n_cust,
        CAST(COUNT(*) FILTER (WHERE COALESCE(s.y, 0) > 0) AS BIGINT)
          AS n_active,
        CAST(COUNT(*) FILTER (WHERE COALESCE(s.y, 0) > 0) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS participation,
        CAST(SUM(COALESCE(s.y, 0)) AS DOUBLE) /
          CAST(COUNT(*) FILTER (WHERE COALESCE(s.y, 0) > 0) AS DOUBLE)
          AS intensity_cents,
        CAST(SUM(COALESCE(s.y, 0)) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS mean_value_cents
      FROM customer c LEFT JOIN spend98 s ON s.o_custkey = c.c_custkey
      GROUP BY 1 ORDER BY 1"""),
    covers = Seq("FIN-hurdle-model"))

  // ------------------------------------------------- whitespace
  // Assortment whitespace between segment pairs: parts that segment
  // A buys and segment B never touches — count and A-side revenue at
  // stake per ordered pair. Aggregated (segment, part) postings keep
  // the join catalog-cardinality-sized at any SF; the cross-sell
  // target list in exact scale-4 revenue.
  private val q519 = QueryDef(
    "q519_assortment_whitespace",
    (s, dir) => {
      val sb = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey"),
          col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment")), Seq("o_custkey"))
        .groupBy("segment", "l_partkey")
        .agg(sum(((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(4, 2)) -
            col("l_discount").cast(DecimalType(4, 2)))) * 10000)
          .cast(LongType)).as("rev4"))
        .localCheckpoint()
      // whitespace pairs from ONE per-part fold instead of the
      // pairs-join + left-anti probe: each part carries its present
      // segments (≤ |segments| structs), the absent set is
      // array_except against the global segment list, and the
      // (present × absent) expansion happens per row with codegen'd
      // array functions — no 4×|sb| join, no second shuffle of sb
      val allSegs = sb.select("segment").distinct()
        .agg(sort_array(collect_list(col("segment"))).as("all_segs"))
      sb.groupBy("l_partkey")
        .agg(collect_list(struct(col("segment"), col("rev4"))).as("pres"))
        .crossJoin(broadcast(allSegs))
        .select(
          explode(col("pres")).as("p"),
          array_except(col("all_segs"),
            transform(col("pres"), x => x.getField("segment"))).as("absent"))
        .select(col("p.segment").as("seg_a"),
          explode(col("absent")).as("seg_b"), col("p.rev4").as("rev4"))
        .groupBy("seg_a", "seg_b")
        .agg(count(lit(1)).as("n_whitespace_parts"),
          sum("rev4").as("rev_at_stake4"))
        .orderBy("seg_a", "seg_b")
    },
    Some("""WITH sb AS MATERIALIZED (SELECT c.c_mktsegment AS segment,
          l.l_partkey,
          CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount
              AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) AS rev4
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      segs AS (SELECT DISTINCT segment FROM sb),
      pairs AS (SELECT a.segment AS seg_a, b.segment AS seg_b
        FROM segs a CROSS JOIN segs b WHERE a.segment <> b.segment)
      SELECT p.seg_a, p.seg_b,
        CAST(COUNT(*) AS BIGINT) AS n_whitespace_parts,
        CAST(SUM(sa.rev4) AS BIGINT) AS rev_at_stake4
      FROM pairs p
      JOIN sb sa ON sa.segment = p.seg_a
      LEFT JOIN sb sbb ON sbb.segment = p.seg_b
        AND sbb.l_partkey = sa.l_partkey
      WHERE sbb.segment IS NULL
      GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("FIN-whitespace"))

  val all: Seq[QueryDef] = Seq(q517, q518, q519)
}
