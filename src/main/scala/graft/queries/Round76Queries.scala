package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-76 gate additions (q399–q403): Mann-Kendall trend test,
  * CUPED variance reduction, token branching factor, quantile-based
  * robust shape statistics, and an embedding clip audit.
  *
  * All follow the repo's exact-arithmetic discipline: aggregation in
  * integers/DECIMAL, doubles only as final per-row ratios (plus IEEE
  * sqrt), no `ln()`/transcendentals whose last-ulp behavior differs
  * between Spark and DuckDB.
  */
object Round76Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  // ------------------------------------------------- Mann-Kendall trend
  // Nonparametric monotone-trend test on the daily order-count series:
  // S = Σ_{i<j} sign(c_j − c_i) over day pairs, tie-corrected variance
  // var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, continuity-corrected
  // Z = (S∓1)/√var. Integer arithmetic until the final ratio. The
  // pair join is over DAYS, not rows — the calendar is fixed, so the
  // O(days²) pair count does NOT grow with scale factor; the only
  // scale-dependent stage is the first groupBy.
  private val q399 = QueryDef(
    "q399_mann_kendall",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("c"))
      val a = daily.select(col("d").as("da"), col("c").as("ca"))
      val b = daily.select(col("d").as("db"), col("c").as("cb"))
      val sPairs = a.join(b, col("da") < col("db"))
        .agg(coalesce(sum(signum(col("cb") - col("ca")).cast(LongType)),
          lit(0L)).as("s_stat"))
      val nDays = daily.agg(count(lit(1)).as("n_days"))
      val ties = daily.groupBy("c").agg(count(lit(1)).as("tie"))
        .agg(coalesce(sum(col("tie") * (col("tie") - 1L)
          * (lit(2L) * col("tie") + 5L)), lit(0L)).as("tie_term"))
      sPairs.crossJoin(broadcast(nDays)).crossJoin(broadcast(ties))
        .select(col("n_days"), col("s_stat"),
          ((col("n_days") * (col("n_days") - 1L)
            * (lit(2L) * col("n_days") + 5L) - col("tie_term"))
            .cast("double") / 18.0d).as("var_s"))
        .withColumn("z_stat",
          when(col("var_s") <= 0.0d, 0.0d)
            .when(col("s_stat") > 0L,
              (col("s_stat") - 1L).cast("double") / sqrt(col("var_s")))
            .when(col("s_stat") < 0L,
              (col("s_stat") + 1L).cast("double") / sqrt(col("var_s")))
            .otherwise(0.0d))
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY d),
      s AS (SELECT COALESCE(CAST(SUM(CAST(sign(b.c - a.c) AS BIGINT))
            AS BIGINT), 0) AS s_stat
        FROM daily a JOIN daily b ON a.d < b.d),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
      ties AS (SELECT COALESCE(CAST(SUM(tie * (tie - 1) * (2 * tie + 5))
            AS BIGINT), 0) AS tie_term
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS tie
              FROM daily GROUP BY c)),
      v AS (SELECT n_days, s_stat,
          CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
            AS DOUBLE) / 18.0 AS var_s
        FROM s, n, ties)
      SELECT n_days, s_stat, var_s,
        CASE WHEN var_s <= 0.0 THEN 0.0
             WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
             WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
             ELSE 0.0 END AS z_stat
      FROM v"""),
    covers = Seq("STAT-mann-kendall"))

  // ------------------------------------------------- CUPED adjustment
  // Experimentation-platform variance reduction: split the calendar at
  // its midpoint, x = a customer's pre-period spend (cents), y = the
  // post-period spend; per segment, θ = cov(x,y)/var(x) from exact
  // integer sums and the fraction of metric variance CUPED removes
  // (ρ² = corr²). One narrow scan + one per-customer shuffle; the
  // moment sums are mergeable partials, so the plan scales like any
  // grouped aggregate.
  private val q400 = QueryDef(
    "q400_cuped",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("cents"))
      val bounds = o.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        .select(date_add(col("d0"),
          (datediff(col("d1"), col("d0")) / 2).cast("int")).as("mid"))
      val perCust = o.crossJoin(broadcast(bounds))
        .groupBy("o_custkey")
        .agg(sum(when(col("d") < col("mid"), col("cents")).otherwise(0L))
          .as("x"),
          sum(when(col("d") >= col("mid"), col("cents")).otherwise(0L))
            .as("y"))
      val seg = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val g = perCust
        .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(dec38(col("x")) * dec38(col("y"))).as("sxy"),
          sum(dec38(col("x")) * dec38(col("x"))).as("sxx"),
          sum(dec38(col("y")) * dec38(col("y"))).as("syy"))
      val num = dec38(col("n_cust")) * col("sxy") - dec38(col("sx")) * dec38(col("sy"))
      val den1 = dec38(col("n_cust")) * col("sxx") - dec38(col("sx")) * dec38(col("sx"))
      val den2 = dec38(col("n_cust")) * col("syy") - dec38(col("sy")) * dec38(col("sy"))
      g.withColumn("num", num).withColumn("den1", den1).withColumn("den2", den2)
        .filter(col("den1") > 0 && col("den2") > 0)
        .withColumn("corr", col("num").cast("double") /
          (sqrt(col("den1").cast("double")) * sqrt(col("den2").cast("double"))))
        .select(col("segment"), col("n_cust"),
          (col("num").cast("double") / col("den1").cast("double")).as("theta"),
          (col("corr") * col("corr")).as("var_reduction"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders),
      bounds AS (SELECT MIN(d) + CAST(CAST(MAX(d) - MIN(d) AS BIGINT) / 2
          AS INTEGER) AS mid FROM o),
      pc AS (SELECT o_custkey,
          CAST(SUM(CASE WHEN d < mid THEN cents ELSE 0 END) AS BIGINT) AS x,
          CAST(SUM(CASE WHEN d >= mid THEN cents ELSE 0 END) AS BIGINT) AS y
        FROM o, bounds GROUP BY o_custkey),
      g AS (SELECT c_mktsegment AS segment,
          CAST(COUNT(*) AS BIGINT) AS n_cust,
          CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
          CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
          CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
          CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM pc JOIN customer ON o_custkey = c_custkey
        GROUP BY segment),
      f AS (SELECT segment, n_cust,
          CAST(n_cust AS HUGEINT) * sxy - sx * sy AS num,
          CAST(n_cust AS HUGEINT) * sxx - sx * sx AS den1,
          CAST(n_cust AS HUGEINT) * syy - sy * sy AS den2
        FROM g),
      r AS (SELECT segment, n_cust,
          CAST(num AS DOUBLE) / CAST(den1 AS DOUBLE) AS theta,
          CAST(num AS DOUBLE) / (sqrt(CAST(den1 AS DOUBLE))
            * sqrt(CAST(den2 AS DOUBLE))) AS corr
        FROM f WHERE den1 > 0 AND den2 > 0)
      SELECT segment, n_cust, theta, corr * corr AS var_reduction
      FROM r ORDER BY segment"""),
    covers = Seq("STAT-cuped"))

  // ------------------------------------------------- token branching
  // Language-model branching statistics per source: for each token,
  // its distinct-successor count and most-likely-successor mass from
  // in-row bigrams; per source, the frequency-weighted mean branching
  // factor (a perplexity proxy with no logs) and the top-successor
  // concentration Σ max_c / Σ c. Bigrams are built in-row (no
  // position self-join) — the only shuffles are the two counts.
  private val q401 = QueryDef(
    "q401_token_branching",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("source"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 2)
      val bg = d.select(col("source"),
        explode(expr("transform(sequence(1, size(tk) - 1), " +
          "i -> named_struct('prev', element_at(tk, i), " +
          "'nxt', element_at(tk, i + 1)))")).as("p"))
        .select(col("source"), col("p.prev"), col("p.nxt"))
      val succ = bg.groupBy("source", "prev", "nxt")
        .agg(count(lit(1)).as("c"))
      val perPrev = succ.groupBy("source", "prev")
        .agg(count(lit(1)).as("n_succ"), sum(col("c")).as("c_tot"),
          max(col("c")).as("c_max"))
      perPrev.groupBy("source")
        .agg(count(lit(1)).as("n_prev_types"),
          sum(col("c_tot")).as("n_bigrams"),
          sum(col("c_tot") * col("n_succ")).as("wb_num"),
          sum(col("c_max")).as("top_mass"))
        .select(col("source"), col("n_prev_types"), col("n_bigrams"),
          (col("wb_num").cast("double") / col("n_bigrams").cast("double"))
            .as("weighted_branching"),
          (col("top_mass").cast("double") / col("n_bigrams").cast("double"))
            .as("top_succ_share"))
        .orderBy("source")
    },
    Some("""WITH t AS (SELECT source, string_split(text, ' ') AS tk
          FROM documents WHERE len(string_split(text, ' ')) >= 2),
      b AS (SELECT source, unnest(list_zip(tk[1:len(tk)-1], tk[2:len(tk)]))
          AS bg FROM t),
      succ AS (SELECT source, bg[1] AS prev, bg[2] AS nxt,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM b GROUP BY 1, 2, 3),
      pp AS (SELECT source, prev, CAST(COUNT(*) AS BIGINT) AS n_succ,
          CAST(SUM(c) AS BIGINT) AS c_tot, CAST(MAX(c) AS BIGINT) AS c_max
        FROM succ GROUP BY source, prev)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_prev_types,
        CAST(SUM(c_tot) AS BIGINT) AS n_bigrams,
        CAST(SUM(c_tot * n_succ) AS DOUBLE) / CAST(SUM(c_tot) AS DOUBLE)
          AS weighted_branching,
        CAST(SUM(c_max) AS DOUBLE) / CAST(SUM(c_tot) AS DOUBLE)
          AS top_succ_share
      FROM pp GROUP BY source ORDER BY source"""),
    covers = Seq("TXT-branching"))

  // ------------------------------------------------- robust shape stats
  // Quantile-based distribution shape per market segment: Bowley
  // skewness (q1,q2,q3) and Moors kurtosis (octiles) of order value —
  // outlier-robust complements to the moment-based q143. All octiles
  // are percentile_disc picks of exact cents (actual data elements,
  // no interpolation), so every ratio is deterministic.
  private val q402 = QueryDef(
    "q402_robust_shape",
    (s, dir) => {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)
      // all seven octile order statistics share ONE distinct-value
      // rank-select pass (graft.operators.ExactQuantiles, bit-identical
      // to percentile_disc) instead of seven per-group value buffers
      val src = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), cents.as("cents"))
      val g = graft.operators.ExactQuantiles.disc(
          src, Seq("segment"), "cents",
          Seq(("e1d", 0.125), ("q1d", 0.25), ("e3d", 0.375), ("q2d", 0.5),
            ("e5d", 0.625), ("q3d", 0.75), ("e7d", 0.875)))
        .select(col("segment"), col("__group_n").as("n_orders"),
          col("e1d").cast(LongType).as("e1"), col("q1d").cast(LongType).as("q1"),
          col("e3d").cast(LongType).as("e3"), col("q2d").cast(LongType).as("q2"),
          col("e5d").cast(LongType).as("e5"), col("q3d").cast(LongType).as("q3"),
          col("e7d").cast(LongType).as("e7"))
      g.select(col("segment"), col("n_orders"), col("q1"), col("q2"),
          col("q3"),
          when(col("q3") > col("q1"),
            (col("q3") - lit(2L) * col("q2") + col("q1")).cast("double")
              / (col("q3") - col("q1")).cast("double"))
            .otherwise(0.0d).as("bowley_skew"),
          when(col("e5") =!= col("e3"),
            ((col("e7") - col("e5")) + (col("e3") - col("e1"))).cast("double")
              / (col("e5") - col("e3")).cast("double"))
            .otherwise(0.0d).as("moors_kurtosis"))
        .orderBy("segment")
    },
    Some("""WITH src AS (SELECT c_mktsegment AS segment,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey),
      g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
          CAST(percentile_disc(0.125) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS e1,
          CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q1,
          CAST(percentile_disc(0.375) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS e3,
          CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q2,
          CAST(percentile_disc(0.625) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS e5,
          CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS q3,
          CAST(percentile_disc(0.875) WITHIN GROUP (ORDER BY cents) AS BIGINT) AS e7
        FROM src GROUP BY segment)
      SELECT segment, n_orders, q1, q2, q3,
        CASE WHEN q3 > q1 THEN
          CAST(q3 - 2 * q2 + q1 AS DOUBLE) / CAST(q3 - q1 AS DOUBLE)
          ELSE 0.0 END AS bowley_skew,
        CASE WHEN e5 <> e3 THEN
          CAST((e7 - e5) + (e3 - e1) AS DOUBLE) / CAST(e5 - e3 AS DOUBLE)
          ELSE 0.0 END AS moors_kurtosis
      FROM g ORDER BY segment"""),
    covers = Seq("STAT-robust-shape"))

  // ------------------------------------------------- embedding clip audit
  // Pre-training normalization audit over sampled embedding
  // dimensions: per dim, the 1%/99% percentile_disc of the 2^20
  // fixed-point value and how many vectors an exclusive clip at those
  // bounds would touch — the per-dimension companion to the global
  // magnitude histogram (q279). One explode + one grouped agg with a
  // broadcast threshold join; row count is n_vecs × 16 dims.
  private val q403 = QueryDef(
    "q403_dim_clip_audit",
    (s, dir) => {
      val dims = (0 until 64 by 4).map(_.toLong)
      val e = t(s, dir, "embeddings").select(col("vec_id"),
        explode(expr("transform(sequence(0, 15), " +
          "i -> named_struct('dim', CAST(i * 4 AS BIGINT), " +
          "'q', CAST(floor(CAST(element_at(embedding, i * 4 + 1) AS DOUBLE) " +
          "* 1048576) AS BIGINT)))")).as("p"))
        .select(col("p.dim"), col("p.q"))
      val bounds = e.groupBy("dim")
        .agg(expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY q)")
          .cast(LongType).as("p01"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY q)")
            .cast(LongType).as("p99"))
      e.join(broadcast(bounds), Seq("dim"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n_vals"),
          max(col("p01")).as("p01"), max(col("p99")).as("p99"),
          sum(when(col("q") < col("p01") || col("q") > col("p99"), 1L)
            .otherwise(0L)).as("n_clipped"))
        .withColumn("clip_rate",
          col("n_clipped").cast("double") / col("n_vals").cast("double"))
        .orderBy("dim")
    },
    Some("""WITH dims AS (SELECT CAST(unnest(range(0, 64, 4)) AS BIGINT) AS dim),
      e AS (SELECT dim,
          CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 1048576)
            AS BIGINT) AS q
        FROM embeddings, dims),
      b AS (SELECT dim,
          CAST(percentile_disc(0.01) WITHIN GROUP (ORDER BY q) AS BIGINT) AS p01,
          CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY q) AS BIGINT) AS p99
        FROM e GROUP BY dim)
      SELECT e.dim, CAST(COUNT(*) AS BIGINT) AS n_vals,
        MAX(p01) AS p01, MAX(p99) AS p99,
        CAST(SUM(CASE WHEN q < p01 OR q > p99 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clipped,
        CAST(SUM(CASE WHEN q < p01 OR q > p99 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS clip_rate
      FROM e JOIN b ON e.dim = b.dim
      GROUP BY e.dim ORDER BY e.dim"""),
    covers = Seq("EMB-clip-audit"))

  val all: Seq[QueryDef] =
    Seq(q399, q400, q401, q402, q403)
}
