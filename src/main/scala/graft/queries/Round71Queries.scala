package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-71 gate additions (q374–q378): rank-based testing, quantile
  * time series, normalization sensitivity, stratified independence,
  * and early-value concentration.
  */
object Round71Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- Kruskal-Wallis
  // Rank-based K-sample location test of order value across market
  // segments: H = 12/(N(N+1))·ΣR_j²/n_j − 3(N+1). Ranks are UNIQUE
  // over the (cents, orderkey) total order (the deterministic
  // tie-break stands in for average ranks, stated up front), so every
  // rank sum is an exact long; the 5 rational segment terms fold in
  // fixed segment order.
  private val q374 = QueryDef(
    "q374_kruskal_wallis",
    (s, dir) => {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)
      val o = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), cents.as("c"),
          col("o_orderkey"))
      // GLOBAL rank over ALL ORDERS — the round-12 window audit's
      // worst row-scale single-partition window; now the two-phase
      // value-bucketed form (operators/GlobalOrder, bit-identical by
      // GlobalOrderSpec)
      val ranked = graft.operators.GlobalOrder.rowNumber(
          o, col("c"), leadDesc = false,
          Seq(col("c"), col("o_orderkey")), "rk")
        .withColumn("rk", col("rk").cast(LongType))
      val g = ranked.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("rk")).as("rsum"))
        .withColumn("term", col("rsum").cast("double") *
          col("rsum").cast("double") / col("n").cast("double"))
      val tot = g.agg(sum(col("n")).as("nn"),
        aggregate(sort_array(collect_list(struct(col("segment"), col("term")))),
          lit(0.0d), (a, x) => a + x.getField("term")).as("fold"))
      g.crossJoin(broadcast(tot))
        .select(col("segment"), col("n").as("n_orders"),
          (col("rsum").cast("double") / col("n").cast("double"))
            .as("mean_rank"),
          (lit(12.0d) / (col("nn").cast("double") *
            (col("nn") + 1L).cast("double")) * col("fold") -
            lit(3.0d) * (col("nn") + 1L).cast("double")).as("kw_h"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT c_mktsegment AS segment,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
          o_orderkey
        FROM orders JOIN customer ON o_custkey = c_custkey),
      r AS (SELECT segment,
          CAST(row_number() OVER (ORDER BY c, o_orderkey) AS BIGINT) AS rk
        FROM o),
      g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(rk) AS BIGINT) AS rsum
        FROM r GROUP BY segment),
      tm AS (SELECT segment, n, rsum,
          CAST(rsum AS DOUBLE) * CAST(rsum AS DOUBLE) / CAST(n AS DOUBLE)
            AS term
        FROM g),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
          CAST(0 AS DOUBLE) + list_reduce(list(term ORDER BY segment),
            (a, b) -> a + b) AS fold
        FROM tm)
      SELECT segment, n AS n_orders,
        CAST(rsum AS DOUBLE) / CAST(n AS DOUBLE) AS mean_rank,
        CAST(12 AS DOUBLE) / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))
          * fold - CAST(3 AS DOUBLE) * CAST(nn + 1 AS DOUBLE) AS kw_h
      FROM tm, tot
      ORDER BY segment"""),
    covers = Seq("STAT-kruskal"))

  // ------------------------------------------------- quantile series
  // Order-value quantiles as a monthly time series: P50/P90/P99 in
  // exact cents per month — the percentile control chart, one grouped
  // order-statistic pass.
  private val q375 = QueryDef(
    "q375_monthly_value_quantiles",
    (s, dir) => {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)
      t(s, dir, "orders")
        .select(date_trunc("month", to_date(col("o_orderdate")))
          .cast("date").as("month"), cents.as("c"))
        .groupBy("month")
        .agg(count(lit(1)).as("n_orders"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("p50_cents"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("p90_cents"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("p99_cents"))
        .orderBy("month")
    },
    Some("""SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE))
          AS DATE) AS month,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
          AS BIGINT) AS p50_cents,
        CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
          AS BIGINT) AS p90_cents,
        CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
          AS BIGINT) AS p99_cents
      FROM orders
      GROUP BY month
      ORDER BY month"""),
    covers = Seq("TS-quantile-series"))

  // ------------------------------------------------- normalization tiers
  // How sensitive is dedup to normalization? Distinct-doc counts
  // under three keys — exact text, lowercased, and
  // whitespace-collapsed lowercase — per language. The gap between
  // tiers is the dup mass each normalization step would additionally
  // collapse.
  private val q376 = QueryDef(
    "q376_normalization_tiers",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("distinct_exact"),
          countDistinct(lower(col("text"))).as("distinct_lower"),
          countDistinct(regexp_replace(lower(col("text")), " +", " "))
            .as("distinct_norm"))
        .select(col("lang"), col("n_docs"), col("distinct_exact"),
          col("distinct_lower"), col("distinct_norm"),
          (col("distinct_exact") - col("distinct_norm")).as("extra_collapsed"))
        .orderBy("lang")
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(COUNT(DISTINCT text) AS BIGINT) AS distinct_exact,
        CAST(COUNT(DISTINCT lower(text)) AS BIGINT) AS distinct_lower,
        CAST(COUNT(DISTINCT regexp_replace(lower(text), ' +', ' ', 'g'))
          AS BIGINT) AS distinct_norm,
        CAST(COUNT(DISTINCT text) AS BIGINT)
          - CAST(COUNT(DISTINCT regexp_replace(lower(text), ' +', ' ', 'g'))
            AS BIGINT) AS extra_collapsed
      FROM documents
      GROUP BY lang
      ORDER BY lang"""),
    covers = Seq("DD-normalization-tiers"))

  // ------------------------------------------------- stratified independence
  // Is (lang ⫫ source) WITHIN each length band? Per band the
  // chi-square statistic over observed cells against the within-band
  // marginal expectation — Simpson's-paradox insurance for the q206
  // global test. Every cell term is rational from exact counts and
  // folds in fixed (lang, source) order per band.
  private val q377 = QueryDef(
    "q377_stratified_independence",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .select(expr("n_chars DIV 400").as("band"), col("lang"),
          col("source"))
      val cells = d.groupBy("band", "lang", "source")
        .agg(count(lit(1)).as("o"))
      val rows = d.groupBy("band", "lang").agg(count(lit(1)).as("rt"))
      val cols = d.groupBy("band", "source").agg(count(lit(1)).as("ct"))
      val tots = d.groupBy("band").agg(count(lit(1)).as("tt"))
      val terms = cells.join(rows, Seq("band", "lang"))
        .join(cols, Seq("band", "source"))
        .join(tots, Seq("band"))
        .withColumn("e", col("rt").cast("double") * col("ct").cast("double") /
          col("tt").cast("double"))
        .withColumn("term",
          (col("o").cast("double") - col("e")) *
            (col("o").cast("double") - col("e")) / col("e"))
      terms.groupBy("band")
        .agg(count(lit(1)).as("n_cells"), first(col("tt")).as("n_docs"),
          aggregate(sort_array(collect_list(
            struct(col("lang"), col("source"), col("term")))),
            lit(0.0d), (a, x) => a + x.getField("term")).as("chi2"))
        .orderBy("band")
    },
    Some("""WITH d AS (SELECT n_chars // 400 AS band, lang, source
          FROM documents),
      cells AS (SELECT band, lang, source, CAST(COUNT(*) AS BIGINT) AS o
                FROM d GROUP BY band, lang, source),
      r AS (SELECT band, lang, CAST(COUNT(*) AS BIGINT) AS rt
            FROM d GROUP BY band, lang),
      c AS (SELECT band, source, CAST(COUNT(*) AS BIGINT) AS ct
            FROM d GROUP BY band, source),
      tt AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS tt
             FROM d GROUP BY band),
      terms AS (SELECT cells.band, cells.lang, cells.source,
          (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
            / CAST(tt AS DOUBLE))
          * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
            / CAST(tt AS DOUBLE))
          / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(tt AS DOUBLE))
            AS term, tt
        FROM cells
        JOIN r USING (band, lang)
        JOIN c USING (band, source)
        JOIN tt USING (band))
      SELECT band, CAST(COUNT(*) AS BIGINT) AS n_cells,
        MIN(tt) AS n_docs,
        CAST(0 AS DOUBLE) + list_reduce(list(term ORDER BY lang, source),
          (a, b) -> a + b) AS chi2
      FROM terms GROUP BY band
      ORDER BY band"""),
    covers = Seq("STAT-stratified-chi2"))

  // ------------------------------------------------- early value share
  // How front-loaded is user value: of each user's lifetime event
  // value, the share earned within 7 days of their first event.
  // Reports the POOLED share (ratio of exact DECIMAL sums) and the
  // median per-user share (an order statistic over the per-user
  // rationals) — mean-of-ratios vs ratio-of-sums, both deliberately.
  private val q378 = QueryDef(
    "q378_early_value_share",
    (s, dir) => {
      val e = t(s, dir, "events").select(col("user_id"), col("ts"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      val first = e.groupBy("user_id").agg(min(col("ts")).as("t0"))
      val per = e.join(first, Seq("user_id"))
        .withColumn("early",
          col("ts") < col("t0") + expr("INTERVAL 7 DAYS"))
        .groupBy("user_id")
        .agg(sum(col("v")).as("total"),
          sum(when(col("early"), col("v"))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).as("early_v"))
        .filter(col("total") > 0)
        .withColumn("share",
          col("early_v").cast("double") / col("total").cast("double"))
      per.agg(count(lit(1)).as("n_users"),
        (sum(col("early_v")).cast("double") /
          sum(col("total")).cast("double")).as("pooled_share"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY share)")
          .as("median_user_share"))
    },
    Some("""WITH e AS (SELECT user_id, ts,
          CAST(value AS DECIMAL(18,2)) AS v FROM events),
      f AS (SELECT user_id, MIN(ts) AS t0 FROM e GROUP BY user_id),
      per AS (SELECT e.user_id, SUM(v) AS total,
          SUM(CASE WHEN ts < t0 + INTERVAL 7 DAY THEN v
              ELSE CAST(0 AS DECIMAL(18,2)) END) AS early_v
        FROM e JOIN f USING (user_id)
        GROUP BY e.user_id),
      sh AS (SELECT user_id, total, early_v,
          CAST(early_v AS DOUBLE) / CAST(total AS DOUBLE) AS share
        FROM per WHERE total > 0)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(early_v) AS DOUBLE) / CAST(SUM(total) AS DOUBLE)
          AS pooled_share,
        percentile_disc(0.5) WITHIN GROUP (ORDER BY share)
          AS median_user_share
      FROM sh"""),
    covers = Seq("A-early-value"))

  val all: Seq[QueryDef] =
    Seq(q374, q375, q376, q377, q378)
}
