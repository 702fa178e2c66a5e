package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-69 gate additions (q364–q368): mix stability, decay after
  * peaks, template detection, tail heaviness, and factorial effects.
  */
object Round69Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- daily mix stability
  // Day-over-day total-variation distance of the event-type mix: per
  // day the 5-type share vector, TV against the previous day as a
  // fixed-order fold over types (shares are rational doubles, the
  // fold order is pinned), then only order-independent summaries (max,
  // count above 0.1) — no unordered double summation anywhere.
  private val q364 = QueryDef(
    "q364_daily_mix_stability",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(to_date(col("ts")).as("d"), col("event_type"))
        .agg(count(lit(1)).as("x"))
      val tot = daily.groupBy("d").agg(sum(col("x")).as("td"))
      val shares = daily.join(tot, Seq("d"))
        .select(col("d"), col("event_type"),
          (col("x").cast("double") / col("td").cast("double")).as("sh"))
      val w = Window.partitionBy("event_type").orderBy("d")
      val withPrev = shares
        .withColumn("prev_sh", lag(col("sh"), 1).over(w))
        .withColumn("prev_d", lag(col("d"), 1).over(w))
        .filter(col("prev_sh").isNotNull &&
          col("prev_d") === date_sub(col("d"), 1))
        .withColumn("term", abs(col("sh") - col("prev_sh")))
      val tv = withPrev.groupBy("d")
        .agg((aggregate(
          sort_array(collect_list(struct(col("event_type"), col("term")))),
          lit(0.0d), (a, x) => a + x.getField("term")) / lit(2.0d)).as("tv"),
          count(lit(1)).as("n_types"))
        .filter(col("n_types") === 5)
      tv.agg(count(lit(1)).as("n_days"),
        max(col("tv")).as("max_tv"),
        sum(when(col("tv") > 0.1, 1L).otherwise(0L)).as("n_unstable"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS d, event_type,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY d, event_type),
      tot AS (SELECT d, CAST(SUM(x) AS BIGINT) AS td FROM daily GROUP BY d),
      sh AS (SELECT d, event_type,
          CAST(x AS DOUBLE) / CAST(td AS DOUBLE) AS sh
        FROM daily JOIN tot USING (d)),
      wp AS (SELECT d, event_type, sh,
          lag(sh) OVER (PARTITION BY event_type ORDER BY d) AS prev_sh,
          lag(d) OVER (PARTITION BY event_type ORDER BY d) AS prev_d
        FROM sh),
      terms AS (SELECT d, event_type, abs(sh - prev_sh) AS term
        FROM wp WHERE prev_sh IS NOT NULL AND prev_d = d - 1),
      tv AS (SELECT d,
          (CAST(0 AS DOUBLE) + list_reduce(list(term ORDER BY event_type),
            (a, b) -> a + b)) / CAST(2 AS DOUBLE) AS tv,
          CAST(COUNT(*) AS BIGINT) AS n_types
        FROM terms GROUP BY d)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        MAX(tv) AS max_tv,
        CAST(SUM(CASE WHEN tv > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_unstable
      FROM tv WHERE n_types = 5"""),
    covers = Seq("TS-mix-stability"))

  // ------------------------------------------------- post-peak decay
  // What happens the day after the spike: each type's tallest day
  // (ties → earliest) and the next-day retention x_next/x_peak — the
  // decay profile of traffic spikes. Peak pick and neighbor read are
  // two windows over the date order.
  private val q365 = QueryDef(
    "q365_post_peak_decay",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("d")
      val withNext = daily
        .withColumn("next_x", lead(col("x"), 1).over(w))
        .withColumn("next_d", lead(col("d"), 1).over(w))
      val pick = Window.partitionBy("event_type").orderBy(desc("x"), asc("d"))
      withNext.withColumn("rn", row_number().over(pick))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("d").as("peak_day"),
          col("x").as("peak_events"),
          when(col("next_d") === date_add(col("d"), 1), col("next_x"))
            .otherwise(lit(null)).as("next_day_events"),
          when(col("next_d") === date_add(col("d"), 1),
            col("next_x").cast("double") / col("x").cast("double"))
            .otherwise(lit(null)).as("retention"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, d),
      wn AS (SELECT event_type, d, x,
          lead(x) OVER (PARTITION BY event_type ORDER BY d) AS next_x,
          lead(d) OVER (PARTITION BY event_type ORDER BY d) AS next_d
        FROM daily),
      pick AS (SELECT *, row_number() OVER (PARTITION BY event_type
          ORDER BY x DESC, d) AS rn FROM wn)
      SELECT event_type, d AS peak_day, x AS peak_events,
        CASE WHEN next_d = d + 1 THEN next_x END AS next_day_events,
        CASE WHEN next_d = d + 1
          THEN CAST(next_x AS DOUBLE) / CAST(x AS DOUBLE) END AS retention
      FROM pick WHERE rn = 1
      ORDER BY event_type"""),
    covers = Seq("TS-peak-decay"))

  // ------------------------------------------------- template census
  // Boilerplate detection by opening phrase: documents grouped by
  // their first three words; the top-20 most reused openings with
  // doc counts, distinct sources, and distinct full texts — a reused
  // opening across many sources with few distinct texts IS a
  // template. One groupBy at prefix cardinality.
  private val q366 = QueryDef(
    "q366_template_census",
    (s, dir) => {
      val pre = t(s, dir, "documents")
        .withColumn("opening",
          concat_ws(" ", slice(split(col("text"), " "), 1, 3)))
      pre.groupBy("opening")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("text")).as("n_texts"))
        .orderBy(desc("n_docs"), asc("opening")).limit(20)
        .withColumn("reuse_ratio",
          col("n_docs").cast("double") / col("n_texts").cast("double"))
        .orderBy(desc("n_docs"), asc("opening"))
    },
    Some("""WITH pre AS (SELECT source, text,
          array_to_string(string_split(text, ' ')[1:3], ' ') AS opening
        FROM documents),
      g AS (SELECT opening, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
          CAST(COUNT(DISTINCT text) AS BIGINT) AS n_texts
        FROM pre GROUP BY opening
        ORDER BY n_docs DESC, opening LIMIT 20)
      SELECT opening, n_docs, n_sources, n_texts,
        CAST(n_docs AS DOUBLE) / CAST(n_texts AS DOUBLE) AS reuse_ratio
      FROM g ORDER BY n_docs DESC, opening"""),
    covers = Seq("TXT-template-census"))

  // ------------------------------------------------- tail heaviness
  // How heavy is the order-value tail, without a parametric fit (the
  // Hill estimator needs ln): P99/P50 and max/P99 of order totals in
  // exact cents per market segment. Ratios of exact order statistics
  // only.
  private val q367 = QueryDef(
    "q367_tail_heaviness",
    (s, dir) => {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)
      val o = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), cents.as("c"))
      o.groupBy("segment")
        .agg(count(lit(1)).as("n_orders"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("p50"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("p99"),
          max(col("c")).as("mx"))
        .select(col("segment"), col("n_orders"),
          (col("p99").cast("double") / col("p50").cast("double"))
            .as("p99_over_p50"),
          (col("mx").cast("double") / col("p99").cast("double"))
            .as("max_over_p99"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT c_mktsegment AS segment,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders JOIN customer ON o_custkey = c_custkey),
      g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
          CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY c) AS BIGINT)
            AS p50,
          CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c) AS BIGINT)
            AS p99,
          MAX(c) AS mx
        FROM o GROUP BY segment)
      SELECT segment, n_orders,
        CAST(p99 AS DOUBLE) / CAST(p50 AS DOUBLE) AS p99_over_p50,
        CAST(mx AS DOUBLE) / CAST(p99 AS DOUBLE) AS max_over_p99
      FROM g ORDER BY segment"""),
    covers = Seq("STAT-tail"))

  // ------------------------------------------------- factorial effects
  // Two-way decomposition of event value: cell mean(hour-band ×
  // weekpart) minus row mean minus column mean plus grand mean — the
  // interaction effect of a 2-factor ANOVA table, every mean a ratio
  // of exact DECIMAL/long sums computed from broadcast marginals with
  // one fixed IEEE tree per cell.
  private val q368 = QueryDef(
    "q368_hour_weekpart_effects",
    (s, dir) => {
      val e = t(s, dir, "events").select(
        (hour(col("ts")) >= 12).as("pm"),
        (dayofweek(col("ts")).isin(1, 7)).as("wkend"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      val cell = e.groupBy("pm", "wkend")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      val rowM = e.groupBy("pm")
        .agg(count(lit(1)).as("rn"), sum(col("v")).as("rsv"))
      val colM = e.groupBy("wkend")
        .agg(count(lit(1)).as("cn"), sum(col("v")).as("csv"))
      val g = e.agg(count(lit(1)).as("gn"), sum(col("v")).as("gsv"))
      cell.join(broadcast(rowM), Seq("pm"))
        .join(broadcast(colM), Seq("wkend"))
        .crossJoin(broadcast(g))
        .select(col("pm"), col("wkend"), col("n").as("n_events"),
          (col("sv").cast("double") / col("n").cast("double"))
            .as("cell_mean"),
          (col("sv").cast("double") / col("n").cast("double") -
            col("rsv").cast("double") / col("rn").cast("double") -
            col("csv").cast("double") / col("cn").cast("double") +
            col("gsv").cast("double") / col("gn").cast("double"))
            .as("interaction"))
        .orderBy("pm", "wkend")
    },
    Some("""WITH e AS (SELECT
          EXTRACT(hour FROM ts) >= 12 AS pm,
          dayofweek(ts) IN (0, 6) AS wkend,
          CAST(value AS DECIMAL(18,2)) AS v
        FROM events),
      cell AS (SELECT pm, wkend, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(v) AS sv FROM e GROUP BY pm, wkend),
      rm AS (SELECT pm, CAST(COUNT(*) AS BIGINT) AS rn, SUM(v) AS rsv
             FROM e GROUP BY pm),
      cm AS (SELECT wkend, CAST(COUNT(*) AS BIGINT) AS cn, SUM(v) AS csv
             FROM e GROUP BY wkend),
      g AS (SELECT CAST(COUNT(*) AS BIGINT) AS gn, SUM(v) AS gsv FROM e)
      SELECT pm, wkend, n AS n_events,
        CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS cell_mean,
        CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)
          - CAST(rsv AS DOUBLE) / CAST(rn AS DOUBLE)
          - CAST(csv AS DOUBLE) / CAST(cn AS DOUBLE)
          + CAST(gsv AS DOUBLE) / CAST(gn AS DOUBLE) AS interaction
      FROM cell JOIN rm USING (pm) JOIN cm USING (wkend), g
      ORDER BY pm, wkend"""),
    covers = Seq("STAT-factorial"))

  val all: Seq[QueryDef] =
    Seq(q364, q365, q366, q367, q368)
}
