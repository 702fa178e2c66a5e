package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-59 gate additions (q314–q318): event-log analytics — funnel
  * thresholds, relative banding, behavioral profiles, forecast
  * backtesting, and burst detection.
  *
  * Determinism: cumulative sums are exact DECIMAL/longs over total
  * orders (ts, event_id); doubles are single divisions over exact
  * integers; every query ends in a total ORDER BY.
  */
object Round59Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- time to threshold
  // Per user: how many events until lifetime value crosses 1000, and
  // when. Running DECIMAL(18,2) sum over the (ts, event_id) total
  // order, first crossing picked by row_number — the funnel question
  // ("how long to activation") asked exactly. One partitioned window,
  // no iteration.
  private val q314 = QueryDef(
    "q314_time_to_threshold",
    (s, dir) => {
      val e = t(s, dir, "events").select(col("user_id"), col("event_id"),
        col("ts"), col("value").cast(DecimalType(18, 2)).as("v"))
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cum = e.withColumn("cum", sum(col("v")).over(w))
        .withColumn("idx", row_number().over(w).cast("long"))
      val crossed = cum.filter(col("cum") >= 1000)
      val w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
      crossed.withColumn("rn", row_number().over(w2))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("idx").as("n_events_to_cross"),
          col("ts").as("cross_ts"),
          col("cum").cast("double").as("value_at_cross"))
        .orderBy("user_id")
    },
    Some("""WITH c AS (SELECT user_id, event_id, ts,
          SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cum,
          CAST(row_number()
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS idx
        FROM events),
      x AS (SELECT user_id, idx, ts, cum,
          row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM c WHERE cum >= 1000)
      SELECT user_id, idx AS n_events_to_cross, ts AS cross_ts,
        CAST(cum AS DOUBLE) AS value_at_cross
      FROM x WHERE rn = 1
      ORDER BY user_id"""),
    covers = Seq("W-threshold-crossing"))

  // ------------------------------------------------- relative bands
  // Length bands RELATIVE to each language's own distribution: per
  // lang P25/P75 (percentile_disc, exact order statistics), every doc
  // classified short/mid/long against its language's quartiles. The
  // quartile table is |langs| rows — broadcast back onto the scan, so
  // the classification costs one small-side join at any corpus size.
  private val q315 = QueryDef(
    "q315_relative_length_bands",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val qs = d.groupBy("lang").agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars)").as("p25"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars)").as("p75"))
      d.join(broadcast(qs), Seq("lang"))
        .withColumn("band",
          when(col("n_chars") < col("p25"), "short")
            .when(col("n_chars") > col("p75"), "long")
            .otherwise("mid"))
        .groupBy("lang", "band")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          sum(col("n_chars")).as("schars"))
        .select(col("lang"), col("band"), col("n_docs"),
          col("min_chars"), col("max_chars"),
          (col("schars").cast("double") / col("n_docs").cast("double"))
            .as("mean_chars"))
        .orderBy("lang", "band")
    },
    Some("""WITH qs AS (SELECT lang,
          percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS p25,
          percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars) AS p75
        FROM documents GROUP BY lang),
      b AS (SELECT d.lang,
          CASE WHEN n_chars < p25 THEN 'short'
               WHEN n_chars > p75 THEN 'long'
               ELSE 'mid' END AS band, n_chars
        FROM documents d JOIN qs USING (lang))
      SELECT lang, band, CAST(COUNT(*) AS BIGINT) AS n_docs,
        MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars
      FROM b GROUP BY lang, band
      ORDER BY lang, band"""),
    covers = Seq("A-relative-bands"))

  // ------------------------------------------------- dominant behavior
  // Two-level aggregation: each user's dominant event type (argmax
  // with (count desc, type asc) tie-break), then the population
  // profiled by dominant type — how many users, and how dominant the
  // dominant type actually is (ratio of exact sums, NOT a mean of
  // per-user ratios: a sum of rational doubles would be partial-
  // aggregation-order dependent).
  private val q316 = QueryDef(
    "q316_dominant_type_profile",
    (s, dir) => {
      val uc = t(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("user_id")
        .orderBy(desc("cnt"), asc("event_type"))
      val tot = uc.groupBy("user_id").agg(sum(col("cnt")).as("total"))
      uc.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .join(tot, Seq("user_id"))
        .groupBy(col("event_type").as("dominant_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("cnt")).as("events_covered"),
          sum(col("total")).as("total_events"))
        .withColumn("dominance",
          col("events_covered").cast("double") / col("total_events").cast("double"))
        .orderBy("dominant_type")
    },
    Some("""WITH uc AS (SELECT user_id, event_type,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id, event_type),
      tot AS (SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS total
              FROM uc GROUP BY user_id),
      dom AS (SELECT user_id, event_type, cnt,
          row_number() OVER (PARTITION BY user_id
            ORDER BY cnt DESC, event_type) AS rn
        FROM uc)
      SELECT event_type AS dominant_type,
        CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(cnt) AS BIGINT) AS events_covered,
        CAST(SUM(total) AS BIGINT) AS total_events,
        CAST(SUM(cnt) AS DOUBLE) / CAST(SUM(total) AS DOUBLE) AS dominance
      FROM dom JOIN tot USING (user_id)
      WHERE rn = 1
      GROUP BY event_type
      ORDER BY dominant_type"""),
    covers = Seq("A-dominant-profile"))

  // ------------------------------------------------- forecast backtest
  // Seasonal-naive baseline backtest: predict each day's event count
  // with the same weekday last week, score MAE and bias per type.
  // Exact integer error sums (|actual−predicted| over the self-join
  // on d−7), one division each at the end — the forecasting
  // scorecard every volume-planning pipeline keeps.
  private val q317 = QueryDef(
    "q317_seasonal_naive_backtest",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("x"))
      val a = daily.as("a")
      val p = daily.select(col("event_type"), col("d"), col("x").as("px")).as("p")
      a.join(p, col("a.event_type") === col("p.event_type") &&
          col("p.d") === date_sub(col("a.d"), 7))
        .select(col("a.event_type").as("event_type"),
          (col("a.x") - col("px")).as("diff"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("diff"))).as("sad"), sum(col("diff")).as("sd"))
        .select(col("event_type"), col("n_days"),
          (col("sad").cast("double") / col("n_days").cast("double")).as("mae"),
          (col("sd").cast("double") / col("n_days").cast("double")).as("bias"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, d),
      j AS (SELECT a.event_type, a.x - p.x AS diff
        FROM daily a JOIN daily p
          ON a.event_type = p.event_type AND p.d = a.d - 7)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(SUM(abs(diff)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mae,
        CAST(SUM(diff) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS bias
      FROM j GROUP BY event_type
      ORDER BY event_type"""),
    covers = Seq("TS-backtest"))

  // ------------------------------------------------- burst detection
  // Abuse/bot screening: each user's busiest 10 minutes — count over
  // a RANGE frame of 599 epoch-seconds preceding each event, maxed
  // per user, top-20 burstiest. The value-based frame (not ROWS)
  // makes ties and gaps exact on both engines.
  private val q318 = QueryDef(
    "q318_burst_top_users",
    (s, dir) => {
      val e = t(s, dir, "events").select(col("user_id"),
        expr("unix_micros(ts) DIV 1000000").as("sec"))
      val w = Window.partitionBy("user_id").orderBy("sec")
        .rangeBetween(-599, Window.currentRow)
      e.withColumn("burst", count(lit(1)).over(w))
        .groupBy("user_id")
        .agg(max(col("burst")).as("max_burst"), count(lit(1)).as("n_events"))
        .orderBy(desc("max_burst"), asc("user_id")).limit(20)
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec
          FROM events),
      b AS (SELECT user_id, CAST(COUNT(*) OVER (PARTITION BY user_id
            ORDER BY sec RANGE BETWEEN 599 PRECEDING AND CURRENT ROW)
          AS BIGINT) AS burst
        FROM e)
      SELECT user_id, MAX(burst) AS max_burst,
        CAST(COUNT(*) AS BIGINT) AS n_events
      FROM b GROUP BY user_id
      ORDER BY max_burst DESC, user_id LIMIT 20"""),
    covers = Seq("W-burst"))

  val all: Seq[QueryDef] =
    Seq(q314, q315, q316, q317, q318)
}
