package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType}

import graft.Tables

/** Round-88 gate additions (q457–q461): symbolic time-series mining —
  * SAX symbolization, motif counting, 1-D discord detection, seasonal
  * profile bands, and the turning-points randomness test. The SAX
  * alphabet uses weekly SUMS (scaling by 1/7 is monotone, so the
  * symbols are identical and everything stays an exact integer
  * compare against percentile_disc breakpoints).
  */
object Round88Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Complete-week order totals (wk, s_w) from the daily series. */
  private def weekly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(floor(datediff(to_date(col("o_orderdate")),
        lit("1995-01-01").cast(DateType)) / lit(7.0))
        .cast(LongType).as("wk"),
        to_date(col("o_orderdate")).as("day"))
      .groupBy("wk")
      .agg(count(lit(1)).as("s_w"), countDistinct("day").as("nd"))

  private val weeklySql: String =
    """wx AS (SELECT CAST(floor(date_diff('day', DATE '1995-01-01',
          CAST(o_orderdate AS DATE)) / 7.0) AS BIGINT) AS wk,
        CAST(o_orderdate AS DATE) AS day
      FROM orders),
      weekly AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS s_w,
          CAST(COUNT(DISTINCT day) AS BIGINT) AS nd
        FROM wx GROUP BY wk)"""

  // ------------------------------------------------- SAX symbols
  // SAX symbolization of the weekly order-arrival series: quartile
  // breakpoints (exact percentile_disc picks over the weekly sums)
  // map each week to one of four symbols. The dimensionality
  // reduction that turns a numeric series into a string queryable
  // with plain grouping — downstream of this, pattern mining is
  // count algebra.
  private val q457 = QueryDef(
    "q457_sax_symbolization",
    (s, dir) => {
      val wkly = weekly(s, dir).filter(col("nd") === 7)
      val cuts = wkly.agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY s_w)")
          .cast(LongType).as("b1"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY s_w)")
          .cast(LongType).as("b2"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY s_w)")
          .cast(LongType).as("b3"))
      wkly.crossJoin(broadcast(cuts))
        .select(col("wk"), col("s_w"),
          when(col("s_w") <= col("b1"), "a")
            .when(col("s_w") <= col("b2"), "b")
            .when(col("s_w") <= col("b3"), "c")
            .otherwise("d").as("symbol"))
        .orderBy("wk")
    },
    Some(s"""WITH $weeklySql,
      cw AS (SELECT wk, s_w FROM weekly WHERE nd = 7),
      cuts AS (SELECT
          CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY s_w)
            AS BIGINT) AS b1,
          CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY s_w)
            AS BIGINT) AS b2,
          CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY s_w)
            AS BIGINT) AS b3
        FROM cw)
      SELECT wk, s_w,
        CASE WHEN s_w <= b1 THEN 'a' WHEN s_w <= b2 THEN 'b'
          WHEN s_w <= b3 THEN 'c' ELSE 'd' END AS symbol
      FROM cw CROSS JOIN cuts ORDER BY wk"""),
    covers = Seq("TS-sax"))

  // ------------------------------------------------- SAX motifs
  // Motif mining over the symbolized series: sliding trigrams of
  // consecutive week-symbols, counted exactly — the most frequent
  // words of the series' language ("bbb" = quiet plateau, "add" =
  // spike onset). Top-10 by (count, trigram); first occurrence
  // rides along for drill-down.
  private val q458 = QueryDef(
    "q458_sax_motifs",
    (s, dir) => {
      val sax = graft.SparkEntry
        .queries("q457_sax_symbolization")(s, dir)
      val w = Window.orderBy("wk")
      val tri = sax
        .withColumn("nxt", lead(col("symbol"), 1).over(w))
        .withColumn("nxt2", lead(col("symbol"), 2).over(w))
        .withColumn("wk_next", lead(col("wk"), 1).over(w))
        .withColumn("wk_next2", lead(col("wk"), 2).over(w))
        .filter(col("nxt2").isNotNull &&
          col("wk_next") === col("wk") + 1 &&
          col("wk_next2") === col("wk") + 2)
        .select(col("wk"),
          concat(col("symbol"), col("nxt"), col("nxt2")).as("trigram"))
      tri.groupBy("trigram")
        .agg(count(lit(1)).as("n_occ"), min("wk").as("first_wk"))
        .orderBy(col("n_occ").desc, col("trigram"))
        .limit(10)
    },
    Some(s"""WITH $weeklySql,
      cw AS (SELECT wk, s_w FROM weekly WHERE nd = 7),
      cuts AS (SELECT
          CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY s_w)
            AS BIGINT) AS b1,
          CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY s_w)
            AS BIGINT) AS b2,
          CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY s_w)
            AS BIGINT) AS b3
        FROM cw),
      sax AS (SELECT wk,
          CASE WHEN s_w <= b1 THEN 'a' WHEN s_w <= b2 THEN 'b'
            WHEN s_w <= b3 THEN 'c' ELSE 'd' END AS symbol
        FROM cw CROSS JOIN cuts),
      tri AS (SELECT wk,
          symbol || lead(symbol, 1) OVER (ORDER BY wk)
            || lead(symbol, 2) OVER (ORDER BY wk) AS trigram,
          lead(wk, 1) OVER (ORDER BY wk) AS wk_next,
          lead(wk, 2) OVER (ORDER BY wk) AS wk_next2
        FROM sax)
      SELECT trigram, CAST(COUNT(*) AS BIGINT) AS n_occ,
        CAST(MIN(wk) AS BIGINT) AS first_wk
      FROM tri
      WHERE trigram IS NOT NULL AND wk_next = wk + 1
        AND wk_next2 = wk + 2
      GROUP BY trigram ORDER BY n_occ DESC, trigram LIMIT 10"""),
    covers = Seq("TS-motif"))

  // ------------------------------------------------- 1-D discord
  // Discord detection: the weeks most unlike every other week — 1-D
  // nearest-neighbor distance on weekly totals, computed exactly
  // from the two value-order neighbors after a sort (the 1-D
  // specialization of matrix-profile discords: O(n log n), not
  // O(n²)). Top-5 by (gap, wk).
  private val q459 = QueryDef(
    "q459_series_discord",
    (s, dir) => {
      val wkly = weekly(s, dir).filter(col("nd") === 7).select("wk", "s_w")
      val w = Window.orderBy(col("s_w"), col("wk"))
      val nn = wkly
        .withColumn("prev", lag(col("s_w"), 1).over(w))
        .withColumn("nxt", lead(col("s_w"), 1).over(w))
        .withColumn("nn_gap",
          least(coalesce(abs(col("s_w") - col("prev")), lit(Long.MaxValue)),
            coalesce(abs(col("s_w") - col("nxt")), lit(Long.MaxValue))))
      val wr = Window.orderBy(col("nn_gap").desc, col("wk"))
      nn.withColumn("rnk", row_number().over(wr).cast(LongType))
        .filter(col("rnk") <= 5)
        .select(col("rnk"), col("wk"), col("s_w"), col("nn_gap"))
        .orderBy("rnk")
    },
    Some(s"""WITH $weeklySql,
      cw AS (SELECT wk, s_w FROM weekly WHERE nd = 7),
      nn AS (SELECT wk, s_w,
          LEAST(
            COALESCE(ABS(s_w - lag(s_w, 1) OVER (ORDER BY s_w, wk)),
              9223372036854775807),
            COALESCE(ABS(s_w - lead(s_w, 1) OVER (ORDER BY s_w, wk)),
              9223372036854775807)) AS nn_gap
        FROM cw),
      r AS (SELECT wk, s_w, nn_gap,
          CAST(row_number() OVER (ORDER BY nn_gap DESC, wk) AS BIGINT)
            AS rnk
        FROM nn)
      SELECT rnk, wk, s_w, nn_gap FROM r WHERE rnk <= 5
      ORDER BY rnk"""),
    covers = Seq("TS-discord"))

  // ------------------------------------------------- dow bands
  // Seasonal reference bands: per day-of-week, the quartile profile
  // of daily order counts plus a 3×IQR outlier census — all integer
  // arithmetic (the band edges are exact, so membership never
  // depends on a float). Spark's dayofweek is 1=Sunday; minus 1
  // aligns it with DuckDB's 0=Sunday.
  private val q460 = QueryDef(
    "q460_dow_profile_bands",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .select((dayofweek(col("day")) - 1).cast(LongType).as("dow"),
          col("cnt"))
      val prof = daily.groupBy("dow")
        .agg(count(lit(1)).as("n_days"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY cnt)")
            .cast(LongType).as("q1"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt)")
            .cast(LongType).as("med"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY cnt)")
            .cast(LongType).as("q3"))
      daily.join(broadcast(prof), Seq("dow"))
        .groupBy("dow", "n_days", "q1", "med", "q3")
        .agg(sum(when(col("cnt") > col("q3") +
            lit(3L) * (col("q3") - col("q1")), 1L).otherwise(0L))
            .as("n_hi_outliers"),
          sum(when(col("cnt") < col("q1") -
            lit(3L) * (col("q3") - col("q1")), 1L).otherwise(0L))
            .as("n_lo_outliers"))
        .orderBy("dow")
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1),
      dd AS (SELECT CAST(dayofweek(day) AS BIGINT) AS dow, cnt
        FROM daily),
      prof AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
          CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY cnt)
            AS BIGINT) AS q1,
          CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt)
            AS BIGINT) AS med,
          CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY cnt)
            AS BIGINT) AS q3
        FROM dd GROUP BY dow)
      SELECT d.dow, p.n_days, p.q1, p.med, p.q3,
        CAST(COUNT(*) FILTER (WHERE d.cnt > p.q3 + 3 * (p.q3 - p.q1))
          AS BIGINT) AS n_hi_outliers,
        CAST(COUNT(*) FILTER (WHERE d.cnt < p.q1 - 3 * (p.q3 - p.q1))
          AS BIGINT) AS n_lo_outliers
      FROM dd d JOIN prof p ON p.dow = d.dow
      GROUP BY d.dow, p.n_days, p.q1, p.med, p.q3
      ORDER BY d.dow"""),
    covers = Seq("TS-dow-bands"))

  // ------------------------------------------------- turning points
  // Turning-points test per segment: count strict local extrema of
  // the daily series; an exchangeable series expects 2(n−2)/3 of
  // them, so the standardized excess z = (3T − 2(n−2)) /
  // (3·sqrt((16n−29)/90)) flags over-smoothing (too few turns,
  // momentum) or over-dithering (too many, oscillation). Exact
  // integer T and n; one sqrt, one division.
  private val q461 = QueryDef(
    "q461_turning_points",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val daily = t(s, dir, "orders").join(seg, Seq("o_custkey"))
        .groupBy(col("segment"), to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("segment").orderBy("day")
      daily
        .withColumn("prev", lag(col("cnt"), 1).over(w))
        .withColumn("nxt", lead(col("cnt"), 1).over(w))
        .filter(col("prev").isNotNull && col("nxt").isNotNull)
        .groupBy("segment")
        .agg((count(lit(1)) + 2L).as("n_days"),
          sum(when((col("cnt") - col("prev")) *
            (col("nxt") - col("cnt")) < 0, 1L).otherwise(0L)).as("t_turns"))
        .select(col("segment"), col("n_days"), col("t_turns"),
          ((lit(3L) * col("t_turns") -
            lit(2L) * (col("n_days") - 2L)).cast("double") /
            (lit(3.0) * sqrt((lit(16L) * col("n_days") - 29L)
              .cast("double") / lit(90.0)))).as("z"))
        .orderBy("segment")
    },
    Some("""WITH daily AS (SELECT c.c_mktsegment AS segment,
          CAST(o.o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      x AS (SELECT segment, cnt,
          lag(cnt, 1) OVER (PARTITION BY segment ORDER BY day) AS prev,
          lead(cnt, 1) OVER (PARTITION BY segment ORDER BY day) AS nxt
        FROM daily),
      agg AS (SELECT segment,
          CAST(COUNT(*) + 2 AS BIGINT) AS n_days,
          CAST(COUNT(*) FILTER (WHERE (cnt - prev) * (nxt - cnt) < 0)
            AS BIGINT) AS t_turns
        FROM x WHERE prev IS NOT NULL AND nxt IS NOT NULL
        GROUP BY segment)
      SELECT segment, n_days, t_turns,
        CAST(3 * t_turns - 2 * (n_days - 2) AS DOUBLE) /
          (3.0 * sqrt(CAST(16 * n_days - 29 AS DOUBLE) / 90.0)) AS z
      FROM agg ORDER BY segment"""),
    covers = Seq("TS-turning-points"))

  val all: Seq[QueryDef] = Seq(q457, q458, q459, q460, q461)
}
