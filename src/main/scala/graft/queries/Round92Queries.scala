package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}

import graft.Tables

/** Round-92 gate additions (q477–q481): forecasting workbench —
  * classical seasonal decomposition (every component an exact
  * rational over the 29-day window), simple exponential smoothing
  * (driver fold ≡ DuckDB recursive CTE, the first RECURSIVE oracle),
  * an exact-arithmetic forecast battery (naive/seasonal-naive/drift),
  * demand-intermittency classification (Syntetos-Boylan quadrants by
  * cross-multiplied compares), and seasonal-strength via ordered
  * residual folds.
  */
object Round92Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Daily global order counts (day, di, dow, x). */
  private def daily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"))
      .select(col("day"),
        datediff(col("day"), lit("1995-01-01").cast(DateType))
          .cast(LongType).as("di"),
        (dayofweek(col("day")) - 1).cast(LongType).as("dow"), col("x"))

  private val dailySql: String =
    """daily AS (SELECT day, CAST(date_diff('day', DATE '1995-01-01',
          day) AS BIGINT) AS di,
        CAST(dayofweek(day) AS BIGINT) AS dow, x
      FROM (SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY 1))"""

  /** Complete-week totals (wk, s_w), consecutive from week 0. */
  private def weekly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(floor(datediff(to_date(col("o_orderdate")),
        lit("1995-01-01").cast(DateType)) / lit(7.0))
        .cast(LongType).as("wk"),
        to_date(col("o_orderdate")).as("day"))
      .groupBy("wk")
      .agg(count(lit(1)).as("s_w"), countDistinct("day").as("nd"))
      .filter(col("nd") === 7)
      .select("wk", "s_w")

  private val weeklySql: String =
    """weekly AS (SELECT wk, s_w FROM (
        SELECT CAST(floor(date_diff('day', DATE '1995-01-01',
            CAST(o_orderdate AS DATE)) / 7.0) AS BIGINT) AS wk,
          CAST(COUNT(*) AS BIGINT) AS s_w,
          CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT)
            AS nd
        FROM orders GROUP BY 1) WHERE nd = 7)"""

  // ------------------------------------------------- decomposition
  // Classical additive seasonal decomposition, all-exact: trend =
  // centered 29-day moving sum over 29 (a rational), detrended
  // numerator 29·x − trend_num (an integer), day-of-week seasonal
  // effect Σdetr_num/(29·n_dow) — one division per dow at the very
  // end. The x = trend + seasonal + residual ledger without a single
  // float accumulation.
  private val q477 = QueryDef(
    "q477_seasonal_decompose",
    (s, dir) => {
      val d = daily(s, dir)
      val w = Window.orderBy("di").rowsBetween(-14, 14)
      val detr = d
        .withColumn("tnum", sum("x").over(w))
        .withColumn("nw", count(lit(1)).over(w))
        .filter(col("nw") === 29)
        .withColumn("dnum", lit(29L) * col("x") - col("tnum"))
      detr.groupBy("dow")
        .agg(count(lit(1)).as("n_days"), sum("dnum").as("snum"))
        .select(col("dow"), col("n_days"),
          (col("snum").cast("double") /
            (lit(29L) * col("n_days")).cast("double"))
            .as("seasonal_effect"))
        .orderBy("dow")
    },
    Some(s"""WITH $dailySql,
      detr AS (SELECT dow,
          29 * x - CAST(SUM(x) OVER (ORDER BY di
            ROWS BETWEEN 14 PRECEDING AND 14 FOLLOWING) AS BIGINT)
            AS dnum,
          COUNT(*) OVER (ORDER BY di
            ROWS BETWEEN 14 PRECEDING AND 14 FOLLOWING) AS nw
        FROM daily)
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(SUM(dnum) AS DOUBLE) /
          CAST(29 * COUNT(*) AS DOUBLE) AS seasonal_effect
      FROM detr WHERE nw = 29 GROUP BY dow ORDER BY dow"""),
    covers = Seq("TS-seasonal-decompose"))

  // ------------------------------------------------- SES
  // Simple exponential smoothing over the weekly series, α = 0.2:
  // the level recurrence folds left over weeks on the Spark driver
  // and runs as a RECURSIVE CTE in DuckDB — the same sequential
  // float chain, so the final level and the holdout MAE (|errors|
  // folded in week order) are bit-identical. One-step-ahead errors
  // score the last 52 weeks.
  private val q478 = QueryDef(
    "q478_ses_forecast",
    (s, dir) => {
      // complete weeks re-indexed densely (the calendar has gap
      // weeks), so the sequential chain never breaks — mirrored by
      // the oracle's row_number re-index
      // bounded-collect: weekly series — O(calendar weeks), not corpus
      val wk = weekly(s, dir).orderBy("wk")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val alpha = 0.2
      var level = wk.head._2.toDouble
      val n = wk.length
      val errs = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (i <- 1 until n) {
        val x = wk(i)._2.toDouble
        if (i >= n - 52) errs += math.abs(x - level)
        level = alpha * x + (1.0 - alpha) * level
      }
      // a 0/1-week series has no one-step errors; the oracle's
      // list_reduce over an empty list is NULL — mirror it instead of
      // throwing (only reachable below the gate SF, e.g. sf0.001)
      val mae: Option[Double] =
        if (errs.isEmpty) None else Some(errs.reduceLeft(_ + _) / 52.0)
      import s.implicits._
      Seq((n.toLong, level, mae))
        .toDF("n_weeks", "final_level", "mae_52")
    },
    Some(s"""WITH RECURSIVE $weeklySql,
      wt AS (SELECT s_w, CAST(row_number() OVER (ORDER BY wk)
          AS BIGINT) AS t FROM weekly),
      bounds AS (SELECT MAX(t) AS tmax FROM wt),
      ses AS (
        SELECT w.t, CAST(w.s_w AS DOUBLE) AS level
        FROM wt w WHERE w.t = 1
        UNION ALL
        SELECT w.t,
          CAST(0.2 AS DOUBLE) * CAST(w.s_w AS DOUBLE) +
            CAST(0.8 AS DOUBLE) * s.level
        FROM wt w JOIN ses s ON w.t = s.t + 1),
      errs AS (SELECT w.t, ABS(CAST(w.s_w AS DOUBLE) - s.level) AS e
        FROM wt w JOIN ses s ON s.t = w.t - 1, bounds b
        WHERE w.t > b.tmax - 52)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM wt) AS n_weeks,
        (SELECT level FROM ses, bounds b WHERE t = b.tmax)
          AS final_level,
        (SELECT list_reduce(list(e ORDER BY t), (a, b) -> a + b) / 52.0
          FROM errs) AS mae_52"""),
    covers = Seq("TS-ses"))

  // ------------------------------------------------- forecast battery
  // The honest baselines every forecast must beat, scored on the
  // last 52 complete weeks with EXACT arithmetic: naive (last train
  // value), seasonal-naive (52 weeks prior), drift (linear through
  // first/last train points — errors scaled by T−1 stay integral).
  // Each MAE is one terminal division.
  private val q479 = QueryDef(
    "q479_forecast_battery",
    (s, dir) => {
      val wkAll = weekly(s, dir).localCheckpoint()
      val maxWk = wkAll.agg(max("wk").as("wmax"))
      val wk = wkAll.crossJoin(broadcast(maxWk))
      val train = wk.filter(col("wk") <= col("wmax") - 52)
      val t0 = train.agg(min("wk").as("w1"), max("wk").as("wt"))
      val anchors = train.crossJoin(broadcast(t0))
        .agg(max(when(col("wk") === col("w1"), col("s_w"))).as("y1"),
          max(when(col("wk") === col("wt"), col("s_w"))).as("yt"),
          max("w1").as("w1"), max("wt").as("wt"))
      val test = wk.filter(col("wk") > col("wmax") - 52)
        .select(col("wk"), col("s_w"))
      val lagged = test.join(
        wkAll.select((col("wk") + 52L).as("wk"), col("s_w").as("y_prev")),
        Seq("wk"))
      val sn = lagged.agg(count(lit(1)).as("n"),
        sum(abs(col("s_w") - col("y_prev"))).as("sae"))
        .select(lit("2_seasonal_naive").as("method"),
          (col("sae").cast("double") / col("n").cast("double")).as("mae"))
      val nv = test.crossJoin(broadcast(anchors))
        .agg(count(lit(1)).as("n"),
          sum(abs(col("s_w") - col("yt"))).as("sae"))
        .select(lit("1_naive").as("method"),
          (col("sae").cast("double") / col("n").cast("double")).as("mae"))
      val dr = test.crossJoin(broadcast(anchors))
        .withColumn("span", col("wt") - col("w1"))
        .withColumn("enum",
          abs(col("span") * (col("s_w") - col("yt")) -
            (col("wk") - col("wt")) * (col("yt") - col("y1"))))
        .agg(count(lit(1)).as("n"), sum("enum").as("se"),
          max("span").as("span"))
        .select(lit("3_drift").as("method"),
          (col("se").cast("double") /
            (col("n") * col("span")).cast("double")).as("mae"))
      nv.unionAll(sn).unionAll(dr).orderBy("method")
    },
    Some(s"""WITH $weeklySql,
      bounds AS (SELECT MAX(wk) AS wmax FROM weekly),
      train AS (SELECT w.wk, w.s_w FROM weekly w, bounds b
        WHERE w.wk <= b.wmax - 52),
      t0 AS (SELECT MIN(wk) AS w1, MAX(wk) AS wt FROM train),
      anchors AS (SELECT
          MAX(CASE WHEN tr.wk = t0.w1 THEN tr.s_w END) AS y1,
          MAX(CASE WHEN tr.wk = t0.wt THEN tr.s_w END) AS yt,
          MAX(t0.w1) AS w1, MAX(t0.wt) AS wt
        FROM train tr CROSS JOIN t0),
      test AS (SELECT w.wk, w.s_w FROM weekly w, bounds b
        WHERE w.wk > b.wmax - 52),
      sn AS (SELECT '2_seasonal_naive' AS method,
          CAST(SUM(ABS(t.s_w - p.s_w)) AS DOUBLE) /
            CAST(COUNT(*) AS DOUBLE) AS mae
        FROM test t JOIN weekly p ON p.wk = t.wk - 52),
      nv AS (SELECT '1_naive' AS method,
          CAST(SUM(ABS(t.s_w - a.yt)) AS DOUBLE) /
            CAST(COUNT(*) AS DOUBLE) AS mae
        FROM test t CROSS JOIN anchors a),
      dr AS (SELECT '3_drift' AS method,
          CAST(SUM(ABS((a.wt - a.w1) * (t.s_w - a.yt) -
            (t.wk - a.wt) * (a.yt - a.y1))) AS DOUBLE) /
            CAST(COUNT(*) * MAX(a.wt - a.w1) AS DOUBLE) AS mae
        FROM test t CROSS JOIN anchors a)
      SELECT method, mae FROM nv UNION ALL
      SELECT method, mae FROM sn UNION ALL
      SELECT method, mae FROM dr ORDER BY method"""),
    covers = Seq("TS-forecast-battery"))

  // ------------------------------------------------- intermittency
  // Syntetos-Boylan demand classification per part: ADI (weeks per
  // demand week) vs 1.32 and CV² of nonzero weekly quantities vs
  // 0.49, both decided by cross-multiplied INTEGER comparisons
  // (100·T vs 132·n; 100·(nΣq²−S²) vs 49·S²). The
  // smooth/intermittent/erratic/lumpy quadrant census that picks
  // the forecasting method per SKU.
  private val q480 = QueryDef(
    "q480_intermittency_census",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"),
          floor(datediff(to_date(col("l_shipdate")),
            lit("1995-01-01").cast(DateType)) / lit(7.0))
            .cast(LongType).as("wk"),
          col("l_quantity").cast(DecimalType(18, 2)).cast(LongType)
            .as("qty"))
      val span = li.agg((max("wk") - min("wk") + 1L).as("t_weeks"))
      val perWeek = li.groupBy("l_partkey", "wk")
        .agg(sum("qty").as("q"))
      val stats = perWeek.groupBy("l_partkey")
        .agg(count(lit(1)).as("n"), sum("q").as("sq"),
          sum(col("q") * col("q")).as("sq2"))
        .crossJoin(broadcast(span))
      val classed = stats.withColumn("high_adi",
          lit(100L) * col("t_weeks") > lit(132L) * col("n"))
        .withColumn("high_cv",
          lit(100L) * (col("n") * col("sq2") - col("sq") * col("sq")) >
            lit(49L) * (col("sq") * col("sq")))
        .withColumn("class",
          when(!col("high_adi") && !col("high_cv"), "1_smooth")
            .when(col("high_adi") && !col("high_cv"), "2_intermittent")
            .when(!col("high_adi") && col("high_cv"), "3_erratic")
            .otherwise("4_lumpy"))
      val tot = classed.agg(count(lit(1)).as("np"))
      classed.groupBy("class").agg(count(lit(1)).as("n_parts"))
        .crossJoin(broadcast(tot))
        .select(col("class"), col("n_parts"),
          (col("n_parts").cast("double") / col("np").cast("double"))
            .as("share"))
        .orderBy("class")
    },
    Some("""WITH li AS (SELECT l_partkey,
          CAST(floor(date_diff('day', DATE '1995-01-01',
            CAST(l_shipdate AS DATE)) / 7.0) AS BIGINT) AS wk,
          CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS qty
        FROM lineitem),
      span AS (SELECT MAX(wk) - MIN(wk) + 1 AS t_weeks FROM li),
      per_week AS (SELECT l_partkey, wk, CAST(SUM(qty) AS BIGINT) AS q
        FROM li GROUP BY 1, 2),
      stats AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(q) AS BIGINT) AS sq,
          CAST(SUM(q * q) AS BIGINT) AS sq2
        FROM per_week GROUP BY 1),
      classed AS (SELECT l_partkey,
          CASE WHEN NOT (100 * sp.t_weeks > 132 * st.n)
              AND NOT (100 * (st.n * st.sq2 - st.sq * st.sq) >
                49 * (st.sq * st.sq)) THEN '1_smooth'
            WHEN (100 * sp.t_weeks > 132 * st.n)
              AND NOT (100 * (st.n * st.sq2 - st.sq * st.sq) >
                49 * (st.sq * st.sq)) THEN '2_intermittent'
            WHEN NOT (100 * sp.t_weeks > 132 * st.n)
              AND (100 * (st.n * st.sq2 - st.sq * st.sq) >
                49 * (st.sq * st.sq)) THEN '3_erratic'
            ELSE '4_lumpy' END AS class
        FROM stats st CROSS JOIN span sp)
      SELECT class, CAST(COUNT(*) AS BIGINT) AS n_parts,
        CAST(COUNT(*) AS DOUBLE) /
          CAST((SELECT COUNT(*) FROM classed) AS DOUBLE) AS share
      FROM classed GROUP BY class ORDER BY class"""),
    covers = Seq("TS-intermittency"))

  // ------------------------------------------------- seasonal strength
  // Hyndman's seasonal-strength F_s = max(0, 1 − Var(resid)/
  // Var(detrended)): residuals subtract the q477 dow effect from
  // each detrended day. Per-day values are identical double trees;
  // both variances fold over days in di order (aggregate HOF ≡
  // list_reduce), so even the two-pass variance is bit-stable.
  private val q481 = QueryDef(
    "q481_seasonal_strength",
    (s, dir) => {
      val d = daily(s, dir)
      val w = Window.orderBy("di").rowsBetween(-14, 14)
      val detr = d
        .withColumn("tnum", sum("x").over(w))
        .withColumn("nw", count(lit(1)).over(w))
        .filter(col("nw") === 29)
        .withColumn("detr",
          (lit(29L) * col("x") - col("tnum")).cast("double") / lit(29.0))
        .localCheckpoint()
      val seas = detr
        .withColumn("dnum", lit(29L) * col("x") - col("tnum"))
        .groupBy("dow")
        .agg(count(lit(1)).as("n_days"), sum("dnum").as("snum"))
        .select(col("dow"),
          (col("snum").cast("double") /
            (lit(29L) * col("n_days")).cast("double")).as("se"))
      val rows = detr.join(broadcast(seas), Seq("dow"))
        .select(col("di"), col("detr"),
          (col("detr") - col("se")).as("resid"))
      val folded = rows
        .agg(count(lit(1)).as("n"),
          sort_array(collect_list(struct(col("di"), col("detr"))))
            .as("dl"),
          sort_array(collect_list(struct(col("di"), col("resid"))))
            .as("rl"))
        .withColumn("sd",
          aggregate(col("dl"), lit(0.0), (a, e) => a + e.getField("detr")))
        .withColumn("sd2",
          aggregate(col("dl"), lit(0.0),
            (a, e) => a + e.getField("detr") * e.getField("detr")))
        .withColumn("sr",
          aggregate(col("rl"), lit(0.0), (a, e) => a + e.getField("resid")))
        .withColumn("sr2",
          aggregate(col("rl"), lit(0.0),
            (a, e) => a + e.getField("resid") * e.getField("resid")))
      folded.select(col("n"),
          ((col("sd2") - col("sd") * col("sd") / col("n").cast("double")) /
            col("n").cast("double")).as("var_detr"),
          ((col("sr2") - col("sr") * col("sr") / col("n").cast("double")) /
            col("n").cast("double")).as("var_resid"))
        .withColumn("seasonal_strength",
          greatest(lit(0.0), lit(1.0) - col("var_resid") / col("var_detr")))
    },
    Some(s"""WITH $dailySql,
      detr0 AS (SELECT di, dow, x,
          CAST(SUM(x) OVER (ORDER BY di
            ROWS BETWEEN 14 PRECEDING AND 14 FOLLOWING) AS BIGINT)
            AS tnum,
          COUNT(*) OVER (ORDER BY di
            ROWS BETWEEN 14 PRECEDING AND 14 FOLLOWING) AS nw
        FROM daily),
      detr AS (SELECT di, dow, x, tnum,
          CAST(29 * x - tnum AS DOUBLE) / 29.0 AS detr
        FROM detr0 WHERE nw = 29),
      seas AS (SELECT dow,
          CAST(SUM(29 * x - tnum) AS DOUBLE) /
            CAST(29 * COUNT(*) AS DOUBLE) AS se
        FROM detr GROUP BY dow),
      rows_ AS (SELECT d.di, d.detr, d.detr - s.se AS resid
        FROM detr d JOIN seas s ON s.dow = d.dow),
      folded AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          list_reduce(list(detr ORDER BY di), (a, b) -> a + b) AS sd,
          list_reduce(list(detr * detr ORDER BY di),
            (a, b) -> a + b) AS sd2,
          list_reduce(list(resid ORDER BY di), (a, b) -> a + b) AS sr,
          list_reduce(list(resid * resid ORDER BY di),
            (a, b) -> a + b) AS sr2
        FROM rows_)
      SELECT n,
        (sd2 - sd * sd / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
          AS var_detr,
        (sr2 - sr * sr / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)
          AS var_resid,
        greatest(0.0, 1.0 -
          ((sr2 - sr * sr / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) /
          ((sd2 - sd * sd / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
          AS seasonal_strength
      FROM folded"""),
    covers = Seq("TS-seasonal-strength"))

  val all: Seq[QueryDef] = Seq(q477, q478, q479, q480, q481)
}
