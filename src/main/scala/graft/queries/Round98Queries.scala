package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}

import graft.Tables

/** Round-98 gate additions (q507–q511): robust and temporal
  * econometrics — Theil-Sen median slope (pairwise-slope doubles are
  * single divisions of exact integers, the median a percentile_disc
  * pick), partial correlation, Granger-style incremental R², one
  * IPF raking iteration (column refits folded in segment order),
  * and the Chow structural-break F — every statistic a fixed tree
  * over exact weekly moments.
  */
object Round98Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  /** Weekly (wk, qty, disc4, n_orders) totals — exact integers. */
  private def weekly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(
        floor(datediff(to_date(col("l_shipdate")),
          lit("1995-01-01").cast(DateType)) / lit(7.0))
          .cast(LongType).as("wk"),
        col("l_quantity").cast(DecimalType(18, 2)).cast(LongType)
          .as("qty"),
        ((col("l_extendedprice").cast(DecimalType(18, 2)) *
          col("l_discount").cast(DecimalType(4, 2))) * 10000)
          .cast(LongType).as("disc4"),
        col("l_orderkey"))
      .groupBy("wk")
      .agg(sum("qty").as("q"), sum("disc4").as("x"),
        countDistinct("l_orderkey").as("z"))

  private val weeklySql: String =
    """weekly AS MATERIALIZED (SELECT wk, CAST(SUM(qty) AS BIGINT) AS q,
        CAST(SUM(disc4) AS BIGINT) AS x,
        CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS z
      FROM (SELECT
          CAST(floor(date_diff('day', DATE '1995-01-01',
            CAST(l_shipdate AS DATE)) / 7.0) AS BIGINT) AS wk,
          CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS qty,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            CAST(l_discount AS DECIMAL(4,2)) * 10000 AS BIGINT)
            AS disc4,
          l_orderkey
        FROM lineitem) GROUP BY wk)"""

  // ------------------------------------------------- Theil-Sen
  // Median-of-pairwise-slopes trend of weekly quantity: every slope
  // is ONE division of exact integers (identical doubles), the
  // Sen slope a percentile_disc element pick over them, and the
  // intercept the median residual at that slope. The outlier-proof
  // trend line q405's OLS can't give; O(weeks²) pairs are bounded by
  // the calendar, not the data.
  private val q507 = QueryDef(
    "q507_theil_sen",
    (s, dir) => {
      val wkl = weekly(s, dir).select("wk", "q").localCheckpoint()
      val slopes = wkl.as("a").join(wkl.as("b"),
          col("a.wk") < col("b.wk"))
        .select(((col("b.q") - col("a.q")).cast("double") /
          (col("b.wk") - col("a.wk")).cast("double")).as("slope"))
      val sen = slopes.agg(count(lit(1)).as("n_pairs"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)")
          .as("sen_slope"))
      wkl.crossJoin(broadcast(sen))
        .select(col("n_pairs"), col("sen_slope"),
          (col("q").cast("double") -
            col("sen_slope") * col("wk").cast("double")).as("resid"))
        .groupBy("n_pairs", "sen_slope")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY resid)")
          .as("intercept"))
        .select(col("n_pairs"), col("sen_slope"), col("intercept"))
    },
    Some(s"""WITH $weeklySql,
      slopes AS (SELECT
          CAST(b.q - a.q AS DOUBLE) / CAST(b.wk - a.wk AS DOUBLE)
            AS slope
        FROM weekly a JOIN weekly b ON a.wk < b.wk),
      sen AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
          percentile_disc(0.5) WITHIN GROUP (ORDER BY slope)
            AS sen_slope
        FROM slopes)
      SELECT s.n_pairs, s.sen_slope,
        percentile_disc(0.5) WITHIN GROUP (ORDER BY
          CAST(w.q AS DOUBLE) - s.sen_slope * CAST(w.wk AS DOUBLE))
          AS intercept
      FROM weekly w CROSS JOIN sen s
      GROUP BY s.n_pairs, s.sen_slope"""),
    covers = Seq("STAT-theil-sen"))

  // ------------------------------------------------- partial corr
  // Does discounting correlate with quantity BEYOND what order
  // volume explains? Partial correlation r_xy·z from the three
  // pairwise Pearsons (exact HUGEINT bilinears) — the
  // volume-confounding check on q486's raw correlation.
  private val q508 = QueryDef(
    "q508_partial_correlation",
    (s, dir) => {
      val m = weekly(s, dir).agg(count(lit(1)).as("n"),
        sum("q").as("sq"), sum("x").as("sx"), sum("z").as("sz"),
        sum(dec38(col("q")) * dec38(col("q"))).as("sqq"),
        sum(dec38(col("x")) * dec38(col("x"))).as("sxx"),
        sum(dec38(col("z")) * dec38(col("z"))).as("szz"),
        sum(dec38(col("x")) * dec38(col("q"))).as("sxq"),
        sum(dec38(col("x")) * dec38(col("z"))).as("sxz"),
        sum(dec38(col("q")) * dec38(col("z"))).as("sqz"))
      def r(sab: Column, sa: Column, sb: Column,
            saa: Column, sbb: Column): Column =
        (dec38(col("n")) * sab - dec38(sa) * dec38(sb)).cast("double") /
          (sqrt((dec38(col("n")) * saa - dec38(sa) * dec38(sa))
            .cast("double")) *
           sqrt((dec38(col("n")) * sbb - dec38(sb) * dec38(sb))
            .cast("double")))
      m.select(col("n"),
          r(col("sxq"), col("sx"), col("sq"), col("sxx"), col("sqq"))
            .as("r_xy"),
          r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
            .as("r_xz"),
          r(col("sqz"), col("sq"), col("sz"), col("sqq"), col("szz"))
            .as("r_yz"))
        .withColumn("partial_r",
          (col("r_xy") - col("r_xz") * col("r_yz")) /
            (sqrt(lit(1.0) - col("r_xz") * col("r_xz")) *
             sqrt(lit(1.0) - col("r_yz") * col("r_yz"))))
    },
    Some(s"""WITH $weeklySql,
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(x) AS BIGINT) AS sx,
          CAST(SUM(z) AS BIGINT) AS sz,
          SUM(CAST(q AS HUGEINT) * q) AS sqq,
          SUM(CAST(x AS HUGEINT) * x) AS sxx,
          SUM(CAST(z AS HUGEINT) * z) AS szz,
          SUM(CAST(x AS HUGEINT) * q) AS sxq,
          SUM(CAST(x AS HUGEINT) * z) AS sxz,
          SUM(CAST(q AS HUGEINT) * z) AS sqz
        FROM weekly),
      rs AS (SELECT n,
          CAST(CAST(n AS HUGEINT) * sxq - CAST(sx AS HUGEINT) * sq
            AS DOUBLE) /
            (sqrt(CAST(CAST(n AS HUGEINT) * sxx -
              CAST(sx AS HUGEINT) * sx AS DOUBLE)) *
             sqrt(CAST(CAST(n AS HUGEINT) * sqq -
              CAST(sq AS HUGEINT) * sq AS DOUBLE))) AS r_xy,
          CAST(CAST(n AS HUGEINT) * sxz - CAST(sx AS HUGEINT) * sz
            AS DOUBLE) /
            (sqrt(CAST(CAST(n AS HUGEINT) * sxx -
              CAST(sx AS HUGEINT) * sx AS DOUBLE)) *
             sqrt(CAST(CAST(n AS HUGEINT) * szz -
              CAST(sz AS HUGEINT) * sz AS DOUBLE))) AS r_xz,
          CAST(CAST(n AS HUGEINT) * sqz - CAST(sq AS HUGEINT) * sz
            AS DOUBLE) /
            (sqrt(CAST(CAST(n AS HUGEINT) * sqq -
              CAST(sq AS HUGEINT) * sq AS DOUBLE)) *
             sqrt(CAST(CAST(n AS HUGEINT) * szz -
              CAST(sz AS HUGEINT) * sz AS DOUBLE))) AS r_yz
        FROM m)
      SELECT n, r_xy, r_xz, r_yz,
        (r_xy - r_xz * r_yz) /
          (sqrt(1.0 - r_xz * r_xz) * sqrt(1.0 - r_yz * r_yz))
          AS partial_r
      FROM rs"""),
    covers = Seq("STAT-partial-correlation"))

  // ------------------------------------------------- Granger-lite
  // Does last week's DISCOUNT predict this week's quantity beyond
  // last week's quantity? Incremental R² of the two-regressor model
  // over the AR(1) baseline — both R²s closed forms over exact
  // centered moments (identical trees), no iterative fit. The
  // lead-lag causality screen behind promotion planning.
  private val q509 = QueryDef(
    "q509_granger_lite",
    (s, dir) => {
      val w = Window.orderBy("wk")
      val rows = weekly(s, dir)
        .withColumn("wk_prev", lag(col("wk"), 1).over(w))
        .withColumn("ylag", lag(col("q"), 1).over(w))
        .withColumn("xlag", lag(col("x"), 1).over(w))
        .filter(col("wk_prev") === col("wk") - 1)
        .select(col("q").as("y"), col("ylag").as("x1"),
          col("xlag").as("x2"))
      val m = rows.agg(count(lit(1)).as("n"),
        sum("y").as("sy"), sum("x1").as("s1"), sum("x2").as("s2"),
        sum(dec38(col("y")) * dec38(col("y"))).as("syy"),
        sum(dec38(col("x1")) * dec38(col("x1"))).as("s11"),
        sum(dec38(col("x2")) * dec38(col("x2"))).as("s22"),
        sum(dec38(col("x1")) * dec38(col("y"))).as("s1y"),
        sum(dec38(col("x2")) * dec38(col("y"))).as("s2y"),
        sum(dec38(col("x1")) * dec38(col("x2"))).as("s12"))
      m.select(col("n"),
          (dec38(col("n")) * col("syy") - dec38(col("sy")) * dec38(col("sy")))
            .cast("double").as("a"),
          (dec38(col("n")) * col("s1y") - dec38(col("s1")) * dec38(col("sy")))
            .cast("double").as("b1"),
          (dec38(col("n")) * col("s2y") - dec38(col("s2")) * dec38(col("sy")))
            .cast("double").as("b2"),
          (dec38(col("n")) * col("s11") - dec38(col("s1")) * dec38(col("s1")))
            .cast("double").as("c11"),
          (dec38(col("n")) * col("s22") - dec38(col("s2")) * dec38(col("s2")))
            .cast("double").as("c22"),
          (dec38(col("n")) * col("s12") - dec38(col("s1")) * dec38(col("s2")))
            .cast("double").as("c12"))
        .withColumn("r2_ar", (col("b1") * col("b1") / col("c11")) / col("a"))
        .withColumn("r2_full",
          ((col("b1") * col("b1") * col("c22") +
            col("b2") * col("b2") * col("c11") -
            lit(2.0) * col("b1") * col("b2") * col("c12")) /
            (col("c11") * col("c22") - col("c12") * col("c12"))) / col("a"))
        .select(col("n"), col("r2_ar"), col("r2_full"),
          (col("r2_full") - col("r2_ar")).as("incremental_r2"))
    },
    Some(s"""WITH $weeklySql,
      rows_ AS (SELECT q AS y, ylag AS x1, xlag AS x2 FROM (
          SELECT wk, q, x,
            lag(wk, 1) OVER (ORDER BY wk) AS wk_prev,
            lag(q, 1) OVER (ORDER BY wk) AS ylag,
            lag(x, 1) OVER (ORDER BY wk) AS xlag
          FROM weekly) WHERE wk_prev = wk - 1),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x1) AS BIGINT) AS s1,
          CAST(SUM(x2) AS BIGINT) AS s2,
          SUM(CAST(y AS HUGEINT) * y) AS syy,
          SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
          SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
          SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
          SUM(CAST(x2 AS HUGEINT) * y) AS s2y,
          SUM(CAST(x1 AS HUGEINT) * x2) AS s12
        FROM rows_),
      c AS (SELECT n,
          CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
            AS DOUBLE) AS a,
          CAST(CAST(n AS HUGEINT) * s1y - CAST(s1 AS HUGEINT) * sy
            AS DOUBLE) AS b1,
          CAST(CAST(n AS HUGEINT) * s2y - CAST(s2 AS HUGEINT) * sy
            AS DOUBLE) AS b2,
          CAST(CAST(n AS HUGEINT) * s11 - CAST(s1 AS HUGEINT) * s1
            AS DOUBLE) AS c11,
          CAST(CAST(n AS HUGEINT) * s22 - CAST(s2 AS HUGEINT) * s2
            AS DOUBLE) AS c22,
          CAST(CAST(n AS HUGEINT) * s12 - CAST(s1 AS HUGEINT) * s2
            AS DOUBLE) AS c12
        FROM m)
      SELECT n, (b1 * b1 / c11) / a AS r2_ar,
        ((b1 * b1 * c22 + b2 * b2 * c11 - 2.0 * b1 * b2 * c12) /
          (c11 * c22 - c12 * c12)) / a AS r2_full,
        ((b1 * b1 * c22 + b2 * b2 * c11 - 2.0 * b1 * b2 * c12) /
          (c11 * c22 - c12 * c12)) / a - (b1 * b1 / c11) / a
          AS incremental_r2
      FROM c"""),
    covers = Seq("STAT-granger-lite"))

  // ------------------------------------------------- IPF raking
  // One iteration of iterative proportional fitting: rake the
  // segment×priority order counts to UNIFORM marginals (N/5 per row
  // and column). Row factors are exact-ratio doubles; the column
  // refit divides by column totals folded in segment order — the
  // survey-weighting core, with the post-rake row drift reported as
  // the convergence diagnostic.
  private val q510 = QueryDef(
    "q510_ipf_raking",
    (s, dir) => {
      val cells = t(s, dir, "orders")
        .join(t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("seg")), Seq("o_custkey"))
        .groupBy(col("seg"), col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("nij"))
        .localCheckpoint()
      val tot = cells.agg(sum("nij").as("nn"))
      val rowTot = cells.groupBy("seg").agg(sum("nij").as("rt"))
      val w1 = cells.join(broadcast(rowTot), Seq("seg"))
        .crossJoin(broadcast(tot))
        .withColumn("target", col("nn").cast("double") / lit(5.0))
        .withColumn("w1",
          col("nij").cast("double") *
            (col("target") / col("rt").cast("double")))
      val colTot = w1.groupBy("pri")
        .agg(sort_array(collect_list(struct(col("seg"), col("w1"))))
          .as("wl"))
        .withColumn("ct",
          aggregate(col("wl"), lit(0.0), (a, e) => a + e.getField("w1")))
        .select("pri", "ct")
      w1.join(broadcast(colTot), Seq("pri"))
        .withColumn("w2", col("w1") * (col("target") / col("ct")))
        .select(col("seg"), col("pri"), col("nij"),
          (col("w2") / col("nij").cast("double")).as("rake_factor"),
          col("w2"))
        .orderBy("seg", "pri")
    },
    Some("""WITH cells AS MATERIALIZED (SELECT c.c_mktsegment AS seg,
          o.o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS nij
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS nn FROM cells),
      row_tot AS (SELECT seg, CAST(SUM(nij) AS BIGINT) AS rt
        FROM cells GROUP BY 1),
      w1 AS MATERIALIZED (SELECT c.seg, c.pri, c.nij,
          CAST(t.nn AS DOUBLE) / 5.0 AS target,
          CAST(c.nij AS DOUBLE) *
            ((CAST(t.nn AS DOUBLE) / 5.0) / CAST(r.rt AS DOUBLE)) AS w1
        FROM cells c JOIN row_tot r ON r.seg = c.seg CROSS JOIN tot t),
      col_tot AS (SELECT pri,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(w1 ORDER BY seg)), (a, b) -> a + b) AS ct
        FROM w1 GROUP BY pri)
      SELECT w.seg, w.pri, w.nij,
        (w.w1 * (w.target / ct.ct)) / CAST(w.nij AS DOUBLE)
          AS rake_factor,
        w.w1 * (w.target / ct.ct) AS w2
      FROM w1 w JOIN col_tot ct ON ct.pri = w.pri
      ORDER BY w.seg, w.pri"""),
    covers = Seq("STAT-ipf-raking"))

  // ------------------------------------------------- Chow test
  // Structural break in the weekly-quantity trend at 1998: pooled vs
  // split linear fits, each SSE the closed form (A − B²/C)/n over
  // exact centered moments, F = ((SSEp − SSE1 − SSE2)/2)/
  // ((SSE1+SSE2)/(n−4)) — the regime-change test with zero
  // iterative fitting.
  private val q511 = QueryDef(
    "q511_chow_test",
    (s, dir) => {
      val cut = 157L // floor(days(1995-01-01..1998-01-01)/7)
      val wkl = weekly(s, dir).select(col("wk"), col("q"))
        .withColumn("seg2", (col("wk") >= cut).cast("int"))
        .localCheckpoint()
      def mom(df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n"), sum("wk").as("sx"),
          sum("q").as("sy"),
          sum(dec38(col("wk")) * dec38(col("wk"))).as("sxx"),
          sum(dec38(col("q")) * dec38(col("q"))).as("syy"),
          sum(dec38(col("wk")) * dec38(col("q"))).as("sxy"))
      def sse(p: String): Column =
        ((col(s"${p}a") - col(s"${p}b") * col(s"${p}b") / col(s"${p}c")) /
          col(s"${p}n").cast("double"))
      def named(df: DataFrame, p: String): DataFrame =
        df.select(col("n").as(s"${p}n"),
          (dec38(col("n")) * col("syy") - dec38(col("sy")) * dec38(col("sy")))
            .cast("double").as(s"${p}a"),
          (dec38(col("n")) * col("sxy") - dec38(col("sx")) * dec38(col("sy")))
            .cast("double").as(s"${p}b"),
          (dec38(col("n")) * col("sxx") - dec38(col("sx")) * dec38(col("sx")))
            .cast("double").as(s"${p}c"))
      val p = named(mom(wkl), "p")
      val g1 = named(mom(wkl.filter(col("seg2") === 0)), "g1")
      val g2 = named(mom(wkl.filter(col("seg2") === 1)), "g2")
      p.crossJoin(g1).crossJoin(g2)
        .select(col("g1n").as("n_pre"), col("g2n").as("n_post"),
          sse("p").as("sse_pooled"),
          (sse("g1") + sse("g2")).as("sse_split"))
        .withColumn("f_stat",
          ((col("sse_pooled") - col("sse_split")) / lit(2.0)) /
            (col("sse_split") /
              (col("n_pre") + col("n_post") - lit(4L)).cast("double")))
    },
    Some(s"""WITH $weeklySql,
      wkl AS (SELECT wk, q, (wk >= 157) AS post FROM weekly),
      mp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(wk) AS BIGINT) AS sx, CAST(SUM(q) AS BIGINT) AS sy,
          SUM(CAST(wk AS HUGEINT) * wk) AS sxx,
          SUM(CAST(q AS HUGEINT) * q) AS syy,
          SUM(CAST(wk AS HUGEINT) * q) AS sxy
        FROM wkl),
      m1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(wk) AS BIGINT) AS sx, CAST(SUM(q) AS BIGINT) AS sy,
          SUM(CAST(wk AS HUGEINT) * wk) AS sxx,
          SUM(CAST(q AS HUGEINT) * q) AS syy,
          SUM(CAST(wk AS HUGEINT) * q) AS sxy
        FROM wkl WHERE NOT post),
      m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(wk) AS BIGINT) AS sx, CAST(SUM(q) AS BIGINT) AS sy,
          SUM(CAST(wk AS HUGEINT) * wk) AS sxx,
          SUM(CAST(q AS HUGEINT) * q) AS syy,
          SUM(CAST(wk AS HUGEINT) * q) AS sxy
        FROM wkl WHERE post),
      f AS (SELECT
          m1.n AS n_pre, m2.n AS n_post,
          (CAST(CAST(mp.n AS HUGEINT) * mp.syy -
              CAST(mp.sy AS HUGEINT) * mp.sy AS DOUBLE) -
            CAST(CAST(mp.n AS HUGEINT) * mp.sxy -
              CAST(mp.sx AS HUGEINT) * mp.sy AS DOUBLE) *
            CAST(CAST(mp.n AS HUGEINT) * mp.sxy -
              CAST(mp.sx AS HUGEINT) * mp.sy AS DOUBLE) /
            CAST(CAST(mp.n AS HUGEINT) * mp.sxx -
              CAST(mp.sx AS HUGEINT) * mp.sx AS DOUBLE)) /
            CAST(mp.n AS DOUBLE) AS sse_pooled,
          (CAST(CAST(m1.n AS HUGEINT) * m1.syy -
              CAST(m1.sy AS HUGEINT) * m1.sy AS DOUBLE) -
            CAST(CAST(m1.n AS HUGEINT) * m1.sxy -
              CAST(m1.sx AS HUGEINT) * m1.sy AS DOUBLE) *
            CAST(CAST(m1.n AS HUGEINT) * m1.sxy -
              CAST(m1.sx AS HUGEINT) * m1.sy AS DOUBLE) /
            CAST(CAST(m1.n AS HUGEINT) * m1.sxx -
              CAST(m1.sx AS HUGEINT) * m1.sx AS DOUBLE)) /
            CAST(m1.n AS DOUBLE) +
          (CAST(CAST(m2.n AS HUGEINT) * m2.syy -
              CAST(m2.sy AS HUGEINT) * m2.sy AS DOUBLE) -
            CAST(CAST(m2.n AS HUGEINT) * m2.sxy -
              CAST(m2.sx AS HUGEINT) * m2.sy AS DOUBLE) *
            CAST(CAST(m2.n AS HUGEINT) * m2.sxy -
              CAST(m2.sx AS HUGEINT) * m2.sy AS DOUBLE) /
            CAST(CAST(m2.n AS HUGEINT) * m2.sxx -
              CAST(m2.sx AS HUGEINT) * m2.sx AS DOUBLE)) /
            CAST(m2.n AS DOUBLE) AS sse_split
        FROM mp, m1, m2)
      SELECT n_pre, n_post, sse_pooled, sse_split,
        ((sse_pooled - sse_split) / 2.0) /
          (sse_split / CAST(n_pre + n_post - 4 AS DOUBLE)) AS f_stat
      FROM f"""),
    covers = Seq("STAT-chow-test"))

  val all: Seq[QueryDef] = Seq(q507, q508, q509, q510, q511)
}
