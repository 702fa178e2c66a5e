package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-77 gate additions (q404–q408): Grubbs' outlier statistic,
  * rolling trend slopes, natural-breaks binning, price-ladder
  * concentration, and A/B power analysis.
  *
  * Same exact-arithmetic discipline as round 76: integer/DECIMAL
  * aggregation, doubles only as final per-row scalars (max over
  * doubles is order-free, so MAX(|x−mean|) stays deterministic).
  */
object Round77Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  private def cents: Column =
    (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)

  // ------------------------------------------------- Grubbs' statistic
  // Extreme studentized deviate per market segment: G = max|x−x̄|/s
  // over order values — "is the worst order value a statistical
  // outlier". Moments are exact integer sums; the per-row deviation
  // is one correctly-rounded double subtraction and MAX over doubles
  // is associative, so the statistic is partitioning-independent.
  private val q404 = QueryDef(
    "q404_grubbs_outlier",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), cents.as("c"))
      val g = o.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
          sum(dec38(col("c")) * dec38(col("c"))).as("sxx"))
        .filter(col("n") >= 3)
        .withColumn("mean_c",
          col("sx").cast("double") / col("n").cast("double"))
        .withColumn("sd_c",
          sqrt((dec38(col("n")) * col("sxx")
            - dec38(col("sx")) * dec38(col("sx"))).cast("double")
            / (col("n") * (col("n") - 1L)).cast("double")))
      o.join(broadcast(g), Seq("segment"))
        .groupBy("segment")
        .agg(max(col("n")).as("n_orders"),
          max(col("mean_c")).as("mean_cents"),
          max(col("sd_c")).as("sd_cents"),
          max(abs(col("c").cast("double") - col("mean_c"))).as("max_dev"))
        .withColumn("g_stat", col("max_dev") / col("sd_cents"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT c_mktsegment AS segment,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders JOIN customer ON o_custkey = c_custkey),
      g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(c) AS HUGEINT) AS sx,
          CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sxx
        FROM o GROUP BY segment HAVING COUNT(*) >= 3),
      m AS (SELECT segment, n,
          CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
          sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
            / CAST(n * (n - 1) AS DOUBLE)) AS sd_c
        FROM g)
      SELECT o.segment, MAX(n) AS n_orders, MAX(mean_c) AS mean_cents,
        MAX(sd_c) AS sd_cents,
        MAX(abs(CAST(c AS DOUBLE) - mean_c)) AS max_dev,
        MAX(abs(CAST(c AS DOUBLE) - mean_c)) / MAX(sd_c) AS g_stat
      FROM o JOIN m ON o.segment = m.segment
      GROUP BY o.segment ORDER BY o.segment"""),
    covers = Seq("STAT-grubbs"))

  // ------------------------------------------------- rolling trend slope
  // 30-day rolling OLS slope of daily revenue — the trend-direction
  // companion to q241's rolling correlation. Every frame sum (Σt, Σy,
  // Σty, Σt²) is an exact integer windowed aggregate; the slope is a
  // single double ratio per day. Only the last 90 days are emitted —
  // a control chart, not a full dump.
  private val q405 = QueryDef(
    "q405_rolling_trend_slope",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType)).as("y"))
      val t0 = daily.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      val idx = daily.crossJoin(broadcast(t0))
        .select(col("d"), col("d1"),
          datediff(col("d"), col("d0")).cast(LongType).as("tt"), col("y"))
      val w = Window.orderBy("tt").rowsBetween(-29, Window.currentRow)
      idx.withColumn("n", count(lit(1)).over(w))
        .withColumn("st", sum(col("tt")).over(w))
        .withColumn("sy", sum(col("y")).over(w))
        .withColumn("sty", sum(dec38(col("tt")) * dec38(col("y"))).over(w))
        .withColumn("stt", sum(col("tt") * col("tt")).over(w))
        .filter(col("n") >= 10 && datediff(col("d1"), col("d")) < 90)
        .withColumn("den", dec38(col("n")) * col("stt")
          - dec38(col("st")) * dec38(col("st")))
        .filter(col("den") > 0)
        .select(col("d"), col("n").as("n_days"),
          ((dec38(col("n")) * col("sty")
            - dec38(col("st")) * dec38(col("sy"))).cast("double")
            / col("den").cast("double")).as("slope_cents_per_day"))
        .orderBy("d")
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY d),
      b AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
      idx AS (SELECT d, d1, CAST(d - d0 AS BIGINT) AS tt, y
        FROM daily, b),
      r AS (SELECT d, d1, tt, y,
          CAST(COUNT(*) OVER w AS BIGINT) AS n,
          CAST(SUM(tt) OVER w AS BIGINT) AS st,
          CAST(SUM(y) OVER w AS BIGINT) AS sy,
          CAST(SUM(CAST(tt AS HUGEINT) * y) OVER w AS HUGEINT) AS sty,
          CAST(SUM(tt * tt) OVER w AS BIGINT) AS stt
        FROM idx
        WINDOW w AS (ORDER BY tt ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)),
      f AS (SELECT d, n, st, sy, sty, stt,
          CAST(n AS HUGEINT) * stt - CAST(st AS HUGEINT) * st AS den
        FROM r WHERE n >= 10 AND d1 - d < 90)
      SELECT d, n AS n_days,
        CAST(CAST(n AS HUGEINT) * sty - CAST(st AS HUGEINT) * sy AS DOUBLE)
          / CAST(den AS DOUBLE) AS slope_cents_per_day
      FROM f WHERE den > 0 ORDER BY d"""),
    covers = Seq("W-rolling-slope"))

  // ------------------------------------------------- natural breaks
  // Largest-gap 1-D binning (Jenks-style natural breaks without the
  // iterative variance pass): the 4 widest gaps between consecutive
  // DISTINCT order values split the distribution into 5 organic
  // bands. Gaps are exact integer differences with (gap, value) tie
  // order; band assignment is a 4-row broadcast join. The distinct
  // value list is the only single-partition window — bounded by the
  // value-domain size, not the row count.
  private val q406 = QueryDef(
    "q406_natural_breaks",
    (s, dir) => {
      val v = t(s, dir, "orders").select(cents.as("c")).distinct()
      val gaps = v.withColumn("prev", lag(col("c"), 1).over(Window.orderBy("c")))
        .filter(col("prev").isNotNull)
        .withColumn("gap", col("c") - col("prev"))
      val breaks = gaps
        .withColumn("rk", row_number().over(
          Window.orderBy(desc("gap"), asc("c"))))
        .filter(col("rk") <= 4)
        .select(col("c").as("brk"))
      val perVal = t(s, dir, "orders").select(cents.as("c"))
        .groupBy("c").agg(count(lit(1)).as("nr"))
      perVal.join(broadcast(breaks), col("brk") <= col("c"), "left")
        .groupBy("c", "nr")
        .agg(count(col("brk")).as("band"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_values"), sum(col("nr")).as("n_orders"),
          min(col("c")).as("lo_cents"), max(col("c")).as("hi_cents"))
        .orderBy("band")
    },
    Some("""WITH v AS (SELECT
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
          CAST(COUNT(*) AS BIGINT) AS nr
        FROM orders GROUP BY 1),
      gaps AS (SELECT c, c - lag(c) OVER (ORDER BY c) AS gap FROM v),
      brk AS (SELECT c AS brk FROM (
          SELECT c, row_number() OVER (ORDER BY gap DESC, c) AS rk
          FROM gaps WHERE gap IS NOT NULL) WHERE rk <= 4),
      banded AS (SELECT v.c, v.nr,
          CAST(COUNT(b.brk) AS BIGINT) AS band
        FROM v LEFT JOIN brk b ON b.brk <= v.c
        GROUP BY v.c, v.nr)
      SELECT band, CAST(COUNT(*) AS BIGINT) AS n_values,
        CAST(SUM(nr) AS BIGINT) AS n_orders,
        MIN(c) AS lo_cents, MAX(c) AS hi_cents
      FROM banded GROUP BY band ORDER BY band"""),
    covers = Seq("STAT-natural-breaks"))

  // ------------------------------------------------- price ladder
  // Psychological-pricing audit per brand: how much of the catalog
  // sits on the 5 most common price points (the "price ladder"), and
  // what the modal price is. Counts and row_number only — exact, and
  // bounded by the brand × price-point cardinality.
  private val q407 = QueryDef(
    "q407_price_ladder",
    (s, dir) => {
      val p = t(s, dir, "part")
        .select(col("p_brand").as("brand"),
          (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("c"))
      val pts = p.groupBy("brand", "c").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("brand").orderBy(desc("cnt"), asc("c"))
      val ranked = pts.withColumn("rk", row_number().over(w))
      ranked.groupBy("brand")
        .agg(sum(col("cnt")).as("n_parts"),
          count(lit(1)).as("n_price_points"),
          sum(when(col("rk") <= 5, col("cnt")).otherwise(0L))
            .as("top5_mass"),
          max(when(col("rk") === 1, col("c"))).as("modal_cents"))
        .withColumn("top5_share",
          col("top5_mass").cast("double") / col("n_parts").cast("double"))
        .orderBy("brand")
    },
    Some("""WITH p AS (SELECT p_brand AS brand,
          CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM part),
      pts AS (SELECT brand, c, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM p GROUP BY brand, c),
      r AS (SELECT *, row_number() OVER (PARTITION BY brand
          ORDER BY cnt DESC, c) AS rk FROM pts)
      SELECT brand, CAST(SUM(cnt) AS BIGINT) AS n_parts,
        CAST(COUNT(*) AS BIGINT) AS n_price_points,
        CAST(SUM(CASE WHEN rk <= 5 THEN cnt ELSE 0 END) AS BIGINT)
          AS top5_mass,
        MAX(CASE WHEN rk = 1 THEN c END) AS modal_cents,
        CAST(SUM(CASE WHEN rk <= 5 THEN cnt ELSE 0 END) AS DOUBLE)
          / CAST(SUM(cnt) AS DOUBLE) AS top5_share
      FROM r GROUP BY brand ORDER BY brand"""),
    covers = Seq("A-price-ladder"))

  // ------------------------------------------------- A/B power analysis
  // Minimum detectable effect per segment for a 50/50 order-value
  // experiment at α=0.05, power 80%: MDE = (z_{α/2}+z_β)·s·√(2/n),
  // the pre-experiment companion to q400 (CUPED) and q346 (SRM).
  // Variance from exact integer moments; the z-constant is a fixed
  // literal on both sides.
  private val q408 = QueryDef(
    "q408_ab_power_mde",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), cents.as("c"))
      o.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
          sum(dec38(col("c")) * dec38(col("c"))).as("sxx"))
        .filter(col("n") >= 2)
        .withColumn("mean_cents",
          col("sx").cast("double") / col("n").cast("double"))
        .withColumn("sd_cents",
          sqrt((dec38(col("n")) * col("sxx")
            - dec38(col("sx")) * dec38(col("sx"))).cast("double")
            / (col("n") * (col("n") - 1L)).cast("double")))
        .withColumn("mde_cents", lit(2.801585d) * col("sd_cents")
          * sqrt(lit(2.0d) / col("n").cast("double")))
        .select(col("segment"), col("n").as("n_orders"),
          col("mean_cents"), col("sd_cents"), col("mde_cents"),
          (col("mde_cents") / col("mean_cents")).as("mde_rel"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT c_mktsegment AS segment,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders JOIN customer ON o_custkey = c_custkey),
      g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(c) AS HUGEINT) AS sx,
          CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sxx
        FROM o GROUP BY segment HAVING COUNT(*) >= 2),
      m AS (SELECT segment, n,
          CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
          sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
            / CAST(n * (n - 1) AS DOUBLE)) AS sd_cents
        FROM g),
      f AS (SELECT segment, n AS n_orders, mean_cents, sd_cents,
          CAST(2.801585 AS DOUBLE) * sd_cents
            * sqrt(CAST(2.0 AS DOUBLE) / CAST(n AS DOUBLE)) AS mde_cents
        FROM m)
      SELECT segment, n_orders, mean_cents, sd_cents, mde_cents,
        mde_cents / mean_cents AS mde_rel
      FROM f ORDER BY segment"""),
    covers = Seq("STAT-power-mde"))

  val all: Seq[QueryDef] =
    Seq(q404, q405, q406, q407, q408)
}
