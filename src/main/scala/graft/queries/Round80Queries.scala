package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-80 gate additions (q419–q423): elite persistence, LTV
  * predictiveness, engagement breadth, seasonal peak alignment, and
  * the discount money audit. Exact-arithmetic discipline throughout.
  */
object Round80Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  private def cents: Column =
    (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)

  // ------------------------------------------------- top-decile persistence
  // Are this year's best customers last year's? Per year, the top
  // decile of customers by spend (exact percentile_disc cutoff,
  // inclusive); adjacent years joined on customer, overlap reported
  // as |A∩B| with containment in BOTH directions. The "elite churn"
  // statistic behind loyalty-program design.
  private val q419 = QueryDef(
    "q419_top_decile_persistence",
    (s, dir) => {
      val cy = t(s, dir, "orders")
        .groupBy(col("o_custkey"),
          year(to_date(col("o_orderdate"))).cast(LongType).as("yr"))
        .agg(sum(cents).as("spend"))
        // materialized once: feeds the percentile broadcast build (a
        // separate job) and the top-decile filter
        .localCheckpoint()
      // built-in percentile_disc stays: per-year spend values are
      // per-customer aggregates (many small-ish groups over an
      // already-shrunk frame) — the ExactQuantiles rewrite measured
      // SLOWER here at sf0.1 and sf1 both (same-JVM A/B)
      val cut = cy.groupBy("yr")
        .agg(expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY spend)")
          .cast(LongType).as("p90"))
      val top = cy.join(broadcast(cut), Seq("yr"))
        .filter(col("spend") >= col("p90"))
        .select(col("yr"), col("o_custkey"))
        // materialized once (O(customers/10) rows): read by sizes
        // (twice, via the year-shift self-join) and both sides of the
        // adjacency intersection
        .localCheckpoint()
      val a = top.select(col("o_custkey").as("cust"), col("yr").as("yr_a"))
      val b = top.select(col("o_custkey").as("cust"),
        (col("yr") - 1L).as("yr_b"))
      val sizes = top.groupBy("yr").agg(count(lit(1)).as("n_top"))
      val inter = a.join(b, Seq("cust"))
        .filter(col("yr_a") === col("yr_b"))
        .groupBy(col("yr_a").as("yr")).agg(count(lit(1)).as("n_overlap"))
      sizes.as("s1")
        .join(sizes.as("s2").select((col("yr") - 1L).as("yr"),
          col("n_top").as("n_top_next")), Seq("yr"))
        .join(inter, Seq("yr"), "left")
        .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
        .select(col("yr"), col("n_top"), col("n_top_next"), col("n_overlap"),
          (col("n_overlap").cast("double") / col("n_top").cast("double"))
            .as("retention_rate"),
          (col("n_overlap").cast("double") / col("n_top_next").cast("double"))
            .as("sourced_rate"))
        .orderBy("yr")
    },
    Some("""WITH cy AS (SELECT o_custkey,
          CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS spend
        FROM orders GROUP BY 1, 2),
      cut AS (SELECT yr,
          CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY spend)
            AS BIGINT) AS p90
        FROM cy GROUP BY yr),
      top AS (SELECT cy.yr, o_custkey FROM cy JOIN cut ON cy.yr = cut.yr
        WHERE spend >= p90),
      sizes AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_top
        FROM top GROUP BY yr),
      inter AS (SELECT a.yr, CAST(COUNT(*) AS BIGINT) AS n_overlap
        FROM top a JOIN top b
          ON a.yr = b.yr - 1 AND a.o_custkey = b.o_custkey
        GROUP BY a.yr)
      SELECT s1.yr, s1.n_top, s2.n_top AS n_top_next,
        COALESCE(n_overlap, 0) AS n_overlap,
        CAST(COALESCE(n_overlap, 0) AS DOUBLE) / CAST(s1.n_top AS DOUBLE)
          AS retention_rate,
        CAST(COALESCE(n_overlap, 0) AS DOUBLE) / CAST(s2.n_top AS DOUBLE)
          AS sourced_rate
      FROM sizes s1 JOIN sizes s2 ON s2.yr = s1.yr + 1
      LEFT JOIN inter ON inter.yr = s1.yr
      ORDER BY s1.yr"""),
    covers = Seq("A-elite-persistence"))

  // ------------------------------------------------- LTV predictiveness
  // Does the FIRST order's size predict everything after it? Pearson
  // between first-order cents and the rest-of-lifetime total per
  // segment — q378 asked how much value lands early; this asks
  // whether the first purchase is a usable signal. Exact moments,
  // one window.
  private val q420 = QueryDef(
    "q420_ltv_predictiveness",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
          col("o_orderkey"), cents.as("c"))
        .withColumn("rn", row_number().over(w))
      val perCust = o.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          max(when(col("rn") === 1, col("c"))).as("first_c"),
          sum(when(col("rn") > 1, col("c")).otherwise(0L)).as("rest_c"))
        .filter(col("n_orders") >= 2)
      val seg = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val g = perCust
        .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("first_c")).as("sx"), sum(col("rest_c")).as("sy"),
          sum(dec38(col("first_c")) * dec38(col("rest_c"))).as("sxy"),
          sum(dec38(col("first_c")) * dec38(col("first_c"))).as("sxx"),
          sum(dec38(col("rest_c")) * dec38(col("rest_c"))).as("syy"))
      val num = dec38(col("n_cust")) * col("sxy") - dec38(col("sx")) * dec38(col("sy"))
      val den1 = dec38(col("n_cust")) * col("sxx") - dec38(col("sx")) * dec38(col("sx"))
      val den2 = dec38(col("n_cust")) * col("syy") - dec38(col("sy")) * dec38(col("sy"))
      g.withColumn("num", num).withColumn("den1", den1).withColumn("den2", den2)
        .filter(col("den1") > 0 && col("den2") > 0)
        .select(col("segment"), col("n_cust"),
          (col("num").cast("double") /
            (sqrt(col("den1").cast("double")) * sqrt(col("den2").cast("double"))))
            .as("first_rest_corr"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
          o_orderkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders),
      r AS (SELECT o_custkey, c,
          row_number() OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
            AS rn
        FROM o),
      pc AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
          MAX(CASE WHEN rn = 1 THEN c END) AS first_c,
          CAST(SUM(CASE WHEN rn > 1 THEN c ELSE 0 END) AS BIGINT) AS rest_c
        FROM r GROUP BY o_custkey HAVING COUNT(*) >= 2),
      g AS (SELECT c_mktsegment AS segment,
          CAST(COUNT(*) AS BIGINT) AS n_cust,
          CAST(SUM(first_c) AS HUGEINT) AS sx,
          CAST(SUM(rest_c) AS HUGEINT) AS sy,
          CAST(SUM(CAST(first_c AS HUGEINT) * rest_c) AS HUGEINT) AS sxy,
          CAST(SUM(CAST(first_c AS HUGEINT) * first_c) AS HUGEINT) AS sxx,
          CAST(SUM(CAST(rest_c AS HUGEINT) * rest_c) AS HUGEINT) AS syy
        FROM pc JOIN customer ON o_custkey = c_custkey
        GROUP BY segment),
      f AS (SELECT segment, n_cust,
          CAST(n_cust AS HUGEINT) * sxy - sx * sy AS num,
          CAST(n_cust AS HUGEINT) * sxx - sx * sx AS den1,
          CAST(n_cust AS HUGEINT) * syy - sy * sy AS den2
        FROM g)
      SELECT segment, n_cust,
        CAST(num AS DOUBLE) / (sqrt(CAST(den1 AS DOUBLE))
          * sqrt(CAST(den2 AS DOUBLE))) AS first_rest_corr
      FROM f WHERE den1 > 0 AND den2 > 0
      ORDER BY segment"""),
    covers = Seq("A-ltv-predictiveness"))

  // ------------------------------------------------- engagement breadth
  // Participation BREADTH census: users by how many DISTINCT event
  // types they touch — q393 measured volume, this measures variety
  // (the "single-feature user" share that predicts churn). Each
  // breadth level also reports its share of total event volume.
  private val q421 = QueryDef(
    "q421_engagement_breadth",
    (s, dir) => {
      val perUser = t(s, dir, "events")
        .groupBy("user_id")
        .agg(countDistinct(col("event_type")).as("breadth"),
          count(lit(1)).as("n_events"))
      val tot = perUser.agg(count(lit(1)).as("nu"),
        sum(col("n_events")).as("ne"))
      perUser.groupBy("breadth")
        .agg(count(lit(1)).as("n_users"), sum(col("n_events")).as("events"))
        .crossJoin(broadcast(tot))
        .select(col("breadth"), col("n_users"),
          (col("n_users").cast("double") / col("nu").cast("double"))
            .as("user_share"),
          (col("events").cast("double") / col("ne").cast("double"))
            .as("event_share"))
        .orderBy("breadth")
    },
    Some("""WITH pu AS (SELECT user_id,
          CAST(COUNT(DISTINCT event_type) AS BIGINT) AS breadth,
          CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu,
          CAST(SUM(n_events) AS BIGINT) AS ne FROM pu)
      SELECT breadth, CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(COUNT(*) AS DOUBLE) / CAST(MIN(nu) AS DOUBLE) AS user_share,
        CAST(SUM(n_events) AS DOUBLE) / CAST(MIN(ne) AS DOUBLE)
          AS event_share
      FROM pu, tot GROUP BY breadth ORDER BY breadth"""),
    covers = Seq("A-engagement-breadth"))

  // ------------------------------------------------- peak alignment
  // Do all market segments peak in the same calendar month? Per
  // segment: the peak revenue month (exact DECIMAL argmax, ties →
  // earliest month) and its share of the segment's year — if every
  // segment peaks together, capacity planning is one problem; if
  // they stagger, it's five.
  private val q422 = QueryDef(
    "q422_peak_alignment",
    (s, dir) => {
      val sm = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          month(to_date(col("o_orderdate"))).cast(LongType).as("m"))
        .agg(sum(cents).as("rev"))
      val w = Window.partitionBy("segment")
      val ranked = sm
        .withColumn("seg_rev", sum(col("rev")).over(w))
        .withColumn("rk", row_number().over(
          Window.partitionBy("segment").orderBy(desc("rev"), asc("m"))))
      ranked.filter(col("rk") === 1)
        .select(col("segment"), col("m").as("peak_month"),
          col("rev").as("peak_rev_cents"),
          (col("rev").cast("double") / col("seg_rev").cast("double"))
            .as("peak_share"))
        .orderBy("segment")
    },
    Some("""WITH sm AS (SELECT c_mktsegment AS segment,
          CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS m,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2),
      r AS (SELECT segment, m, rev,
          CAST(SUM(rev) OVER (PARTITION BY segment) AS BIGINT) AS seg_rev,
          row_number() OVER (PARTITION BY segment
            ORDER BY rev DESC, m) AS rk
        FROM sm)
      SELECT segment, m AS peak_month, rev AS peak_rev_cents,
        CAST(rev AS DOUBLE) / CAST(seg_rev AS DOUBLE) AS peak_share
      FROM r WHERE rk = 1 ORDER BY segment"""),
    covers = Seq("A-peak-alignment"))

  // ------------------------------------------------- discount spend audit
  // Where does the discount budget actually go? Per discount band:
  // gross revenue, discount dollars given (exact at scale 4 —
  // price × rate never rounds), net, and the band's share of the
  // total discount budget. The money-flow companion to q413's unit
  // price curve.
  private val q423 = QueryDef(
    "q423_discount_spend",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        (col("l_discount").cast(DecimalType(4, 2)) * 100)
          .cast(LongType).as("disc_pct"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("gross_c"),
        (col("l_extendedprice").cast(DecimalType(18, 2))
          * col("l_discount").cast(DecimalType(4, 2)) * 10000)
          .cast(LongType).as("disc_x10000"))
      val tot = li.agg(sum(col("disc_x10000")).as("td"))
      li.groupBy("disc_pct")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("gross_c")).as("gross_cents"),
          sum(col("disc_x10000")).as("disc_x10000"))
        .crossJoin(broadcast(tot))
        .select(col("disc_pct"), col("n_lines"), col("gross_cents"),
          col("disc_x10000"),
          (col("disc_x10000").cast("double") / col("td").cast("double"))
            .as("budget_share"),
          (col("disc_x10000").cast("double")
            / (col("gross_cents") * 100L).cast("double")).as("realized_rate"))
        .orderBy("disc_pct")
    },
    Some("""WITH li AS (SELECT
          CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS disc_pct,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS gross_c,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * CAST(l_discount AS DECIMAL(4,2)) * 10000 AS BIGINT)
            AS disc_x10000
        FROM lineitem),
      tot AS (SELECT CAST(SUM(disc_x10000) AS BIGINT) AS td FROM li)
      SELECT disc_pct, CAST(COUNT(*) AS BIGINT) AS n_lines,
        CAST(SUM(gross_c) AS BIGINT) AS gross_cents,
        CAST(SUM(disc_x10000) AS BIGINT) AS disc_x10000,
        CAST(SUM(disc_x10000) AS DOUBLE) / CAST(MIN(td) AS DOUBLE)
          AS budget_share,
        CAST(SUM(disc_x10000) AS DOUBLE)
          / CAST(SUM(gross_c) * 100 AS DOUBLE) AS realized_rate
      FROM li, tot GROUP BY disc_pct ORDER BY disc_pct"""),
    covers = Seq("A-discount-spend"))

  val all: Seq[QueryDef] =
    Seq(q419, q420, q421, q422, q423)
}
