package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}

import graft.Tables

/** Round-93 gate additions (q482–q486): operational analytics —
  * abuse-velocity detection (sliding range-frame windows), inventory
  * planning (reorder point, newsvendor quantile stocking, EOQ), and
  * promotion pull-forward. Inventory formulas are sqrt/division
  * trees over exact weekly-demand moments; every census decision is
  * an integer compare.
  */
object Round93Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Weekly shipped quantity per part (exact integer units). */
  private def weeklyDemand(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey"),
        floor(datediff(to_date(col("l_shipdate")),
          lit("1995-01-01").cast(DateType)) / lit(7.0))
          .cast(LongType).as("wk"),
        col("l_quantity").cast(DecimalType(18, 2)).cast(LongType)
          .as("qty"))
      .groupBy("l_partkey", "wk").agg(sum("qty").as("q"))

  private val weeklyDemandSql: String =
    """wd AS (SELECT l_partkey, wk, CAST(SUM(qty) AS BIGINT) AS q
      FROM (SELECT l_partkey,
          CAST(floor(date_diff('day', DATE '1995-01-01',
            CAST(l_shipdate AS DATE)) / 7.0) AS BIGINT) AS wk,
          CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS qty
        FROM lineitem) GROUP BY 1, 2)"""

  // ------------------------------------------------- velocity burst
  // Abuse-rate detection: each user's maximum events inside any
  // sliding 60-second window (RANGE frame over epoch seconds — the
  // window shape rate limiters are built on), censused by burst
  // size, with the top-10 burstiest users listed. Exact counts; the
  // per-user partition is the natural shard at any scale.
  private val q482 = QueryDef(
    "q482_velocity_burst",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) DIV 1000000").as("sec"))
      val w = Window.partitionBy("user_id").orderBy("sec")
        .rangeBetween(-59, 0)
      val burst = ev.withColumn("in_window", count(lit(1)).over(w))
        .groupBy("user_id").agg(max("in_window").as("max_burst"))
      val top = burst
        .orderBy(col("max_burst").desc, col("user_id")).limit(10)
        .select(col("user_id"), col("max_burst"))
      top
    },
    Some("""WITH ev AS (SELECT user_id,
          CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      burst AS (SELECT user_id,
          CAST(MAX(iw) AS BIGINT) AS max_burst
        FROM (SELECT user_id,
            COUNT(*) OVER (PARTITION BY user_id ORDER BY sec
              RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS iw
          FROM ev)
        GROUP BY user_id)
      SELECT user_id, max_burst FROM burst
      ORDER BY max_burst DESC, user_id LIMIT 10"""),
    covers = Seq("OPS-velocity-burst"))

  // ------------------------------------------------- reorder point
  // Continuous-review (s,Q) reorder point per top-20 part: ROP =
  // L·μ + z·√L·σ with lead time L = 2 weeks, z = 1.645 (95%
  // service), μ/σ from exact weekly-demand moments over the COMPLETE
  // week grid (zero weeks count — absent weeks are real zero
  // demand). σ derives from n·Σq²−S² in one sqrt; the rest is
  // literal arithmetic identical on both engines.
  private val q483 = QueryDef(
    "q483_reorder_point",
    (s, dir) => {
      val wd = weeklyDemand(s, dir).localCheckpoint()
      val span = wd.agg((max("wk") - min("wk") + 1L).as("tw"))
      val stats = wd.groupBy("l_partkey")
        .agg(sum("q").as("sq"), sum(col("q") * col("q")).as("sq2"),
          count(lit(1)).as("nz"))
        .crossJoin(broadcast(span))
      val top = stats.orderBy(col("sq").desc, col("l_partkey")).limit(20)
      top.select(col("l_partkey"), col("tw"), col("nz"), col("sq"),
          (col("sq").cast("double") / col("tw").cast("double")).as("mu"),
          (sqrt((col("tw") * col("sq2") - col("sq") * col("sq"))
            .cast("double")) / col("tw").cast("double")).as("sigma"))
        .withColumn("rop",
          lit(2.0) * col("mu") +
            lit(1.645) * sqrt(lit(2.0)) * col("sigma"))
        .select(col("l_partkey"), col("nz"), col("sq").as("total_qty"),
          col("mu"), col("sigma"), col("rop"))
        .orderBy(col("total_qty").desc, col("l_partkey"))
    },
    Some(s"""WITH $weeklyDemandSql,
      span AS (SELECT MAX(wk) - MIN(wk) + 1 AS tw FROM wd),
      stats AS (SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS sq,
          CAST(SUM(q * q) AS BIGINT) AS sq2,
          CAST(COUNT(*) AS BIGINT) AS nz
        FROM wd GROUP BY 1),
      top AS (SELECT s.*, sp.tw FROM stats s CROSS JOIN span sp
        ORDER BY s.sq DESC, s.l_partkey LIMIT 20)
      SELECT l_partkey, nz, sq AS total_qty,
        CAST(sq AS DOUBLE) / CAST(tw AS DOUBLE) AS mu,
        sqrt(CAST(tw * sq2 - sq * sq AS DOUBLE)) /
          CAST(tw AS DOUBLE) AS sigma,
        2.0 * (CAST(sq AS DOUBLE) / CAST(tw AS DOUBLE)) +
          1.645 * sqrt(2.0) * (sqrt(CAST(tw * sq2 - sq * sq AS DOUBLE))
            / CAST(tw AS DOUBLE)) AS rop
      FROM top ORDER BY total_qty DESC, l_partkey"""),
    covers = Seq("OPS-reorder-point"))

  // ------------------------------------------------- newsvendor
  // Newsvendor stocking per brand at critical ratio 0.3 (30% margin,
  // cost recoverable): Q* = the 30th-percentile week of brand demand
  // (exact percentile_disc pick over the zero-filled week grid via
  // complete-bucket accounting), audited with the realized cycle
  // service level P(demand ≤ Q*) and the volume fill rate
  // Σmin(d,Q*)/Σd — both exact integer ratios.
  private val q484 = QueryDef(
    "q484_newsvendor",
    (s, dir) => {
      val bw = t(s, dir, "lineitem")
        .join(t(s, dir, "part").select(col("p_partkey").as("l_partkey"),
          col("p_brand")), Seq("l_partkey"))
        .select(col("p_brand"),
          floor(datediff(to_date(col("l_shipdate")),
            lit("1995-01-01").cast(DateType)) / lit(7.0))
            .cast(LongType).as("wk"),
          col("l_quantity").cast(DecimalType(18, 2)).cast(LongType)
            .as("qty"))
        .groupBy("p_brand", "wk").agg(sum("qty").as("d"))
        .localCheckpoint()
      val qstar = bw.groupBy("p_brand")
        .agg(count(lit(1)).as("n_weeks"),
          expr("percentile_disc(0.3) WITHIN GROUP (ORDER BY d)")
            .cast(LongType).as("q_star"))
      bw.join(broadcast(qstar), Seq("p_brand"))
        .groupBy("p_brand", "n_weeks", "q_star")
        .agg(sum(when(col("d") <= col("q_star"), 1L).otherwise(0L))
          .as("n_served"),
          sum(least(col("d"), col("q_star"))).as("filled"),
          sum("d").as("demand"))
        .select(col("p_brand"), col("n_weeks"), col("q_star"),
          (col("n_served").cast("double") / col("n_weeks").cast("double"))
            .as("cycle_service"),
          (col("filled").cast("double") / col("demand").cast("double"))
            .as("fill_rate"))
        .orderBy("p_brand")
    },
    Some("""WITH bw AS (SELECT p.p_brand,
          CAST(floor(date_diff('day', DATE '1995-01-01',
            CAST(l.l_shipdate AS DATE)) / 7.0) AS BIGINT) AS wk,
          CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(18,2))
            AS BIGINT)) AS BIGINT) AS d
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2),
      qstar AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_weeks,
          CAST(percentile_disc(0.3) WITHIN GROUP (ORDER BY d)
            AS BIGINT) AS q_star
        FROM bw GROUP BY 1)
      SELECT b.p_brand, q.n_weeks, q.q_star,
        CAST(COUNT(*) FILTER (WHERE b.d <= q.q_star) AS DOUBLE) /
          CAST(q.n_weeks AS DOUBLE) AS cycle_service,
        CAST(SUM(LEAST(b.d, q.q_star)) AS DOUBLE) /
          CAST(SUM(b.d) AS DOUBLE) AS fill_rate
      FROM bw b JOIN qstar q ON q.p_brand = b.p_brand
      GROUP BY b.p_brand, q.n_weeks, q.q_star ORDER BY b.p_brand"""),
    covers = Seq("OPS-newsvendor"))

  // ------------------------------------------------- EOQ
  // Economic order quantity per top-20 part: Q* = √(2DK/h) with
  // order cost K = $100 and holding cost h = 20% of unit retail per
  // year — annual demand D and prices exact, the formula one
  // division inside one sqrt. Orders/year and cycle-days ride
  // along; the lot-sizing table next to q483's safety stock.
  private val q485 = QueryDef(
    "q485_eoq_table",
    (s, dir) => {
      val dem = t(s, dir, "lineitem")
        .select(col("l_partkey"),
          col("l_quantity").cast(DecimalType(18, 2)).cast(LongType)
            .as("qty"),
          year(to_date(col("l_shipdate"))).as("yr"))
        .groupBy("l_partkey")
        .agg(sum("qty").as("total_qty"),
          countDistinct("yr").as("n_years"))
      val priced = dem
        .join(t(s, dir, "part").select(col("p_partkey").as("l_partkey"),
          (col("p_retailprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("price_c")), Seq("l_partkey"))
      val top = priced.orderBy(col("total_qty").desc, col("l_partkey"))
        .limit(20)
      top.withColumn("d_annual",
          col("total_qty").cast("double") / col("n_years").cast("double"))
        .withColumn("h_cents",
          lit(0.2) * col("price_c").cast("double"))
        .withColumn("eoq",
          sqrt(lit(2.0) * col("d_annual") * lit(10000.0) /
            col("h_cents")))
        .select(col("l_partkey"), col("total_qty"), col("d_annual"),
          col("eoq"),
          (col("d_annual") / col("eoq")).as("orders_per_year"),
          (lit(365.0) / (col("d_annual") / col("eoq"))).as("cycle_days"))
        .orderBy(col("total_qty").desc, col("l_partkey"))
    },
    Some("""WITH dem AS (SELECT l_partkey,
          CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
            AS BIGINT) AS total_qty,
          CAST(COUNT(DISTINCT year(CAST(l_shipdate AS DATE)))
            AS BIGINT) AS n_years
        FROM lineitem GROUP BY 1),
      priced AS (SELECT d.l_partkey, d.total_qty, d.n_years,
          CAST(CAST(p.p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS price_c
        FROM dem d JOIN part p ON p.p_partkey = d.l_partkey),
      top AS (SELECT * FROM priced
        ORDER BY total_qty DESC, l_partkey LIMIT 20)
      SELECT l_partkey, total_qty,
        CAST(total_qty AS DOUBLE) / CAST(n_years AS DOUBLE) AS d_annual,
        sqrt(2.0 * (CAST(total_qty AS DOUBLE) / CAST(n_years AS DOUBLE))
          * 10000.0 / (0.2 * CAST(price_c AS DOUBLE))) AS eoq,
        (CAST(total_qty AS DOUBLE) / CAST(n_years AS DOUBLE)) /
          sqrt(2.0 * (CAST(total_qty AS DOUBLE) /
            CAST(n_years AS DOUBLE)) * 10000.0 /
            (0.2 * CAST(price_c AS DOUBLE))) AS orders_per_year,
        365.0 / ((CAST(total_qty AS DOUBLE) / CAST(n_years AS DOUBLE)) /
          sqrt(2.0 * (CAST(total_qty AS DOUBLE) /
            CAST(n_years AS DOUBLE)) * 10000.0 /
            (0.2 * CAST(price_c AS DOUBLE)))) AS cycle_days
      FROM top ORDER BY total_qty DESC, l_partkey"""),
    covers = Seq("OPS-eoq"))

  // ------------------------------------------------- pull-forward
  // Does a discount-heavy week borrow demand from the next? Pearson
  // correlation between weekly discount dollars (exact scale-4) and
  // NEXT week's shipped quantity, from exact DECIMAL(38,0)/HUGEINT
  // moment bilinears — plus the mean next-week quantity after
  // top-quartile vs bottom-quartile discount weeks (exact integer
  // ratios). Negative correlation = promotions pull sales forward.
  private val q486 = QueryDef(
    "q486_discount_pull_forward",
    (s, dir) => {
      val wk = t(s, dir, "lineitem")
        .select(
          floor(datediff(to_date(col("l_shipdate")),
            lit("1995-01-01").cast(DateType)) / lit(7.0))
            .cast(LongType).as("wk"),
          ((col("l_extendedprice").cast(DecimalType(18, 2)) *
            col("l_discount").cast(DecimalType(4, 2))) * 10000)
            .cast(LongType).as("disc4"),
          col("l_quantity").cast(DecimalType(18, 2)).cast(LongType)
            .as("qty"))
        .groupBy("wk")
        .agg(sum("disc4").as("disc"), sum("qty").as("q"))
      val w = Window.orderBy("wk")
      val pairs = wk
        .withColumn("wk_next", lead(col("wk"), 1).over(w))
        .withColumn("q_next", lead(col("q"), 1).over(w))
        .filter(col("wk_next") === col("wk") + 1)
        .select(col("wk"), col("disc"), col("q_next"))
        .localCheckpoint()
      def d38(c: Column): Column = c.cast(DecimalType(38, 0))
      val m = pairs.agg(count(lit(1)).as("n"),
        sum("disc").as("sx"), sum("q_next").as("sy"),
        sum(d38(col("disc")) * d38(col("disc"))).as("sxx"),
        sum(d38(col("q_next")) * d38(col("q_next"))).as("syy"),
        sum(d38(col("disc")) * d38(col("q_next"))).as("sxy"))
      val cut = pairs.agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY disc)")
          .cast(LongType).as("p25"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY disc)")
          .cast(LongType).as("p75"))
      val bands = pairs.crossJoin(broadcast(cut))
        .agg(sum(when(col("disc") >= col("p75"), col("q_next"))).as("qh"),
          sum(when(col("disc") >= col("p75"), 1L).otherwise(0L)).as("nh"),
          sum(when(col("disc") <= col("p25"), col("q_next"))).as("ql"),
          sum(when(col("disc") <= col("p25"), 1L).otherwise(0L)).as("nl"))
      m.crossJoin(bands)
        .select(col("n"),
          ((d38(col("n")) * col("sxy") - d38(col("sx")) * d38(col("sy")))
            .cast("double") /
            (sqrt((d38(col("n")) * col("sxx") -
              d38(col("sx")) * d38(col("sx"))).cast("double")) *
             sqrt((d38(col("n")) * col("syy") -
              d38(col("sy")) * d38(col("sy"))).cast("double"))))
            .as("corr_disc_nextq"),
          (col("qh").cast("double") / col("nh").cast("double"))
            .as("mean_nextq_hi_disc"),
          (col("ql").cast("double") / col("nl").cast("double"))
            .as("mean_nextq_lo_disc"))
    },
    Some("""WITH wk AS (SELECT wk, CAST(SUM(disc4) AS BIGINT) AS disc,
          CAST(SUM(qty) AS BIGINT) AS q
        FROM (SELECT
            CAST(floor(date_diff('day', DATE '1995-01-01',
              CAST(l_shipdate AS DATE)) / 7.0) AS BIGINT) AS wk,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
              CAST(l_discount AS DECIMAL(4,2)) * 10000 AS BIGINT)
              AS disc4,
            CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS qty
          FROM lineitem) GROUP BY wk),
      pairs AS (SELECT wk, disc, q_next FROM (SELECT wk, disc,
          lead(wk, 1) OVER (ORDER BY wk) AS wk_next,
          lead(q, 1) OVER (ORDER BY wk) AS q_next
        FROM wk) WHERE wk_next = wk + 1),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(disc) AS BIGINT) AS sx,
          CAST(SUM(q_next) AS BIGINT) AS sy,
          SUM(CAST(disc AS HUGEINT) * disc) AS sxx,
          SUM(CAST(q_next AS HUGEINT) * q_next) AS syy,
          SUM(CAST(disc AS HUGEINT) * q_next) AS sxy
        FROM pairs),
      cut AS (SELECT
          CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY disc)
            AS BIGINT) AS p25,
          CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY disc)
            AS BIGINT) AS p75
        FROM pairs),
      bands AS (SELECT
          CAST(SUM(CASE WHEN p.disc >= c.p75 THEN p.q_next END)
            AS BIGINT) AS qh,
          CAST(COUNT(*) FILTER (WHERE p.disc >= c.p75) AS BIGINT)
            AS nh,
          CAST(SUM(CASE WHEN p.disc <= c.p25 THEN p.q_next END)
            AS BIGINT) AS ql,
          CAST(COUNT(*) FILTER (WHERE p.disc <= c.p25) AS BIGINT)
            AS nl
        FROM pairs p CROSS JOIN cut c)
      SELECT m.n,
        CAST(CAST(m.n AS HUGEINT) * m.sxy -
            CAST(m.sx AS HUGEINT) * m.sy AS DOUBLE) /
          (sqrt(CAST(CAST(m.n AS HUGEINT) * m.sxx -
            CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE)) *
           sqrt(CAST(CAST(m.n AS HUGEINT) * m.syy -
            CAST(m.sy AS HUGEINT) * m.sy AS DOUBLE)))
          AS corr_disc_nextq,
        CAST(b.qh AS DOUBLE) / CAST(b.nh AS DOUBLE)
          AS mean_nextq_hi_disc,
        CAST(b.ql AS DOUBLE) / CAST(b.nl AS DOUBLE)
          AS mean_nextq_lo_disc
      FROM m CROSS JOIN bands b"""),
    covers = Seq("OPS-pull-forward"))

  val all: Seq[QueryDef] = Seq(q482, q483, q484, q485, q486)
}
