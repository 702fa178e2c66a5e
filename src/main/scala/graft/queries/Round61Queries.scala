package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-61 gate additions (q324–q328): operations analytics —
  * returns, fulfillment progress, line-position effects, sourcing
  * complexity, and calendar-uniformity checks.
  *
  * Determinism: counts are exact longs, money is exact DECIMAL,
  * every surfaced double is a terminal division over exact values.
  */
object Round61Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- returns trend
  // Monthly return rate two ways: by line count and value-weighted
  // (returned revenue / total revenue) — the two diverge when returns
  // skew expensive, which is exactly what the audit looks for. One
  // scan, one month-grain aggregate; rates are divisions of an exact
  // long and two exact DECIMAL(18,4) sums.
  private val q324 = QueryDef(
    "q324_returns_trend",
    (s, dir) => {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      t(s, dir, "lineitem")
        .groupBy(date_trunc("month", to_date(col("l_shipdate")))
          .cast("date").as("month"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returned"),
          sum(rev).as("rev"),
          sum(when(col("l_returnflag") === "R", rev)
            .otherwise(lit(0).cast(DecimalType(18, 4)))).as("rev_returned"))
        .select(col("month"), col("n_lines"), col("n_returned"),
          (col("n_returned").cast("double") / col("n_lines").cast("double"))
            .as("return_rate"),
          (col("rev_returned").cast("double") / col("rev").cast("double"))
            .as("value_return_rate"))
        .orderBy("month")
    },
    Some("""WITH li AS (SELECT
          CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE) AS month,
          l_returnflag,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4)) AS rev
        FROM lineitem),
      g AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n_lines,
          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_returned,
          SUM(rev) AS rev,
          SUM(CASE WHEN l_returnflag = 'R' THEN rev
              ELSE CAST(0 AS DECIMAL(18,4)) END) AS rev_returned
        FROM li GROUP BY month)
      SELECT month, n_lines, n_returned,
        CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE) AS return_rate,
        CAST(rev_returned AS DOUBLE) / CAST(rev AS DOUBLE)
          AS value_return_rate
      FROM g ORDER BY month"""),
    covers = Seq("A-returns-trend"))

  // ------------------------------------------------- fulfillment progress
  // Per order the fraction of lines already finalized (l_linestatus
  // 'F'), bucketed to a progress decile; per order-year the bucket
  // histogram. The per-order ratio is exact (10·f DIV n buckets an
  // integral division), so the two-level aggregate never touches a
  // float until the final share.
  private val q325 = QueryDef(
    "q325_fulfillment_progress",
    (s, dir) => {
      val per = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"),
          year(to_date(col("o_orderdate"))).cast(LongType).as("yr"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("f"))
        .withColumn("bucket", expr("(10 * f) DIV n"))
      val g = per.groupBy("yr", "bucket").agg(count(lit(1)).as("n_orders"))
      val tot = per.groupBy("yr").agg(count(lit(1)).as("t"))
      g.join(tot, Seq("yr"))
        .select(col("yr"), col("bucket"), col("n_orders"),
          (col("n_orders").cast("double") / col("t").cast("double"))
            .as("share"))
        .orderBy("yr", "bucket")
    },
    Some("""WITH per AS (SELECT l_orderkey,
          CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
            AS f
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_orderkey, yr),
      b AS (SELECT yr, (10 * f) // n AS bucket FROM per),
      g AS (SELECT yr, bucket, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM b GROUP BY yr, bucket),
      tot AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS t FROM b GROUP BY yr)
      SELECT yr, bucket, n_orders,
        CAST(n_orders AS DOUBLE) / CAST(t AS DOUBLE) AS share
      FROM g JOIN tot USING (yr)
      ORDER BY yr, bucket"""),
    covers = Seq("A-progress-histogram"))

  // ------------------------------------------------- line-position effect
  // Do later line positions in an order carry smaller quantities?
  // Mean quantity and mean revenue per l_linenumber, each a ratio of
  // exact sums, plus the ratio against position 1 (broadcast scalar
  // join) — a classic position-bias audit with no window at all.
  private val q326 = QueryDef(
    "q326_line_position_effect",
    (s, dir) => {
      val qty = col("l_quantity").cast(DecimalType(18, 2))
      val g = t(s, dir, "lineitem")
        .groupBy(col("l_linenumber").cast(LongType).as("pos"))
        .agg(count(lit(1)).as("n_lines"), sum(qty).as("sq"))
        .withColumn("mean_qty",
          col("sq").cast("double") / col("n_lines").cast("double"))
      val base = g.filter(col("pos") === 1)
        .select(col("sq").as("sq1"), col("n_lines").as("n1"))
      g.crossJoin(broadcast(base))
        .select(col("pos"), col("n_lines"), col("mean_qty"),
          ((col("sq").cast("double") / col("n_lines").cast("double")) /
            (col("sq1").cast("double") / col("n1").cast("double")))
            .as("vs_first"))
        .orderBy("pos")
    },
    Some("""WITH g AS (SELECT CAST(l_linenumber AS BIGINT) AS pos,
          CAST(COUNT(*) AS BIGINT) AS n_lines,
          SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        FROM lineitem GROUP BY pos),
      base AS (SELECT sq AS sq1, n_lines AS n1 FROM g WHERE pos = 1)
      SELECT pos, n_lines,
        CAST(sq AS DOUBLE) / CAST(n_lines AS DOUBLE) AS mean_qty,
        (CAST(sq AS DOUBLE) / CAST(n_lines AS DOUBLE))
          / (CAST(sq1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS vs_first
      FROM g, base
      ORDER BY pos"""),
    covers = Seq("A-position-effect"))

  // ------------------------------------------------- sourcing complexity
  // How many distinct suppliers and supplier nations an order touches:
  // the multi-sourcing histogram (1 supplier, 2, 3+ …) with the share
  // of orders and of revenue in each class — supply-chain coordination
  // cost in one table. Per-order distincts shuffle on the order key
  // once; the histogram is tiny.
  private val q327 = QueryDef(
    "q327_sourcing_complexity",
    (s, dir) => {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      // two-level aggregate: the direct double-countDistinct plans an
      // Expand that triples every fact row; pre-aggregating revenue per
      // (order, supplier) first keeps map-side combine, and nationkey
      // is FUNCTIONALLY DETERMINED by suppkey so the per-supplier frame
      // loses nothing — n_supp becomes a plain count and only the
      // already-shrunk frame pays the one remaining distinct
      // (round 12: the direct double-countDistinct form was re-A/B'd
      // in-session — 2.72 vs 3.09 s, the Expand is still worse — the
      // two-level shape stays)
      val perSupp = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"), col("s_nationkey"))
        .agg(sum(rev).as("rev_s"))
      val per = perSupp
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"),
          countDistinct(col("s_nationkey")).as("n_nations"),
          sum(col("rev_s")).as("rev"))
      val tot = per.agg(count(lit(1)).as("t_orders"), sum(col("rev")).as("t_rev"))
      per.groupBy("n_supp")
        .agg(count(lit(1)).as("n_orders"),
          max(col("n_nations")).as("max_nations"),
          sum(col("rev")).as("class_rev"))
        .crossJoin(broadcast(tot))
        .select(col("n_supp"), col("n_orders"), col("max_nations"),
          (col("n_orders").cast("double") / col("t_orders").cast("double"))
            .as("order_share"),
          (col("class_rev").cast("double") / col("t_rev").cast("double"))
            .as("revenue_share"))
        .orderBy("n_supp")
    },
    Some("""WITH per AS (SELECT l_orderkey,
          CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
          CAST(COUNT(DISTINCT s_nationkey) AS BIGINT) AS n_nations,
          SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4))) AS rev
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY l_orderkey),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_orders,
          SUM(rev) AS t_rev FROM per)
      SELECT n_supp, CAST(COUNT(*) AS BIGINT) AS n_orders,
        MAX(n_nations) AS max_nations,
        CAST(COUNT(*) AS DOUBLE) / CAST(t_orders AS DOUBLE) AS order_share,
        CAST(SUM(rev) AS DOUBLE) / CAST(t_rev AS DOUBLE) AS revenue_share
      FROM per, tot
      GROUP BY n_supp, t_orders, t_rev
      ORDER BY n_supp"""),
    covers = Seq("A-sourcing-complexity"))

  // ------------------------------------------------- day-of-month uniformity
  // Synthetic-data tell / batch-artifact detector: order volume by
  // day-of-month with each day's chi-square contribution against the
  // uniform expectation. Expected counts are exact rationals (total/
  // n_days kept as numerator·denominator integers); the contribution
  // (o·d − t)²/(t·d) is evaluated as one fixed IEEE tree over exact
  // longs — no ln, no rounding.
  private val q328 = QueryDef(
    "q328_dom_uniformity",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(dayofmonth(to_date(col("o_orderdate"))).cast(LongType).as("dom"))
      val g = o.groupBy("dom").agg(count(lit(1)).as("obs"))
      val tot = g.agg(sum(col("obs")).as("t"), count(lit(1)).as("d"))
      g.crossJoin(broadcast(tot))
        .select(col("dom"), col("obs"),
          (col("t").cast("double") / col("d").cast("double")).as("expected"),
          (((col("obs") * col("d") - col("t")) *
            (col("obs") * col("d") - col("t"))).cast("double") /
            (col("t") * col("d")).cast("double")).as("chi2_part"))
        .orderBy("dom")
    },
    Some("""WITH o AS (SELECT
          CAST(EXTRACT(day FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS dom
        FROM orders),
      g AS (SELECT dom, CAST(COUNT(*) AS BIGINT) AS obs FROM o GROUP BY dom),
      tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS t,
          CAST(COUNT(*) AS BIGINT) AS d FROM g)
      SELECT dom, obs,
        CAST(t AS DOUBLE) / CAST(d AS DOUBLE) AS expected,
        CAST((obs * d - t) * (obs * d - t) AS DOUBLE)
          / CAST(t * d AS DOUBLE) AS chi2_part
      FROM g, tot
      ORDER BY dom"""),
    covers = Seq("A-calendar-uniformity"))

  val all: Seq[QueryDef] =
    Seq(q324, q325, q326, q327, q328)
}
