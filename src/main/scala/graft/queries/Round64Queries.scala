package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-64 gate additions (q339–q343): revenue concentration and
  * growth decomposition — Lorenz curve, repeat-rate cohorts,
  * new-product share, calendar effects, and growth rates.
  *
  * Determinism: revenue stays exact DECIMAL until the final share
  * divisions; cohort and calendar classifications are exact integer
  * derivations of dates.
  */
object Round64Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def rev =
    (col("l_extendedprice").cast(DecimalType(18, 2)) *
      (lit(1).cast(DecimalType(18, 2)) -
        col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))

  // ------------------------------------------------- Lorenz curve
  // Revenue concentration as the full curve, not one number (q145's
  // Gini): customers ntile'd into revenue deciles over a unique
  // (revenue, custkey) order, each decile's exact revenue share and
  // the cumulative share — the bottom-decile rows read "the bottom
  // 30% of customers carry X% of revenue".
  private val q339 = QueryDef(
    "q339_lorenz_points",
    (s, dir) => {
      val per = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(rev).as("r"))
      val w = Window.orderBy(col("r"), col("o_custkey"))
      val dec = per.withColumn("decile", ntile(10).over(w).cast(LongType))
      val g = dec.groupBy("decile")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("r")).cast(DecimalType(38, 4)).as("dec_rev"))
      val tot = g.agg(sum(col("dec_rev")).as("t"))
      val wc = Window.orderBy("decile")
      g.crossJoin(broadcast(tot))
        .withColumn("cum_rev",
          sum(col("dec_rev")).over(wc).cast(DecimalType(38, 4)))
        .select(col("decile"), col("n_customers"),
          (col("dec_rev").cast("double") / col("t").cast("double"))
            .as("rev_share"),
          (col("cum_rev").cast("double") / col("t").cast("double"))
            .as("cum_share"))
        .orderBy("decile")
    },
    Some("""WITH per AS (SELECT o_custkey,
          SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4))) AS r
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey),
      d AS (SELECT o_custkey, r,
          CAST(ntile(10) OVER (ORDER BY r, o_custkey) AS BIGINT) AS decile
        FROM per),
      g AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
          CAST(SUM(r) AS DECIMAL(38,4)) AS dec_rev
        FROM d GROUP BY decile),
      tot AS (SELECT CAST(SUM(dec_rev) AS DECIMAL(38,4)) AS t FROM g),
      c AS (SELECT decile, n_customers, dec_rev,
          CAST(SUM(dec_rev) OVER (ORDER BY decile) AS DECIMAL(38,4))
            AS cum_rev
        FROM g)
      SELECT decile, n_customers,
        CAST(dec_rev AS DOUBLE) / CAST(t AS DOUBLE) AS rev_share,
        CAST(cum_rev AS DOUBLE) / CAST(t AS DOUBLE) AS cum_share
      FROM c, tot
      ORDER BY decile"""),
    covers = Seq("STAT-lorenz"))

  // ------------------------------------------------- repeat-rate cohorts
  // Customers cohorted by first-order year: cohort size, repeat rate
  // (≥2 lifetime orders), and mean lifetime orders — did early
  // cohorts stick better? Cohort assignment is a min over the
  // customer's orders; every rate is one exact division.
  private val q340 = QueryDef(
    "q340_repeat_rate_cohort",
    (s, dir) => {
      val per = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(min(year(to_date(col("o_orderdate"))).cast(LongType))
          .as("cohort"),
          count(lit(1)).as("n_orders"))
      per.groupBy("cohort")
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("repeaters"),
          sum(col("n_orders")).as("orders"))
        .select(col("cohort"), col("n_customers"), col("repeaters"),
          (col("repeaters").cast("double") / col("n_customers").cast("double"))
            .as("repeat_rate"),
          (col("orders").cast("double") / col("n_customers").cast("double"))
            .as("mean_orders"))
        .orderBy("cohort")
    },
    Some("""WITH per AS (SELECT o_custkey,
          MIN(CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT))
            AS cohort,
          CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey)
      SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_customers,
        CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
          AS repeaters,
        CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS repeat_rate,
        CAST(SUM(n_orders) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS mean_orders
      FROM per GROUP BY cohort
      ORDER BY cohort"""),
    covers = Seq("A-repeat-cohort"))

  // ------------------------------------------------- new-product share
  // Of each year's revenue, how much comes from parts first sold that
  // same year — the innovation-dependence ratio. Part birth year is a
  // min over the part's lines (one aggregate at part cardinality,
  // broadcast back); the share is exact DECIMAL over DECIMAL.
  private val q341 = QueryDef(
    "q341_new_product_share",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), rev.as("r"),
          year(to_date(col("l_shipdate"))).cast(LongType).as("yr"))
      val birth = li.groupBy("l_partkey").agg(min(col("yr")).as("birth"))
      li.join(broadcast(birth), Seq("l_partkey"))
        .groupBy("yr")
        .agg(sum(col("r")).cast(DecimalType(38, 4)).as("total_rev"),
          sum(when(col("birth") === col("yr"), col("r"))
            .otherwise(lit(0).cast(DecimalType(18, 4))))
            .cast(DecimalType(38, 4)).as("new_rev"),
          countDistinct(when(col("birth") === col("yr"), col("l_partkey")))
            .as("n_new_parts"))
        .select(col("yr"), col("n_new_parts"),
          col("total_rev").cast("double").as("total_rev"),
          col("new_rev").cast("double").as("new_rev"),
          (col("new_rev").cast("double") / col("total_rev").cast("double"))
            .as("new_share"))
        .orderBy("yr")
    },
    Some("""WITH li AS (SELECT l_partkey,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4)) AS r,
          CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS BIGINT) AS yr
        FROM lineitem),
      birth AS (SELECT l_partkey, MIN(yr) AS birth FROM li
                GROUP BY l_partkey),
      g AS (SELECT yr,
          CAST(SUM(r) AS DECIMAL(38,4)) AS total_rev,
          CAST(SUM(CASE WHEN birth = yr THEN r
              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(38,4)) AS new_rev,
          CAST(COUNT(DISTINCT CASE WHEN birth = yr THEN l_partkey END)
            AS BIGINT) AS n_new_parts
        FROM li JOIN birth USING (l_partkey)
        GROUP BY yr)
      SELECT yr, n_new_parts,
        CAST(total_rev AS DOUBLE) AS total_rev,
        CAST(new_rev AS DOUBLE) AS new_rev,
        CAST(new_rev AS DOUBLE) / CAST(total_rev AS DOUBLE) AS new_share
      FROM g ORDER BY yr"""),
    covers = Seq("A-new-product"))

  // ------------------------------------------------- weekend effect
  // Weekend vs weekday order economics per customer nation: order
  // counts, mean order value for each regime, and the weekend/weekday
  // value ratio — exact DECIMAL totals, three terminal divisions.
  private val q342 = QueryDef(
    "q342_weekend_effect",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("v"),
          (dayofweek(to_date(col("o_orderdate"))).isin(1, 7)).as("wkend"))
      o.groupBy("nation")
        .agg(sum(when(col("wkend"), 1L).otherwise(0L)).as("we_orders"),
          sum(when(!col("wkend"), 1L).otherwise(0L)).as("wd_orders"),
          sum(when(col("wkend"), col("v"))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).as("we_rev"),
          sum(when(!col("wkend"), col("v"))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).as("wd_rev"))
        .filter(col("we_orders") > 0 && col("wd_orders") > 0)
        .select(col("nation"), col("we_orders"), col("wd_orders"),
          (col("we_rev").cast("double") / col("we_orders").cast("double"))
            .as("we_mean"),
          (col("wd_rev").cast("double") / col("wd_orders").cast("double"))
            .as("wd_mean"),
          ((col("we_rev").cast("double") / col("we_orders").cast("double")) /
            (col("wd_rev").cast("double") / col("wd_orders").cast("double")))
            .as("weekend_lift"))
        .orderBy("nation")
    },
    Some("""WITH o AS (SELECT n_name AS nation,
          CAST(o_totalprice AS DECIMAL(18,2)) AS v,
          dayofweek(CAST(o_orderdate AS DATE)) IN (0, 6) AS wkend
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey),
      g AS (SELECT nation,
          CAST(SUM(CASE WHEN wkend THEN 1 ELSE 0 END) AS BIGINT) AS we_orders,
          CAST(SUM(CASE WHEN NOT wkend THEN 1 ELSE 0 END) AS BIGINT)
            AS wd_orders,
          SUM(CASE WHEN wkend THEN v ELSE CAST(0 AS DECIMAL(18,2)) END)
            AS we_rev,
          SUM(CASE WHEN NOT wkend THEN v ELSE CAST(0 AS DECIMAL(18,2)) END)
            AS wd_rev
        FROM o GROUP BY nation)
      SELECT nation, we_orders, wd_orders,
        CAST(we_rev AS DOUBLE) / CAST(we_orders AS DOUBLE) AS we_mean,
        CAST(wd_rev AS DOUBLE) / CAST(wd_orders AS DOUBLE) AS wd_mean,
        (CAST(we_rev AS DOUBLE) / CAST(we_orders AS DOUBLE))
          / (CAST(wd_rev AS DOUBLE) / CAST(wd_orders AS DOUBLE))
          AS weekend_lift
      FROM g WHERE we_orders > 0 AND wd_orders > 0
      ORDER BY nation"""),
    covers = Seq("A-weekend-effect"))

  // ------------------------------------------------- nation growth
  // Revenue growth per supplier nation between the first and last
  // full data year: exact DECIMAL endpoint revenues and the linear
  // growth rate (last−first)/first — no CAGR (pow() ULP-diverges
  // across libm, like ln in q52).
  private val q343 = QueryDef(
    "q343_nation_growth",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), rev.as("r"),
          year(to_date(col("l_shipdate"))).cast(LongType).as("yr"))
      val span = li.agg(min(col("yr")).as("y1"), max(col("yr")).as("y2"))
      li.crossJoin(broadcast(span))
        .filter(col("yr") === col("y1") || col("yr") === col("y2"))
        .groupBy("nation")
        .agg(first(col("y1")).as("y_first"), first(col("y2")).as("y_last"),
          sum(when(col("yr") === col("y1"), col("r"))
            .otherwise(lit(0).cast(DecimalType(18, 4))))
            .cast(DecimalType(38, 4)).as("rev_first"),
          sum(when(col("yr") === col("y2"), col("r"))
            .otherwise(lit(0).cast(DecimalType(18, 4))))
            .cast(DecimalType(38, 4)).as("rev_last"))
        .filter(col("rev_first") > 0)
        .select(col("nation"), col("y_first"), col("y_last"),
          col("rev_first").cast("double").as("rev_first"),
          col("rev_last").cast("double").as("rev_last"),
          ((col("rev_last") - col("rev_first")).cast("double") /
            col("rev_first").cast("double")).as("growth"))
        .orderBy("nation")
    },
    Some("""WITH li AS (SELECT n_name AS nation,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4)) AS r,
          CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS BIGINT) AS yr
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey),
      span AS (SELECT MIN(yr) AS y1, MAX(yr) AS y2 FROM li),
      g AS (SELECT nation, MIN(y1) AS y_first, MIN(y2) AS y_last,
          CAST(SUM(CASE WHEN yr = y1 THEN r ELSE CAST(0 AS DECIMAL(18,4))
            END) AS DECIMAL(38,4)) AS rev_first,
          CAST(SUM(CASE WHEN yr = y2 THEN r ELSE CAST(0 AS DECIMAL(18,4))
            END) AS DECIMAL(38,4)) AS rev_last
        FROM li, span WHERE yr = y1 OR yr = y2
        GROUP BY nation)
      SELECT nation, y_first, y_last,
        CAST(rev_first AS DOUBLE) AS rev_first,
        CAST(rev_last AS DOUBLE) AS rev_last,
        CAST(rev_last - rev_first AS DOUBLE) / CAST(rev_first AS DOUBLE)
          AS growth
      FROM g WHERE rev_first > 0
      ORDER BY nation"""),
    covers = Seq("A-growth"))

  val all: Seq[QueryDef] =
    Seq(q339, q340, q341, q342, q343)
}
