package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-60 gate additions (q319–q323): commerce analytics — supplier
  * churn, reorder cadence, mix shift, price-response correlation, and
  * trade balance.
  *
  * Determinism: set counts and gap sums are exact longs, revenue is
  * exact DECIMAL, correlations come from integer sufficient
  * statistics (the q51/q304 pattern); doubles are terminal
  * divisions/sqrt over those exact values.
  */
object Round60Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- supplier churn
  // Year-over-year supplier retention per nation: of the suppliers
  // who shipped in year y, how many ship again in y+1 (retained),
  // how many vanish (churned), how many are new. Distinct
  // (nation, year, suppkey) activity sets self-join on (nation,
  // suppkey, y+1) — the distinct collapses the fact table before any
  // join, so the join sides are supplier-cardinality, not
  // fact-cardinality.
  private val q319 = QueryDef(
    "q319_supplier_churn",
    (s, dir) => {
      val act = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("nk"),
          year(to_date(col("o_orderdate"))).cast(LongType).as("yr"),
          col("l_suppkey").as("sk"))
        .distinct()
        // materialized once (supplier-cardinality rows): feeds the
        // activity count and BOTH sides of the retention self-join —
        // each re-ran the 3-table fact join + distinct otherwise
        .localCheckpoint()
      val cnt = act.groupBy("nk", "yr").agg(count(lit(1)).as("active"))
      val ret = act.as("a")
        .join(act.as("b"),
          col("a.nk") === col("b.nk") && col("a.sk") === col("b.sk") &&
            col("b.yr") === col("a.yr") + 1)
        .groupBy(col("a.nk").as("nk"), col("a.yr").as("yr"))
        .agg(count(lit(1)).as("retained"))
      val nxt = cnt.select(col("nk"), (col("yr") - 1).as("yr"),
        col("active").as("active_next"))
      cnt.join(nxt, Seq("nk", "yr"))
        .join(ret, Seq("nk", "yr"), "left")
        .withColumn("retained", coalesce(col("retained"), lit(0L)))
        .join(t(s, dir, "nation"), col("nk") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("yr"), col("active"),
          (col("active") - col("retained")).as("churned"),
          (col("active_next") - col("retained")).as("new_next"),
          (col("retained").cast("double") / col("active").cast("double"))
            .as("retention_rate"))
        .orderBy("nation", "yr")
    },
    Some("""WITH act AS (SELECT DISTINCT s_nationkey AS nk,
          CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
          l_suppkey AS sk
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey),
      cnt AS (SELECT nk, yr, CAST(COUNT(*) AS BIGINT) AS active
              FROM act GROUP BY nk, yr),
      ret AS (SELECT a.nk, a.yr, CAST(COUNT(*) AS BIGINT) AS retained
              FROM act a JOIN act b
                ON a.nk = b.nk AND a.sk = b.sk AND b.yr = a.yr + 1
              GROUP BY a.nk, a.yr)
      SELECT n_name AS nation, c.yr, c.active,
        c.active - COALESCE(retained, 0) AS churned,
        nx.active - COALESCE(retained, 0) AS new_next,
        CAST(COALESCE(retained, 0) AS DOUBLE) / CAST(c.active AS DOUBLE)
          AS retention_rate
      FROM cnt c
      JOIN cnt nx ON nx.nk = c.nk AND nx.yr = c.yr + 1
      LEFT JOIN ret r ON r.nk = c.nk AND r.yr = c.yr
      JOIN nation ON c.nk = n_nationkey
      ORDER BY nation, c.yr"""),
    covers = Seq("A-churn"))

  // ------------------------------------------------- reorder cadence
  // Days between consecutive orders per customer (lag over the
  // (o_orderdate, o_orderkey) total order), rolled up to the market
  // segment as a ratio of exact sums — mean inter-order gap and the
  // worst gap, the cadence table a retention model trains on.
  private val q320 = QueryDef(
    "q320_reorder_intervals",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"), col("o_orderkey"))
      val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
      val gaps = o.withColumn("gap",
        datediff(col("d"), lag(col("d"), 1).over(w)).cast(LongType))
        .filter(col("gap").isNotNull)
      gaps.join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gap")).as("total_gap_days"),
          max(col("gap")).as("max_gap_days"))
        .withColumn("mean_gap_days",
          col("total_gap_days").cast("double") / col("n_gaps").cast("double"))
        .orderBy("segment")
    },
    Some("""WITH g AS (SELECT o_custkey,
          CAST(CAST(o_orderdate AS DATE)
            - lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS BIGINT)
            AS gap
        FROM orders)
      SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        CAST(SUM(gap) AS BIGINT) AS total_gap_days,
        MAX(gap) AS max_gap_days,
        CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_gap_days
      FROM g JOIN customer ON o_custkey = c_custkey
      WHERE gap IS NOT NULL
      GROUP BY c_mktsegment
      ORDER BY segment"""),
    covers = Seq("W-reorder-cadence"))

  // ------------------------------------------------- mix shift
  // How the order-priority mix shifted between the first and last
  // year of the data: share of orders per priority in each endpoint
  // year and the percentage-point delta. The endpoint years are
  // data-driven scalars (min/max year) broadcast onto a 2×|priority|
  // aggregate — no hard-coded calendar.
  private val q321 = QueryDef(
    "q321_priority_mix_shift",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderpriority").as("prio"),
        year(to_date(col("o_orderdate"))).cast(LongType).as("yr"))
      val span = o.agg(min(col("yr")).as("y1"), max(col("yr")).as("y2"))
      val counts = o.crossJoin(broadcast(span))
        .filter(col("yr") === col("y1") || col("yr") === col("y2"))
        .groupBy("prio")
        .agg(sum(when(col("yr") === col("y1"), 1L).otherwise(0L)).as("c1"),
          sum(when(col("yr") === col("y2"), 1L).otherwise(0L)).as("c2"))
      val tot = counts.agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
      counts.crossJoin(broadcast(tot))
        .crossJoin(broadcast(span))
        .select(col("prio"), col("y1"), col("y2"), col("c1"), col("c2"),
          (col("c1").cast("double") / col("t1").cast("double")).as("share_first"),
          (col("c2").cast("double") / col("t2").cast("double")).as("share_last"),
          (col("c2").cast("double") / col("t2").cast("double") -
            col("c1").cast("double") / col("t1").cast("double")).as("delta"))
        .orderBy("prio")
    },
    Some("""WITH o AS (SELECT o_orderpriority AS prio,
          CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS yr
        FROM orders),
      span AS (SELECT MIN(yr) AS y1, MAX(yr) AS y2 FROM o),
      counts AS (SELECT prio,
          CAST(SUM(CASE WHEN yr = y1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
          CAST(SUM(CASE WHEN yr = y2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        FROM o, span WHERE yr = y1 OR yr = y2
        GROUP BY prio),
      tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS t1,
          CAST(SUM(c2) AS BIGINT) AS t2 FROM counts)
      SELECT prio, y1, y2, c1, c2,
        CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE) AS share_first,
        CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE) AS share_last,
        CAST(c2 AS DOUBLE) / CAST(t2 AS DOUBLE)
          - CAST(c1 AS DOUBLE) / CAST(t1 AS DOUBLE) AS delta
      FROM counts, tot, span
      ORDER BY prio"""),
    covers = Seq("A-mix-shift"))

  // ------------------------------------------------- price response
  // Does a deeper discount move more units? Pearson correlation of
  // (discount, quantity) per brand from integer sufficient statistics
  // — both measures are 2-decimal, so ×100 fixed-point makes every
  // sum exact; the q304 pattern with the final products in
  // DECIMAL(38,0) for 10¹²-row safety.
  private val q322 = QueryDef(
    "q322_discount_qty_corr",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          (col("l_discount").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("x"),
          (col("l_quantity").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("y"))
      val dec = (c: Column) => c.cast(DecimalType(38, 0))
      val g = li.groupBy("brand")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val num = dec(col("n_lines")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))
      val den1 = dec(col("n_lines")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
      val den2 = dec(col("n_lines")) * dec(col("syy")) - dec(col("sy")) * dec(col("sy"))
      g.withColumn("num", num).withColumn("den1", den1).withColumn("den2", den2)
        .filter(col("den1") > 0 && col("den2") > 0)
        .select(col("brand"), col("n_lines"),
          (col("num").cast("double") /
            (sqrt(col("den1").cast("double")) * sqrt(col("den2").cast("double"))))
            .as("corr"))
        .orderBy("brand")
    },
    Some("""WITH li AS (SELECT p_brand AS brand,
          CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
          CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      g AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(x * y) AS BIGINT) AS sxy,
          CAST(SUM(x * x) AS BIGINT) AS sxx,
          CAST(SUM(y * y) AS BIGINT) AS syy
        FROM li GROUP BY brand),
      f AS (SELECT brand, n_lines,
          CAST(n_lines AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
          CAST(n_lines AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den1,
          CAST(n_lines AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den2
        FROM g)
      SELECT brand, n_lines,
        CAST(num AS DOUBLE)
          / (sqrt(CAST(den1 AS DOUBLE)) * sqrt(CAST(den2 AS DOUBLE))) AS corr
      FROM f WHERE den1 > 0 AND den2 > 0
      ORDER BY brand"""),
    covers = Seq("A-price-response"))

  // ------------------------------------------------- trade balance
  // Per nation: export revenue (its suppliers' shipped lines) vs
  // import revenue (its customers' purchased lines) and the net
  // balance — TPC-H q7's flow matrix folded to a per-nation balance
  // sheet. Both flows are exact DECIMAL(18,4) sums joined full-outer
  // on the nation, dims broadcast onto the fact scans.
  private val q323 = QueryDef(
    "q323_nation_trade_balance",
    (s, dir) => {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      val li = t(s, dir, "lineitem")
      val exp = li
        .join(broadcast(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nk"))
        .agg(sum(rev).as("exports"))
      val imp = li
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(sum(rev).as("imports"))
      exp.join(imp, Seq("nk"), "full_outer")
        .join(broadcast(t(s, dir, "nation")), col("nk") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          coalesce(col("exports"), lit(0).cast(DecimalType(18, 4)))
            .cast("double").as("exports"),
          coalesce(col("imports"), lit(0).cast(DecimalType(18, 4)))
            .cast("double").as("imports"),
          (coalesce(col("exports"), lit(0).cast(DecimalType(18, 4))) -
            coalesce(col("imports"), lit(0).cast(DecimalType(18, 4))))
            .cast("double").as("balance"))
        .orderBy("nation")
    },
    Some("""WITH rev AS (SELECT l_suppkey, l_orderkey,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4)) AS r
        FROM lineitem),
      exp AS (SELECT s_nationkey AS nk, SUM(r) AS exports
              FROM rev JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY s_nationkey),
      imp AS (SELECT c_nationkey AS nk, SUM(r) AS imports
              FROM rev
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              GROUP BY c_nationkey)
      SELECT n_name AS nation,
        CAST(COALESCE(exports, 0) AS DOUBLE) AS exports,
        CAST(COALESCE(imports, 0) AS DOUBLE) AS imports,
        CAST(COALESCE(exports, 0) - COALESCE(imports, 0) AS DOUBLE) AS balance
      FROM exp FULL OUTER JOIN imp USING (nk)
      JOIN nation ON nk = n_nationkey
      ORDER BY nation"""),
    covers = Seq("J-trade-balance"))

  val all: Seq[QueryDef] =
    Seq(q319, q320, q321, q322, q323)
}
