package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-23 gate additions (q233+): the LAST of the 22 TPC-H query
  * shapes — Q1, Q2, Q9, Q11, Q15, Q16, Q20. With these the engine
  * covers the full suite (Q3/5/7/8/10/14/18 in rounds 5-8, Q4/6/12/
  * 13/17/19/21/22 in round 21), i.e. every classical star-schema
  * ad-hoc pattern the reference's analytics layer
  * (`src/transformation/aggregators.py`) draws from.
  *
  * The driver tables carry no `partsupp`; the part↔supplier relation
  * is derived as the DISTINCT (l_partkey, l_suppkey) pairs actually
  * traded, with per-pair cost/quantity aggregates standing in for
  * ps_supplycost / ps_availqty. Join shapes (correlated MIN subquery,
  * scalar-subquery thresholds, NOT IN, double-nested IN) are the
  * TPC-H ones.
  *
  * Determinism rules as everywhere (QueryDef scaladoc): money math in
  * DECIMAL, doubles surfaced through the DuckDB-matching two-step
  * cast when sums are int128-backed (scale 4/6), ONE shared IEEE
  * tree per double, BIGINT casts on counts, total ORDER BY.
  */
object Round23Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** DuckDB casts an int128-backed DECIMAL(38,s) to DOUBLE in two
    * roundings (unscaled→double, then ÷10^s); reproduce it so scale-4
    * sums past 2^53 unscaled still hash-match (COVERAGE.md note).
    */
  private def d4ToDouble(c: Column): Column =
    (c * lit(10000L)).cast(DecimalType(38, 0)).cast("double") / lit(10000.0d)

  /** Scale-6 twin of [[d4ToDouble]] (sum of price·(1−disc)·(1+tax)). */
  private def d6ToDouble(c: Column): Column =
    (c * lit(1000000L)).cast(DecimalType(38, 0)).cast("double") / lit(1000000.0d)

  // ----------------------------------------------------- TPC-H Q1
  // Pricing summary report: the canonical scan-heavy aggregate — one
  // fact pass, 4 decimal sums + 3 averages + a count per
  // (returnflag, linestatus). Everything partial-aggregates map-side
  // into ~6 groups, so at 100 TB the cost is the scan alone. Charge
  // = price·(1−disc)·(1+tax) is kept exact by re-casting the scale-4
  // product to DECIMAL(24,4) before the scale-2 tax factor (30,6 —
  // inside 38); averages are ONE double division from exact sums.
  private val q233 = QueryDef(
    "q233_tpch_q1",
    (s, dir) => {
      val one = lit("1.00").cast(DecimalType(18, 2))
      val discPrice = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
      val charge = discPrice.cast(DecimalType(24, 4)) *
        (one + dec(col("l_tax"))).cast(DecimalType(5, 2))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(dec(col("l_quantity"))).as("__sq"),
          sum(dec(col("l_extendedprice"))).as("__sp"),
          sum(discPrice).as("__sdp"),
          sum(charge).as("__sc"),
          sum(dec(col("l_discount"))).as("__sd"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("__sq").cast("double").as("sum_qty"),
          col("__sp").cast("double").as("sum_base_price"),
          d4ToDouble(col("__sdp")).as("sum_disc_price"),
          d6ToDouble(col("__sc")).as("sum_charge"),
          (col("__sq").cast("double") / col("count_order").cast("double")).as("avg_qty"),
          (col("__sp").cast("double") / col("count_order").cast("double")).as("avg_price"),
          (col("__sd").cast("double") / col("count_order").cast("double")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4)) *
                 CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(5,2))) AS DOUBLE)
          AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS avg_disc,
        CAST(COUNT(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    covers = Seq("A1", "A4"))

  // ----------------------------------------------------- TPC-H Q2
  // Minimum-cost supplier: the correlated-MIN-subquery shape. The
  // part↔supplier relation is the traded (partkey, suppkey) pairs
  // with per-pair MIN price as supply cost; the correlated
  // `cost = (SELECT MIN ... WHERE same part, region suppliers)` is
  // decorrelated into a per-part MIN aggregate re-joined on partkey —
  // one extra fact-keyed exchange instead of a per-row probe. Part
  // and supplier⋈nation⋈region dims broadcast; DECIMAL equality picks
  // the winners exactly.
  private val q234 = QueryDef(
    "q234_tpch_q2",
    (s, dir) => {
      val ps = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(dec(col("l_extendedprice"))).as("ps_cost"))
      val p = t(s, dir, "part")
        .filter(col("p_size") === 15 && col("p_type") === "ECONOMY")
        .select("p_partkey")
      val sn = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select(col("s_suppkey"), col("s_acctbal"), col("s_name"), col("n_name"))
      val offers = ps
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      // min-cost-per-part as a window over offers, not an agg+self-join:
      // the self-join form re-ran the lineitem (partkey, suppkey)
      // aggregate on both sides (measured ~1.5x slower); the window
      // shuffles the already-filtered offers once by part
      offers
        .withColumn("__min_cost", min(col("ps_cost")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("p_partkey")))
        .filter(col("ps_cost") === col("__min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("ps_cost").cast("double").as("supply_cost"))
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"), col("p_partkey"))
    },
    Some("""WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_cost
        FROM lineitem GROUP BY 1, 2),
      eu AS (
        SELECT s_suppkey, s_acctbal, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE')
      SELECT s_acctbal, s_name, n_name, p_partkey,
             CAST(ps_cost AS DOUBLE) AS supply_cost
      FROM part, ps, eu
      WHERE p_partkey = ps_partkey AND ps_suppkey = s_suppkey
        AND p_size = 15 AND p_type = 'ECONOMY'
        AND ps_cost = (SELECT MIN(ps2.ps_cost) FROM ps ps2, eu eu2
                       WHERE ps2.ps_partkey = p_partkey
                         AND ps2.ps_suppkey = eu2.s_suppkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey"""),
    covers = Seq("C2", "J1"))

  // ----------------------------------------------------- TPC-H Q9
  // Product-type profit: profit per (nation, order year) over the
  // parts matching a name word, amount = price·(1−disc) − cost·qty
  // (cost stands in via p_retailprice — no partsupp). Part and
  // supplier→nation broadcast onto the fact; the single data-sized
  // exchange is lineitem⋈orders on orderkey. Both products are
  // scale-4 DECIMAL so the sum is exact; surfaced via the two-step
  // cast.
  private val q235 = QueryDef(
    "q235_tpch_q9",
    (s, dir) => {
      val one = lit("1.00").cast(DecimalType(18, 2))
      val p = t(s, dir, "part")
        .filter(col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
      val sn = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"))
      val amount = dec(col("l_extendedprice")) * (one - dec(col("l_discount"))) -
        dec(col("p_retailprice")) * dec(col("l_quantity"))
      t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sum(amount).as("__profit"))
        .select(col("n_name"), col("o_year"),
          d4ToDouble(col("__profit")).as("sum_profit"))
        .orderBy(col("n_name"), desc("o_year"))
    },
    Some("""SELECT n_name, o_year, CAST(sum_profit AS DOUBLE) AS sum_profit
      FROM (
        SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS o_year,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2))) -
                   CAST(p_retailprice AS DECIMAL(18,2)) *
                     CAST(l_quantity AS DECIMAL(18,2))) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2)
      ORDER BY n_name, o_year DESC"""),
    covers = Seq("A1", "J1"))

  // ----------------------------------------------------- TPC-H Q11
  // Important stock: per-part traded value among one nation's
  // suppliers, kept where value exceeds 2× the average per-part
  // value — the scalar-subquery-threshold shape, with TPC-H's
  // `> FRACTION·total` cut made scale-invariant (the original 1/1000
  // empties as the part universe grows with SF). The (count, total)
  // stats are a one-row broadcast; the threshold compare
  // cross-multiplies in DECIMAL (value·n_parts > 2·total) so no
  // float boundary decides membership.
  private val q236 = QueryDef(
    "q236_tpch_q11",
    (s, dir) => {
      val supp = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_7")
        .select("s_suppkey")
      val f = t(s, dir, "lineitem")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .select(col("l_partkey"), dec(col("l_extendedprice")).as("__price"))
      val perPart = f.groupBy("l_partkey").agg(sum(col("__price")).as("__value"))
      val stats = perPart.agg(count(lit(1)).as("__n"), sum(col("__value")).as("__total"))
      perPart.join(broadcast(stats))
        .filter(col("__value") * col("__n") > col("__total") * lit(2))
        .select(col("l_partkey"), col("__value").cast("double").as("value"))
        .orderBy(desc("value"), col("l_partkey"))
    },
    Some("""WITH f AS (
        SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        FROM lineitem
        WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                            JOIN nation ON s_nationkey = n_nationkey
                            WHERE n_name = 'NATION_7')),
      g AS (SELECT l_partkey, SUM(price) AS value FROM f GROUP BY l_partkey)
      SELECT l_partkey, CAST(value AS DOUBLE) AS value FROM g
      WHERE value * (SELECT COUNT(*) FROM g) > 2 * (SELECT SUM(value) FROM g)
      ORDER BY value DESC, l_partkey"""),
    covers = Seq("C2", "A1"))

  // ----------------------------------------------------- TPC-H Q15
  // Top supplier: one quarter's revenue per supplier (scale-4 DECIMAL
  // sum), then the supplier(s) achieving the global maximum — the
  // revenue-view + scalar-MAX shape. The max is a one-row broadcast
  // and the tie-safe equality is DECIMAL-exact (the float version
  // could drop or double the winner). Supplier dim broadcasts onto
  // the one aggregated exchange.
  private val q237 = QueryDef(
    "q237_tpch_q15",
    (s, dir) => {
      val one = lit("1.00").cast(DecimalType(18, 2))
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
          .as("__rev"))
      val maxRev = rev.agg(max(col("__rev")).as("__max_rev"))
      rev.join(broadcast(maxRev), col("__rev") === col("__max_rev"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          d4ToDouble(col("__rev")).as("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      ORDER BY s_suppkey"""),
    covers = Seq("C2", "A1"))

  // ----------------------------------------------------- TPC-H Q16
  // Parts/supplier relationship: how many distinct suppliers trade
  // each surviving (brand, type, size) combination, excluding
  // flagged suppliers — the NOT-IN + COUNT DISTINCT shape. The
  // distinct traded pairs are one fact exchange; the part filter
  // broadcasts; the NOT IN becomes a broadcast anti-join (the
  // excluded-supplier set is dim-sized).
  private val q238 = QueryDef(
    "q238_tpch_q16",
    (s, dir) => {
      val sizes = Seq(1, 4, 7, 10, 13, 16, 19, 22).map(lit(_))
      val p = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#2" && col("p_type") =!= "SMALL" &&
          col("p_size").isin(sizes: _*))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
        CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
            FROM lineitem) ps
      JOIN part ON p_partkey = ps_partkey
      WHERE p_brand <> 'Brand#2' AND p_type <> 'SMALL'
        AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),
    covers = Seq("A3", "J3"))

  // ----------------------------------------------------- TPC-H Q20
  // Potential part promotion: one nation's suppliers for whom some
  // 'small%'-named part's 1997 shipments exceed half that pair's
  // all-time quantity (recency-majority pairs — the ps_availqty
  // stand-in keeps the correlated-HAVING shape). Double-nested IN:
  // part-name filter broadcasts into the pair aggregate, the
  // qualifying pair set semi-joins the nation-filtered supplier dim.
  // The 2·q97 > qtotal compare is DECIMAL cross-multiplication.
  private val q239 = QueryDef(
    "q239_tpch_q20",
    (s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_name").like("small%")).select("p_partkey")
      val pairs = t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(
          sum(when(year(col("l_shipdate")) === 1997, dec(col("l_quantity")))
            .otherwise(lit("0.00").cast(DecimalType(18, 2)))).as("__q97"),
          sum(dec(col("l_quantity"))).as("__qall"))
        .filter(col("__q97") * lit(2) > col("__qall"))
        .select("l_suppkey").distinct()
      t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_3")
        .join(pairs, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
        AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'small%')
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1997
                          THEN CAST(l_quantity AS DECIMAL(18,2))
                          ELSE CAST(0 AS DECIMAL(18,2)) END) * 2
               > SUM(CAST(l_quantity AS DECIMAL(18,2))))
      ORDER BY s_suppkey"""),
    covers = Seq("J3", "A1"))

  val all: Seq[QueryDef] =
    Seq(q233, q234, q235, q236, q237, q238, q239)
}
