package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-21 gate additions (q220+): the remainder of the TPC-H join
  * shapes (Q4, Q6, Q12, Q13, Q17, Q19, Q21, Q22), adapted to the
  * driver tables' columns — the reference's analytics layer
  * (`src/transformation/aggregators.py`) is a subset of these shapes
  * (EXISTS probes, conditional aggregation, scalar subqueries), so
  * completing the suite proves the engine covers every classical
  * ad-hoc star-schema pattern, not just the six the reference ships.
  *
  * Missing TPC-H columns are substituted semantics-preserving:
  * l_commitdate/l_receiptdate → ship-after-order lateness
  * (l_shipdate vs o_orderdate), l_shipmode → a derived delay bucket,
  * c_phone country codes → `c_custkey % 7`. Plan shapes (semi/anti
  * joins, correlated aggregates, residual OR predicates, broadcast
  * dims) are the TPC-H ones.
  *
  * Determinism rules as everywhere (QueryDef scaladoc): money math in
  * DECIMAL(18,2), doubles only from ONE shared IEEE tree, BIGINT
  * casts on the DuckDB side, total ORDER BY.
  */
object Round21Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ----------------------------------------------------- TPC-H Q4
  // Order-priority checking: per-priority counts of one quarter's
  // orders having at least one LATE line (shipped after the order
  // date — the commit/receipt lateness analog). The EXISTS with a
  // cross-side comparison is decorrelated into an aggregate:
  // `∃ line: l_shipdate > o_orderdate` ⟺ `max(l_shipdate) >
  // o_orderdate`, so the fact collapses to one (orderkey, max) row
  // via a map-side-combined aggregate and the quarter-filtered orders
  // broadcast onto it. A direct LEFT SEMI here would put the FACT on
  // the build side (orders is the smaller, filtered side) — the plan
  // that dies at 100 TB; this shape shuffles lineitem once, joins
  // without any fact-sized broadcast, and the shipdate lower bound
  // (implied by the quarter filter) is pushed into the fact scan.
  private val q220 = QueryDef(
    "q220_tpch_q4",
    (s, dir) => {
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1997-07-01").cast("timestamp")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val lastShip = t(s, dir, "lineitem")
        // any line late for a quarter order ships after the quarter
        // start — a pushable pre-filter that shrinks the aggregate
        .filter(col("l_shipdate") > lo)
        .groupBy(col("l_orderkey"))
        .agg(max(col("l_shipdate")).as("last_ship"))
      lastShip
        .join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .filter(col("last_ship") > col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1997-07-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    covers = Seq("J3", "A1"))

  // ----------------------------------------------------- TPC-H Q6
  // Forecasting-revenue change: the purest pushdown showcase — a
  // single fact scan whose THREE predicates (ship year, discount
  // band, quantity cap) all reach the parquet reader as pushed
  // filters, then one global DECIMAL sum. No join, no shuffle beyond
  // the final single-row reduce; at 100 TB this is bounded by scan
  // bandwidth alone, with row-group min/max stats skipping most of
  // the year range. Discounts are 2-decimal, so the band compare is
  // exact in DECIMAL.
  private val q221 = QueryDef(
    "q221_tpch_q6",
    (s, dir) => {
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1998-01-01").cast("timestamp")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
          dec(col("l_discount")) >= lit("0.05").cast(DecimalType(18, 2)) &&
          dec(col("l_discount")) <= lit("0.07").cast(DecimalType(18, 2)) &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"))
        .select(col("revenue"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""),
    covers = Seq("A7"))

  // ----------------------------------------------------- TPC-H Q12
  // Shipping-delay priority mix (shipmode → delay-bucket adaptation):
  // one lineitem⋈orders equi-join, lines bucketed by ship delay
  // (early / within-60d / slow), per-bucket counts of critical
  // (URGENT/HIGH) vs other order priorities — TPC-H Q12's
  // conditional-count-over-join, with the bucket CASE evaluated
  // per-row inside the join projection. Integer day arithmetic only.
  private val q222 = QueryDef(
    "q222_tpch_q12",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_shipdate")
      val delay = datediff(col("l_shipdate"), col("o_orderdate"))
      val crit = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(
          when(delay < 0, "early").when(delay <= 60, "normal")
            .otherwise("slow").as("delay_bucket"),
          when(crit, 1L).otherwise(0L).as("is_crit"))
        .groupBy("delay_bucket")
        .agg(
          sum(col("is_crit")).as("high_line_count"),
          sum(lit(1L) - col("is_crit")).as("low_line_count"))
        .orderBy("delay_bucket")
    },
    Some("""SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 0 THEN 'early'
                 WHEN datediff('day', o_orderdate, l_shipdate) <= 60 THEN 'normal'
                 ELSE 'slow' END AS delay_bucket,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1 ORDER BY delay_bucket"""),
    covers = Seq("A2", "J1"))

  // ----------------------------------------------------- TPC-H Q13
  // Customer order-count distribution INCLUDING zeros: the left outer
  // join that q119 gates row-wise, taken through Q13's double
  // aggregation — orders per customer (zero-order customers kept by
  // the outer join), then customers per order-count. The first
  // group-by is on the join key, so Catalyst plans one exchange for
  // both the join and the count; the second aggregate is tiny.
  private val q223 = QueryDef(
    "q223_tpch_q13",
    (s, dir) => {
      val c = t(s, dir, "customer").select("c_custkey")
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select("o_orderkey", "o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },
    Some("""SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey)
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),
    covers = Seq("J1", "A1"))

  // ----------------------------------------------------- TPC-H Q17
  // Small-quantity-order revenue: the correlated per-part average
  // (l_quantity < 0.2·avg over the same part) evaluated WITHOUT a
  // division — `5·n·qty < sum` over exact DECIMAL sums is the same
  // predicate with integer-exact arithmetic, so the boundary rows
  // cannot flip on float rounding. Shape: the brand filter broadcasts
  // onto the fact FIRST, and the per-part aggregate runs over that
  // filtered fact — the correlated average is only ever consulted for
  // parts that survive the filter (1/25 of brands), so the group-by
  // touches ~4% of lineitem instead of all of it. The oracle's
  // subquery aggregates the full table, but the join restricts it to
  // the same parts with identical per-group values, so the results
  // coincide while the engine's plan is the one that survives 100 TB.
  private val q224 = QueryDef(
    "q224_tpch_q17",
    (s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#23")
        .select("p_partkey")
      val l = t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      // one broadcast brand-filtered fact frame feeds BOTH the
      // per-part aggregate and the probe side
      val lp = l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val perPart = lp.groupBy(col("l_partkey").as("a_partkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty_sum"),
          count(lit(1)).as("qty_n"))
      lp.join(perPart, col("l_partkey") === col("a_partkey"))
        .filter(dec(col("l_quantity")) * lit(5) * col("qty_n") < col("qty_sum"))
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / lit(7.0d))
          .as("avg_yearly"))
        .select(col("avg_yearly"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7
          AS avg_yearly
      FROM lineitem JOIN part ON l_partkey = p_partkey
      JOIN (SELECT l_partkey AS a_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
                   CAST(COUNT(*) AS BIGINT) AS qty_n
            FROM lineitem GROUP BY l_partkey) ON l_partkey = a_partkey
      WHERE p_brand = 'Brand#23'
        AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * qty_n < qty_sum"""),
    covers = Seq("C2", "A4"))

  // ----------------------------------------------------- TPC-H Q19
  // Disjunctive brand/size/quantity revenue: the equi-join on
  // p_partkey carries THREE OR-arms as a residual predicate — still a
  // hash join (the equality is extractable), never a nested loop;
  // q191 gates the rewrite for the no-equality case. Each arm pairs a
  // brand with a size range and a quantity band, as in the original.
  private val q225 = QueryDef(
    "q225_tpch_q19",
    (s, dir) => {
      val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      val l = t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val arm1 = col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 15) && col("l_quantity").between(1, 11)
      val arm2 = col("p_brand") === "Brand#23" &&
        col("p_size").between(1, 25) && col("l_quantity").between(10, 20)
      val arm3 = col("p_brand") === "Brand#34" &&
        col("p_size").between(1, 35) && col("l_quantity").between(20, 30)
      l.join(broadcast(p),
          col("l_partkey") === col("p_partkey") && (arm1 || arm2 || arm3))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .select(col("revenue"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
             AND l_quantity BETWEEN 20 AND 30)"""),
    covers = Seq("J1", "A7"))

  // ----------------------------------------------------- TPC-H Q21
  // Suppliers who kept orders waiting: for finished orders, the
  // suppliers that were the SOLE late supplier in a multi-supplier
  // order. The classical form is EXISTS + NOT-EXISTS self-joins of
  // lineitem (the oracle runs exactly that); the engine computes the
  // same set with per-(order, supplier) then per-order aggregates —
  // distinct suppliers, distinct late suppliers, the unique late
  // supplier (min over the late side), and the number of late LINES
  // (Q21's numwait counts l1 rows, so an order contributes once per
  // late line) — then filters n_late=1 AND n_supp>1. Replacing two
  // correlated fact self-joins with one reduce is the 100 TB-safe
  // plan: lineitem is scanned once and shuffled once. The two-level
  // aggregate (pairs, then orders) replaces the earlier single
  // distinct-aggregate form, whose two countDistincts planned an
  // Expand ×3 of the joined fact ahead of the shuffle; the per-pair
  // partial aggregate map-side combines to unique (order, supplier)
  // pairs instead, and the second aggregate is pair-sized.
  private val q226 = QueryDef(
    "q226_tpch_q21",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_name")
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")
      val perPair = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "l_suppkey")
        .agg(sum(when(late, 1L).otherwise(0L)).as("late_lines"))
      val lateSupp = col("late_lines") > 0
      val perOrder = perPair
        .groupBy("o_orderkey")
        .agg(
          count(lit(1)).as("n_supp"),
          sum(when(lateSupp, 1L).otherwise(0L)).as("n_late"),
          min(when(lateSupp, col("l_suppkey"))).as("late_supp"),
          sum(col("late_lines")).as("n_late_lines"))
        .filter(col("n_late") === 1 && col("n_supp") > 1)
      perOrder
        .groupBy("late_supp")
        .agg(sum(col("n_late_lines")).as("numwait"))
        .join(broadcast(sup), col("late_supp") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(20)
    },
    Some("""SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""),
    covers = Seq("J3", "A4"))

  // ----------------------------------------------------- TPC-H Q22
  // Global-sales-opportunity: positive-balance customers above their
  // cohort's average balance with no URGENT orders — scalar subquery
  // (the average, computed once and broadcast) + anti join + group-by
  // "country code" (c_custkey % 7 substitutes the phone prefix; the
  // anti-join side is priority-filtered so qualifying customers exist
  // at every sf). The average is ONE division of exact DECIMAL sums,
  // shared by both engines, so the > boundary is bit-identical.
  private val q227 = QueryDef(
    "q227_tpch_q22",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .filter((col("c_custkey") % 7).isin(1, 3, 5))
        .select((col("c_custkey") % 7).as("cntrycode"),
          col("c_custkey"), dec(col("c_acctbal")).as("bal"))
      val avgBal = c.filter(col("bal") > 0)
        .agg((sum(col("bal")).cast("double") / count(lit(1))).as("__avg"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      c.join(broadcast(avgBal))
        .filter(col("bal").cast("double") > col("__avg"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"),
          sum(col("bal")).cast("double").as("totacctbal"))
        .orderBy("cntrycode")
    },
    Some("""WITH c AS (SELECT c_custkey % 7 AS cntrycode, c_custkey,
                  CAST(c_acctbal AS DECIMAL(18,2)) AS bal
              FROM customer WHERE c_custkey % 7 IN (1, 3, 5)),
        a AS (SELECT CAST(SUM(bal) AS DOUBLE) / CAST(COUNT(*) AS BIGINT)
                  AS avg_bal FROM c WHERE bal > 0)
      SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
        CAST(SUM(bal) AS DOUBLE) AS totacctbal
      FROM c, a
      WHERE CAST(bal AS DOUBLE) > avg_bal
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
      GROUP BY cntrycode ORDER BY cntrycode"""),
    covers = Seq("C2", "J3"))

  val all: Seq[QueryDef] =
    Seq(q220, q221, q222, q223, q224, q225, q226, q227)
}
