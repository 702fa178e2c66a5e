package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-42 gate additions (q284+): model-evaluation gains tables and
  * fulfillment lead-time percentiles.
  */
object Round42Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- decile lift
  // Gains/lift table — THE model-evaluation artifact for ranked
  // targeting: sort customers by a score (account balance as the
  // stand-in model output), cut into score deciles, and measure how
  // fast the positives (customers with a finalized order) accumulate
  // vs random. Deciles come from NTILE(10) over a TOTAL order
  // (score DESC, custkey); capture and lift close as single divisions
  // of exact long products ((cum_pos·N)/(cum_n·P) — never a ratio of
  // ratios). The label join aggregates orders per customer first, so
  // the fact scan is one map-side-combined pass.
  private val q284 = QueryDef(
    "q284_decile_lift",
    (s, dir) => {
      val labels = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("label"))
      val scored = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"))
        .join(labels, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_acctbal"),
          coalesce(col("label"), lit(0L)).as("label"))
      val dec = scored.withColumn("decile",
        ntile(10).over(Window.orderBy(desc("c_acctbal"), asc("c_custkey")))
          .cast("long"))
      val per = dec.groupBy("decile")
        .agg(count(lit(1)).as("n"), sum(col("label")).as("pos"))
      val wCum = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      per
        .withColumn("cum_n", sum(col("n")).over(wCum))
        .withColumn("cum_pos", sum(col("pos")).over(wCum))
        .withColumn("tot_n", sum(col("n")).over(tot))
        .withColumn("tot_pos", sum(col("pos")).over(tot))
        .select(col("decile"), col("n"), col("pos"),
          (col("cum_pos").cast("double") / col("tot_pos").cast("double"))
            .as("capture"),
          ((col("cum_pos") * col("tot_n")).cast("double") /
            (col("cum_n") * col("tot_pos")).cast("double")).as("lift"))
        .orderBy("decile")
    },
    Some("""WITH labels AS (SELECT o_custkey,
          CAST(MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
            AS label
        FROM orders GROUP BY 1),
      scored AS (SELECT c_custkey, c_acctbal,
          COALESCE(label, 0) AS label
        FROM customer LEFT JOIN labels ON c_custkey = o_custkey),
      dec AS (SELECT *,
          CAST(NTILE(10) OVER (ORDER BY c_acctbal DESC, c_custkey ASC)
            AS BIGINT) AS decile
        FROM scored),
      per AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(label) AS BIGINT) AS pos
        FROM dec GROUP BY 1),
      cum AS (SELECT *,
          CAST(SUM(n) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_n,
          CAST(SUM(pos) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_pos,
          CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
          CAST(SUM(pos) OVER () AS BIGINT) AS tot_pos
        FROM per)
      SELECT decile, n, pos,
        CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) AS capture,
        CAST(cum_pos * tot_n AS DOUBLE) / CAST(cum_n * tot_pos AS DOUBLE)
          AS lift
      FROM cum ORDER BY decile"""),
    covers = Seq("ML-lift"))

  // ------------------------------------------------- lead time
  // Fulfillment latency: days from order placement to each line's
  // ship date, summarized per order priority as exact integer-day
  // percentiles (P50/P90/P99 as the VALUE at rank ⌈q·n⌉ — the
  // percentile_disc definition, a pure rank lookup with no
  // interpolation) plus the exact-ratio mean. One fact-to-fact key
  // join (orders broadcast-side aggregated? no — both fact-sized, so
  // it shuffles on orderkey once), then rank windows per priority.
  private val q285 = QueryDef(
    "q285_lead_time",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority").as("p"),
          to_date(col("o_orderdate")).as("od"))
      val lt = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("p"), datediff(col("sd"), col("od")).cast("long").as("days"),
          col("l_orderkey"))
      val wRank = Window.partitionBy("p").orderBy(col("days"), col("l_orderkey"))
      val wAll = Window.partitionBy("p")
      val ranked = lt
        .withColumn("i", row_number().over(wRank).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("sx", sum(col("days")).over(wAll))
      ranked.groupBy("p")
        .agg(first(col("n")).as("n_lines"),
          max(when(col("i") === expr("(n + 1) div 2"), col("days"))).as("p50"),
          max(when(col("i") === expr("(9 * n + 9) div 10"), col("days")))
            .as("p90"),
          max(when(col("i") === expr("(99 * n + 99) div 100"), col("days")))
            .as("p99"),
          first(col("sx")).as("sx"))
        .select(col("p"), col("n_lines"), col("p50"), col("p90"), col("p99"),
          (col("sx").cast("double") / col("n_lines").cast("double"))
            .as("mean_days"))
        .orderBy("p")
    },
    Some("""WITH lt AS (SELECT o_orderpriority AS p,
          CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE),
            CAST(l_shipdate AS DATE)) AS BIGINT) AS days,
          l_orderkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      ranked AS (SELECT *,
          CAST(ROW_NUMBER() OVER (PARTITION BY p ORDER BY days, l_orderkey)
            AS BIGINT) AS i,
          CAST(COUNT(*) OVER (PARTITION BY p) AS BIGINT) AS n,
          CAST(SUM(days) OVER (PARTITION BY p) AS BIGINT) AS sx
        FROM lt)
      SELECT p, MIN(n) AS n_lines,
        MAX(CASE WHEN i = (n + 1) // 2 THEN days END) AS p50,
        MAX(CASE WHEN i = (9 * n + 9) // 10 THEN days END) AS p90,
        MAX(CASE WHEN i = (99 * n + 99) // 100 THEN days END) AS p99,
        CAST(MIN(sx) AS DOUBLE) / CAST(MIN(n) AS DOUBLE) AS mean_days
      FROM ranked GROUP BY p ORDER BY p"""),
    covers = Seq("A-lead-time"))

  val all: Seq[QueryDef] =
    Seq(q284, q285)
}
