package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-29 gate additions (q253+): cumulative-extreme and
  * non-associative-scan shapes — running-peak drawdown and a
  * floor-capped running balance (the classic fold that NO window
  * frame expresses, because the cap makes the recurrence
  * non-associative).
  */
object Round29Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ------------------------------------------------- max drawdown
  // Largest drop from the running peak of daily revenue, per year:
  // dd_d = max_{≤d}(rev) − rev_d over an unbounded-preceding running
  // MAX window, then the year's worst drawdown with its FIRST
  // achieving day (exact-decimal equality picks the days; min(day)
  // totalizes ties). Everything is DECIMAL until the final double
  // surface. The unpartitioned-looking window is per-day aggregates —
  // thousands of rows at any corpus scale (the q07 pattern).
  private val q253 = QueryDef(
    "q253_max_drawdown",
    (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("d"))
        .agg(sum(dec(col("l_extendedprice"))).cast(DecimalType(18, 2)).as("rev"))
        .withColumn("yr", year(col("d")).cast("long"))
      val runPeak = Window.partitionBy("yr").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withDd = daily
        .withColumn("dd", (max(col("rev")).over(runPeak) - col("rev"))
          .cast(DecimalType(18, 2)))
      val worst = withDd.groupBy("yr").agg(max(col("dd")).as("max_dd"))
      withDd.join(worst, Seq("yr"))
        .filter(col("dd") === col("max_dd"))
        .groupBy(col("yr"), col("max_dd"))
        .agg(min(col("d")).as("worst_day"))
        .select(col("yr"), col("max_dd").cast("double").as("max_drawdown"),
          col("worst_day"))
        .orderBy("yr")
    },
    Some("""WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                 AS rev
        FROM lineitem GROUP BY 1),
      w AS (
        SELECT d, CAST(EXTRACT(YEAR FROM d) AS BIGINT) AS yr,
          CAST(MAX(rev) OVER (PARTITION BY EXTRACT(YEAR FROM d) ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - rev
            AS DECIMAL(18,2)) AS dd
        FROM daily),
      worst AS (SELECT yr, MAX(dd) AS max_dd FROM w GROUP BY yr)
      SELECT w.yr, CAST(worst.max_dd AS DOUBLE) AS max_drawdown,
             MIN(w.d) AS worst_day
      FROM w JOIN worst ON w.yr = worst.yr AND w.dd = worst.max_dd
      GROUP BY w.yr, worst.max_dd
      ORDER BY w.yr"""),
    covers = Seq("W-drawdown"))

  // ------------------------------------------------- capped running sum
  // Floor-at-zero running balance per user: bal_t = max(0, bal_{t-1}
  // + Δ_t). The cap makes the recurrence NON-associative, so no
  // window frame or prefix sum computes it — it is a sequential fold,
  // expressed in-row: collect each user's deltas, comparator-sort by
  // (ts, event_id) so any collect permutation folds identically, and
  // `aggregate` runs the recurrence left to right in exact DECIMAL.
  // The oracle folds the same list with DuckDB's list_reduce over an
  // ORDER BY'd list — two different fold mechanisms, one pinned
  // answer. Per-key state is that key's OWN event list: at 100 TB the
  // fold shards perfectly by user and never shuffles twice.
  private val q254 = QueryDef(
    "q254_capped_running_sum",
    (s, dir) => {
      val zero = lit("0.00").cast(DecimalType(18, 2))
      val sorted = array_sort(
        col("steps"),
        (l, r) => when(l.getField("t") < r.getField("t"), -1)
          .when(l.getField("t") > r.getField("t"), 1)
          .otherwise(l.getField("id") - r.getField("id")).cast("int"))
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(collect_list(struct(
          unix_micros(col("ts")).as("t"),
          col("event_id").as("id"),
          (dec(col("value")) - lit(250)).as("delta"))).as("steps"))
        .select(col("user_id"), size(col("steps")).as("n_events"),
          aggregate(
            transform(sorted, x => x.getField("delta")),
            zero,
            (acc, x) => greatest(acc + x, zero).cast(DecimalType(18, 2)))
            .cast("double").as("final_balance"))
        .orderBy("user_id")
    },
    Some("""WITH s AS (
        SELECT user_id,
               list(CAST(CAST(value AS DECIMAL(18,2)) - 250 AS DECIMAL(18,2))
                    ORDER BY ts, event_id) AS deltas
        FROM events GROUP BY user_id)
      SELECT user_id,
        CAST(len(deltas) AS INTEGER) AS n_events,
        CAST(list_reduce(
          list_prepend(CAST(0 AS DECIMAL(18,2)), deltas),
          (acc, x) -> CAST(greatest(acc + x, CAST(0 AS DECIMAL(18,2)))
                           AS DECIMAL(18,2))) AS DOUBLE) AS final_balance
      FROM s ORDER BY user_id"""),
    covers = Seq("F-capped-scan"))

  val all: Seq[QueryDef] =
    Seq(q253, q254)
}
