package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-51 gate addition (q297): tail expectation (CVaR / expected
  * shortfall).
  */
object Round51Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- CVaR
  // Expected shortfall of daily revenue per year: the mean of the
  // worst ⌈5%⌉ days — the coherent tail-risk measure that answers
  // "how bad is a bad day", where a quantile alone answers "how
  // often". The tail SET is picked by row_number over a total order
  // (revenue, then day — exact DECIMAL compares), its size is the
  // integer ⌈n/20⌉, and both the VaR boundary (the worst kept value)
  // and the tail mean close from exact sums with one division each.
  // Daily grain keeps every year's window single-task at any fact
  // size.
  private val q297 = QueryDef(
    "q297_cvar",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
        .withColumn("yr", year(col("d")).cast("long"))
      val wRank = Window.partitionBy("yr").orderBy(col("rev"), col("d"))
      val wYear = Window.partitionBy("yr")
      daily
        .withColumn("i", row_number().over(wRank).cast("long"))
        .withColumn("n", count(lit(1)).over(wYear))
        .filter(col("i") <= expr("(n + 19) div 20"))
        .groupBy("yr")
        .agg(first(col("n")).as("n_days"),
          count(lit(1)).as("tail_days"),
          max(col("rev")).as("var_boundary"),
          sum(col("rev")).as("tail_sum"))
        .select(col("yr"), col("n_days"), col("tail_days"),
          col("var_boundary").cast("double").as("var_5pct"),
          (col("tail_sum").cast("double") / col("tail_days").cast("double"))
            .as("cvar_5pct"))
        .orderBy("yr")
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
               CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT)
                 AS yr
        FROM orders GROUP BY 1, 3),
      ranked AS (SELECT *,
          CAST(ROW_NUMBER() OVER (PARTITION BY yr ORDER BY rev, d)
            AS BIGINT) AS i,
          CAST(COUNT(*) OVER (PARTITION BY yr) AS BIGINT) AS n
        FROM daily)
      SELECT yr, MIN(n) AS n_days,
        CAST(COUNT(*) AS BIGINT) AS tail_days,
        CAST(MAX(rev) AS DOUBLE) AS var_5pct,
        CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS cvar_5pct
      FROM ranked
      WHERE i <= (n + 19) // 20
      GROUP BY yr ORDER BY yr"""),
    covers = Seq("STAT-cvar"))

  val all: Seq[QueryDef] =
    Seq(q297)
}
