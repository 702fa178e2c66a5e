package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-48 gate addition (q294): multi-column and multi-aggregate
  * DISTINCT counting in one pass.
  */
object Round48Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- multi distinct
  // Three DIFFERENT distinct aggregates in one GROUP BY — distinct
  // customers, distinct order days, and distinct (customer, day)
  // pairs per priority. Catalyst plans this as ONE scan with an
  // Expand (row replicated per distinct group) feeding hash
  // aggregates — the single-pass shape whose demotion to
  // SortAggregate q88 had to engineer around, pinned here against
  // DuckDB's tuple-DISTINCT semantics (NULL-free columns, so tuple
  // and multi-arg distinct agree). The pair count also yields the
  // average orders a customer places per active day as one exact
  // division.
  private val q294 = QueryDef(
    "q294_multi_distinct",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority").as("p"), col("o_custkey"),
          to_date(col("o_orderdate")).as("d"))
      o.groupBy("p")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_custs"),
          countDistinct(col("d")).as("n_days"),
          countDistinct(col("o_custkey"), col("d")).as("n_cust_days"))
        .select(col("p"), col("n_orders"), col("n_custs"), col("n_days"),
          col("n_cust_days"),
          (col("n_orders").cast("double") / col("n_cust_days").cast("double"))
            .as("orders_per_cust_day"))
        .orderBy("p")
    },
    Some("""SELECT o_orderpriority AS p,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
        CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS n_days,
        CAST(COUNT(DISTINCT (o_custkey, CAST(o_orderdate AS DATE))) AS BIGINT)
          AS n_cust_days,
        CAST(COUNT(*) AS DOUBLE)
          / CAST(COUNT(DISTINCT (o_custkey, CAST(o_orderdate AS DATE)))
                 AS DOUBLE) AS orders_per_cust_day
      FROM orders GROUP BY 1 ORDER BY p"""),
    covers = Seq("AGG-multi-distinct"))

  val all: Seq[QueryDef] =
    Seq(q294)
}
