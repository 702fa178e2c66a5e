package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-56 gate addition (q303): the revenue waterfall.
  */
object Round56Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- waterfall
  // The finance waterfall per year: gross bookings → discount given →
  // net → tax collected → billed, from TPC-H's pricing algebra
  // (extprice · (1−disc) · (1+tax)). Every step is an exact DECIMAL
  // product-sum — discounts and tax rates are 2-decimal fractions, so
  // the per-line amounts are exact at DECIMAL(18,4)/(18,6) and the
  // yearly sums close bit-stably under any partitioning; the derived
  // rates are one division each. The whole report is one scan + one
  // year-grain aggregate.
  private val q303 = QueryDef(
    "q303_revenue_waterfall",
    (s, dir) => {
      val ext = col("l_extendedprice").cast(DecimalType(18, 2))
      val disc = col("l_discount").cast(DecimalType(18, 2))
      val tax = col("l_tax").cast(DecimalType(18, 2))
      val discAmt = (ext * disc).cast(DecimalType(18, 4))
      val net = (ext * (lit(1).cast(DecimalType(18, 2)) - disc))
        .cast(DecimalType(18, 4))
      val taxAmt = (net * tax).cast(DecimalType(18, 6))
      t(s, dir, "lineitem")
        .groupBy(year(to_date(col("l_shipdate"))).cast("long").as("yr"))
        .agg(count(lit(1)).as("n_lines"),
          sum(ext).as("gross"),
          sum(discAmt).as("discount_given"),
          sum(net).as("net"),
          sum(taxAmt).as("tax_collected"))
        .select(col("yr"), col("n_lines"),
          col("gross").cast("double").as("gross"),
          col("discount_given").cast("double").as("discount_given"),
          col("net").cast("double").as("net"),
          col("tax_collected").cast("double").as("tax_collected"),
          (col("discount_given").cast("double") / col("gross").cast("double"))
            .as("discount_rate"),
          (col("tax_collected").cast("double") / col("net").cast("double"))
            .as("effective_tax_rate"))
        .orderBy("yr")
    },
    Some("""WITH li AS (SELECT
          CAST(EXTRACT(year FROM CAST(l_shipdate AS DATE)) AS BIGINT) AS yr,
          CAST(l_extendedprice AS DECIMAL(18,2)) AS ext,
          CAST(l_discount AS DECIMAL(18,2)) AS disc,
          CAST(l_tax AS DECIMAL(18,2)) AS tax
        FROM lineitem),
      g AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_lines,
          SUM(ext) AS gross,
          SUM(CAST(ext * disc AS DECIMAL(18,4))) AS discount_given,
          SUM(CAST(ext * (CAST(1 AS DECIMAL(18,2)) - disc) AS DECIMAL(18,4)))
            AS net,
          SUM(CAST(CAST(ext * (CAST(1 AS DECIMAL(18,2)) - disc)
                AS DECIMAL(18,4)) * tax AS DECIMAL(18,6))) AS tax_collected
        FROM li GROUP BY yr)
      SELECT yr, n_lines,
        CAST(gross AS DOUBLE) AS gross,
        CAST(discount_given AS DOUBLE) AS discount_given,
        CAST(net AS DOUBLE) AS net,
        CAST(tax_collected AS DOUBLE) AS tax_collected,
        CAST(discount_given AS DOUBLE) / CAST(gross AS DOUBLE)
          AS discount_rate,
        CAST(tax_collected AS DOUBLE) / CAST(net AS DOUBLE)
          AS effective_tax_rate
      FROM g ORDER BY yr"""),
    covers = Seq("A-waterfall"))

  val all: Seq[QueryDef] =
    Seq(q303)
}
