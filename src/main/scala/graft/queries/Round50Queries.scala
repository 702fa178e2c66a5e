package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-50 gate addition (q296): customer value-band migration.
  */
object Round50Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- band migration
  // Year-over-year value-band transition matrix: quartile-band every
  // customer's annual revenue (NTILE over a total order, like q261's
  // RFM axes), then count how customers MOVE between bands across
  // consecutive years — the upgrade/churn matrix behind lifecycle
  // marketing. The transition join is an equi-join on (customer,
  // year+1); counts are exact and each row's share closes as one
  // division against its from-band total (window sum over the 4×4
  // matrix grain). Revenue stays DECIMAL until banding, which
  // compares by rank, not value.
  private val q296 = QueryDef(
    "q296_band_migration",
    (s, dir) => {
      val cy = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("c"),
          year(to_date(col("o_orderdate"))).cast("long").as("yr"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      val banded = cy.withColumn("band",
        ntile(4).over(Window.partitionBy("yr")
          .orderBy(desc("rev"), asc("c"))).cast("long"))
      val from = banded.select(col("c"), col("yr"),
        col("band").as("band_from"))
      val to = banded.select(col("c"), (col("yr") - 1L).as("yr"),
        col("band").as("band_to"))
      val trans = from.join(to, Seq("c", "yr"))
        .groupBy("band_from", "band_to")
        .agg(count(lit(1)).as("n"))
      val wFrom = Window.partitionBy("band_from")
      trans
        .withColumn("from_total", sum(col("n")).over(wFrom))
        .select(col("band_from"), col("band_to"), col("n"),
          (col("n").cast("double") / col("from_total").cast("double"))
            .as("share"))
        .orderBy("band_from", "band_to")
    },
    Some("""WITH cy AS (SELECT o_custkey AS c,
          CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1, 2),
      banded AS (SELECT c, yr,
          CAST(NTILE(4) OVER (PARTITION BY yr ORDER BY rev DESC, c ASC)
            AS BIGINT) AS band
        FROM cy),
      trans AS (SELECT f.band AS band_from, t.band AS band_to,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM banded f JOIN banded t ON t.c = f.c AND t.yr = f.yr + 1
        GROUP BY 1, 2)
      SELECT band_from, band_to, n,
        CAST(n AS DOUBLE) /
          CAST(CAST(SUM(n) OVER (PARTITION BY band_from) AS BIGINT) AS DOUBLE)
          AS share
      FROM trans ORDER BY band_from, band_to"""),
    covers = Seq("A-band-migration"))

  val all: Seq[QueryDef] =
    Seq(q296)
}
