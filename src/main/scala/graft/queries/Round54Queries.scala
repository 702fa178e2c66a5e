package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-54 gate addition (q301): the revenue bridge (volume/rate
  * decomposition).
  */
object Round54Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- revenue bridge
  // Why did revenue move? Per segment, the year-over-year delta
  // decomposes into a VOLUME effect ((n₂−n₁)·p̄₁), a RATE effect
  // ((p̄₂−p̄₁)·n₁) and the interaction — the Laspeyres bridge every
  // finance review walks. Inputs are exact (counts, DECIMAL sums);
  // each effect is ONE fixed IEEE tree over them (the average order
  // values are rationals s/n — the trees keep the division innermost
  // and identical on both engines), and the three effects
  // reconstruct the exact delta algebraically. One (segment, year)
  // aggregate + a self-join on year+1.
  private val q301 = QueryDef(
    "q301_revenue_bridge",
    (s, dir) => {
      val sy = t(s, dir, "orders").join(
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          year(to_date(col("o_orderdate"))).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
      val y1 = sy.select(col("seg"), col("yr"),
        col("n").as("n1"), col("rev").as("rev1"))
      val y2 = sy.select(col("seg"), (col("yr") - 1L).as("yr"),
        col("n").as("n2"), col("rev").as("rev2"))
      val p1 = col("rev1").cast("double") / col("n1").cast("double")
      val p2 = col("rev2").cast("double") / col("n2").cast("double")
      y1.join(y2, Seq("seg", "yr"))
        .select(col("seg"), col("yr"), col("n1"), col("n2"),
          col("rev1").cast("double").as("rev_y1"),
          col("rev2").cast("double").as("rev_y2"),
          (col("rev2") - col("rev1")).cast("double").as("delta"),
          ((col("n2") - col("n1")).cast("double") * p1).as("volume_effect"),
          ((p2 - p1) * col("n1").cast("double")).as("rate_effect"),
          ((p2 - p1) * (col("n2") - col("n1")).cast("double"))
            .as("interaction"))
        .orderBy("seg", "yr")
    },
    Some("""WITH sy AS (SELECT c_mktsegment AS seg,
          CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
          CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2)
      SELECT a.seg, a.yr, a.n AS n1, b.n AS n2,
        CAST(a.rev AS DOUBLE) AS rev_y1,
        CAST(b.rev AS DOUBLE) AS rev_y2,
        CAST(b.rev - a.rev AS DOUBLE) AS delta,
        CAST(b.n - a.n AS DOUBLE)
          * (CAST(a.rev AS DOUBLE) / CAST(a.n AS DOUBLE)) AS volume_effect,
        (CAST(b.rev AS DOUBLE) / CAST(b.n AS DOUBLE)
          - CAST(a.rev AS DOUBLE) / CAST(a.n AS DOUBLE))
          * CAST(a.n AS DOUBLE) AS rate_effect,
        (CAST(b.rev AS DOUBLE) / CAST(b.n AS DOUBLE)
          - CAST(a.rev AS DOUBLE) / CAST(a.n AS DOUBLE))
          * CAST(b.n - a.n AS DOUBLE) AS interaction
      FROM sy a JOIN sy b ON b.seg = a.seg AND b.yr = a.yr + 1
      ORDER BY a.seg, a.yr"""),
    covers = Seq("A-revenue-bridge"))

  val all: Seq[QueryDef] =
    Seq(q301)
}
