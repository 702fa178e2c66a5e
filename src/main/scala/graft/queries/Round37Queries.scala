package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-37 gate additions (q274+): rank concordance and randomness
  * testing — the ordinal companions to q260's Spearman, still on the
  * exact-moments discipline (integer counts, one final IEEE tree).
  */
object Round37Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def daily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).as("y"))
      .withColumn("yr", year(col("d")).cast("long"))

  // ------------------------------------------------- Kendall tau-b
  // Concordance between daily volume and revenue per year: every day
  // pair votes concordant (both move the same way), discordant, or
  // tied, and tau-b normalizes by the tie-adjusted pair counts. All
  // counts are exact longs from integer/DECIMAL comparisons — no
  // ranks, no floats until the single closing tree
  // (C−D)/(√(n0−n1)·√(n0−n2)). The O(days²) self-join is bounded by
  // the DAILY grain (≤366 rows per year at any data scale), and
  // partitions by year.
  private val q274 = QueryDef(
    "q274_kendall_tau",
    (s, dir) => {
      val d = daily(s, dir)
      val a = d.select(col("yr"), col("d").as("d1"),
        col("x").as("x1"), col("y").as("y1"))
      val b = d.select(col("yr"), col("d").as("d2"),
        col("x").as("x2"), col("y").as("y2"))
      val pairs = a.join(b, Seq("yr")).filter(col("d1") < col("d2"))
      val cmpX = when(col("x1") < col("x2"), 1L)
        .when(col("x1") > col("x2"), -1L).otherwise(0L)
      val cmpY = when(col("y1") < col("y2"), 1L)
        .when(col("y1") > col("y2"), -1L).otherwise(0L)
      val g = pairs
        .withColumn("cx", cmpX).withColumn("cy", cmpY)
        .groupBy("yr")
        .agg(count(lit(1)).as("n0"),
          sum(when(col("cx") * col("cy") > 0, 1L).otherwise(0L)).as("c"),
          sum(when(col("cx") * col("cy") < 0, 1L).otherwise(0L)).as("dd"),
          sum(when(col("cx") === 0L, 1L).otherwise(0L)).as("n1"),
          sum(when(col("cy") === 0L, 1L).otherwise(0L)).as("n2"))
      g.filter(col("n0") > col("n1") && col("n0") > col("n2"))
        .select(col("yr"), col("n0").as("n_pairs"),
          col("c").as("concordant"), col("dd").as("discordant"),
          ((col("c") - col("dd")).cast("double") /
            (sqrt((col("n0") - col("n1")).cast("double"))
              * sqrt((col("n0") - col("n2")).cast("double"))))
            .as("tau_b"))
        .orderBy("yr")
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y,
               CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS yr
        FROM orders GROUP BY 1),
      pairs AS (
        SELECT a.yr,
          CASE WHEN a.x < b.x THEN 1 WHEN a.x > b.x THEN -1 ELSE 0 END AS cx,
          CASE WHEN a.y < b.y THEN 1 WHEN a.y > b.y THEN -1 ELSE 0 END AS cy
        FROM daily a JOIN daily b ON a.yr = b.yr AND a.d < b.d),
      g AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n0,
          CAST(SUM(CASE WHEN cx * cy > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(SUM(CASE WHEN cx * cy < 0 THEN 1 ELSE 0 END) AS BIGINT) AS dd,
          CAST(SUM(CASE WHEN cx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(SUM(CASE WHEN cy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        FROM pairs GROUP BY yr)
      SELECT yr, n0 AS n_pairs, c AS concordant, dd AS discordant,
        CAST(c - dd AS DOUBLE) /
          (sqrt(CAST(n0 - n1 AS DOUBLE)) * sqrt(CAST(n0 - n2 AS DOUBLE)))
          AS tau_b
      FROM g WHERE n0 > n1 AND n0 > n2 ORDER BY yr"""),
    covers = Seq("STAT-kendall"))

  // ------------------------------------------------- runs test
  // Wald–Wolfowitz randomness check on the daily series: is the
  // up/down pattern around the year's median independent, or does it
  // trend/oscillate? The median is the VALUE at rank (n+1) div 2 —
  // well-defined whatever the tie order — days equal to it drop out
  // (the standard treatment), and a run boundary is an exact integer
  // sign flip counted by lag(). Everything through the run/up/down
  // counts is integer; the z-score closes with one fixed tree from
  // the exact n1, n2, R.
  private val q275 = QueryDef(
    "q275_runs_test",
    (s, dir) => {
      val d = daily(s, dir).select("yr", "d", "x")
      val wRank = Window.partitionBy("yr").orderBy(col("x"), col("d"))
      val wYear = Window.partitionBy("yr")
      val med = d
        .withColumn("i", row_number().over(wRank).cast("long"))
        .withColumn("n", count(lit(1)).over(wYear))
        .withColumn("m",
          max(when(col("i") === expr("(n + 1) div 2"), col("x"))).over(wYear))
      val signed = med.filter(col("x") =!= col("m"))
        .withColumn("up", (col("x") > col("m")).cast("long"))
      val wSeq = Window.partitionBy("yr").orderBy("d")
      val runs = signed
        .withColumn("flip",
          when(lag(col("up"), 1).over(wSeq).isNull, 1L)
            .when(lag(col("up"), 1).over(wSeq) =!= col("up"), 1L)
            .otherwise(0L))
        .groupBy("yr")
        .agg(sum(col("flip")).as("r"),
          sum(col("up")).as("n1"),
          sum(lit(1L) - col("up")).as("n2"))
        .filter(col("n1") > 0 && col("n2") > 0)
      val n1d = col("n1").cast("double")
      val n2d = col("n2").cast("double")
      val nd = (col("n1") + col("n2")).cast("double")
      val twoN1N2 = lit(2.0d) * n1d * n2d
      val expected = twoN1N2 / nd + lit(1.0d)
      val variance = (twoN1N2 * (twoN1N2 - nd)) / (nd * nd * (nd - lit(1.0d)))
      runs.select(col("yr"), col("n1"), col("n2"), col("r").as("runs"),
          expected.as("expected_runs"),
          ((col("r").cast("double") - expected) / sqrt(variance)).as("z"))
        .orderBy("yr")
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS yr
        FROM orders GROUP BY 1),
      med AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY yr ORDER BY x, d)
                AS BIGINT) AS i,
          CAST(COUNT(*) OVER (PARTITION BY yr) AS BIGINT) AS n
        FROM daily),
      medv AS (SELECT *, MAX(CASE WHEN i = (n + 1) // 2 THEN x END)
                 OVER (PARTITION BY yr) AS m
        FROM med),
      signed AS (SELECT yr, d,
          CAST(x > m AS BIGINT) AS up
        FROM medv WHERE x <> m),
      flips AS (SELECT yr, up,
          CASE WHEN LAG(up) OVER (PARTITION BY yr ORDER BY d) IS NULL THEN 1
               WHEN LAG(up) OVER (PARTITION BY yr ORDER BY d) <> up THEN 1
               ELSE 0 END AS flip
        FROM signed),
      g AS (SELECT yr, CAST(SUM(flip) AS BIGINT) AS r,
          CAST(SUM(up) AS BIGINT) AS n1,
          CAST(SUM(1 - up) AS BIGINT) AS n2
        FROM flips GROUP BY yr)
      SELECT yr, n1, n2, r AS runs,
        CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
          / CAST(n1 + n2 AS DOUBLE) + CAST(1 AS DOUBLE) AS expected_runs,
        (CAST(r AS DOUBLE)
          - (CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             / CAST(n1 + n2 AS DOUBLE) + CAST(1 AS DOUBLE)))
        / sqrt((CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                * (CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                   - CAST(n1 + n2 AS DOUBLE)))
               / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                  * (CAST(n1 + n2 AS DOUBLE) - CAST(1 AS DOUBLE)))) AS z
      FROM g WHERE n1 > 0 AND n2 > 0 ORDER BY yr"""),
    covers = Seq("STAT-runs-test"))

  val all: Seq[QueryDef] =
    Seq(q274, q275)
}
