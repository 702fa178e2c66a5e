package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-24 gate additions (q240+): spatial grid join + rolling
  * correlation.
  *
  * Determinism rules as everywhere (QueryDef scaladoc): exact
  * integer/DECIMAL arithmetic decides every membership, doubles come
  * from ONE shared IEEE tree, total ORDER BY.
  */
object Round24Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ------------------------------------------- grid-bucketed radius join
  // Spatial self-join: all embedding pairs within Euclidean radius r
  // of each other in the (dim1, dim2) plane, via the grid-file
  // algorithm — each point lands in a ⌊x/r⌋×⌊y/r⌋ cell, the build
  // side fans out to its 3×3 neighborhood, and cell equality becomes
  // the shuffle key. Lossless by construction: |Δx| ≤ r with cell
  // width r means cell indexes differ by ≤ 1, so every qualifying
  // pair meets in exactly one (home, neighbor) cell; the exact d²≤r²
  // filter (one shared IEEE tree over float→double coords) decides
  // membership, cells only bound candidates. The 9× build fan-out is
  // the standard spatial-join trade: candidates stay local to a
  // cell's ~9r² window instead of the O(n²) cross pair space, and the
  // oracle runs the brute-force theta join to prove zero loss.
  private val q240 = QueryDef(
    "q240_grid_radius_join",
    (s, dir) => {
      val pts = t(s, dir, "embeddings").select(
        col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
      graft.operators.GridJoin
        .radiusSelfJoin(pts, "vec_id", "x", "y", radius = 0.02d)
        .orderBy("vec_a", "vec_b")
    },
    Some("""WITH e AS (SELECT vec_id,
          CAST(embedding[1] AS DOUBLE) AS x, CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings)
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
            <= CAST(0.02 AS DOUBLE) * CAST(0.02 AS DOUBLE)
      ORDER BY vec_a, vec_b"""),
    covers = Seq("SPATIAL-grid-join"))

  // ------------------------------------------- rolling correlation
  // 28-day trailing Pearson correlation between daily line counts and
  // daily shipped quantity: the time-series co-movement monitor. The
  // corpus first collapses to one row per ship day (the only
  // data-sized aggregate — at 100 TB the window then runs over
  // ~thousands of rows, the q07 pattern), then value-based RANGE
  // frames accumulate the five power sums (n, Σx, Σx², Σy, Σxy, Σy²)
  // in longs/DECIMAL — exact under any partitioning — and the
  // correlation emerges from ONE shared IEEE tree. Windows whose x or
  // y variance is zero are excluded by an exact integer/DECIMAL
  // compare, never a float boundary.
  private val q241 = QueryDef(
    "q241_rolling_corr",
    (s, dir) => {
      val daily = t(s, dir, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("d"))
        .agg(count(lit(1)).as("x"), sum(dec(col("l_quantity"))).as("y"))
        .withColumn("ed", datediff(col("d"), lit("1970-01-01").cast("date")).cast("long"))
      val w = Window.orderBy("ed").rangeBetween(-27, 0)
      val framed = daily
        .withColumn("nw", count(lit(1)).over(w))
        .withColumn("sx", sum(col("x")).over(w))
        .withColumn("sxx", sum(col("x") * col("x")).over(w))
        .withColumn("sy", sum(col("y")).over(w).cast(DecimalType(18, 2)))
        .withColumn("sxy", sum(col("x") * col("y")).over(w).cast(DecimalType(18, 2)))
        .withColumn("syy", sum((col("y") * col("y")).cast(DecimalType(18, 4)))
          .over(w).cast(DecimalType(18, 4)))
      val num = col("nw") * col("sxy") - col("sx") * col("sy")
      val den1 = col("nw") * col("sxx") - col("sx") * col("sx")
      val den2 = col("nw") * col("syy") - col("sy") * col("sy")
      framed
        .filter(den1 > 0 && den2 > lit("0.0000").cast(DecimalType(18, 4)))
        .select(col("d"), col("nw").as("n_days"),
          (num.cast("double") /
            (sqrt(den1.cast("double")) * sqrt(den2.cast("double")))).as("corr"))
        .orderBy("d")
    },
    Some("""WITH daily AS (
        SELECT CAST(l_shipdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS y
        FROM lineitem GROUP BY 1),
      framed AS (
        SELECT d,
          COUNT(*) OVER w AS nw,
          CAST(SUM(x) OVER w AS BIGINT) AS sx,
          CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
          CAST(SUM(y) OVER w AS DECIMAL(18,2)) AS sy,
          CAST(SUM(x * y) OVER w AS DECIMAL(18,2)) AS sxy,
          CAST(SUM(CAST(y * y AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4)) AS syy
        FROM daily
        WINDOW w AS (ORDER BY DATE_DIFF('day', DATE '1970-01-01', d)
                     RANGE BETWEEN 27 PRECEDING AND CURRENT ROW))
      SELECT d, CAST(nw AS BIGINT) AS n_days,
        CAST(nw * sxy - sx * sy AS DOUBLE) /
          (sqrt(CAST(nw * sxx - sx * sx AS DOUBLE)) *
           sqrt(CAST(nw * syy - sy * sy AS DOUBLE))) AS corr
      FROM framed
      WHERE nw * sxx - sx * sx > 0 AND nw * syy - sy * sy > 0
      ORDER BY d"""),
    covers = Seq("W-rolling-corr"))

  val all: Seq[QueryDef] =
    Seq(q240, q241)
}
