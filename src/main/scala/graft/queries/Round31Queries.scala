package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-31 gate additions (q257+): string formatting semantics and
  * 2-D binned density.
  */
object Round31Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- format strings
  // printf-family formatting and null-skipping concat: format_string
  // (Spark) vs printf (DuckDB) over integer/hex/string verbs — the
  // locale-free subset that IS portable (float verbs are not: the
  // engines' shortest-repr vs C-printf rules differ, so the engine
  // bans them like round-on-double) — plus concat_ws's skip-NULLs
  // contract (|| would null the whole row) and lpad zero-padding.
  // Two more documented exclusions shape the formatted args: a NULL
  // printf arg NULLs the row in DuckDB but renders 'null' in Spark
  // (so the verb args are coalesced; concat_ws keeps the raw NULL to
  // pin ITS skip contract), and %x of a negative integer is
  // two's-complement width-dependent — hex gets a pmod-nonnegative.
  private val q257 = QueryDef(
    "q257_format_strings",
    (s, dir) => {
      val cents = (col("c_acctbal").cast(DecimalType(18, 2)) * 100).cast("long")
      val seg = nullif(col("c_mktsegment"), lit("BUILDING"))
      t(s, dir, "customer")
        .select(col("c_custkey"), cents.as("cents"), seg.as("seg"))
        .select(col("c_custkey"),
          format_string("%08d|%s|%x", col("c_custkey"),
            coalesce(col("seg"), lit("none")), pmod(col("cents"), lit(4096)))
            .as("formatted"),
          concat_ws("-", lit("cust"), col("seg"), col("c_custkey")).as("joined"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"))
        .orderBy("c_custkey")
    },
    Some("""WITH c AS (SELECT c_custkey,
          CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
          NULLIF(c_mktsegment, 'BUILDING') AS seg
        FROM customer)
      SELECT c_custkey,
        printf('%08d|%s|%x', c_custkey, COALESCE(seg, 'none'),
               ((cents % 4096) + 4096) % 4096) AS formatted,
        concat_ws('-', 'cust', seg, c_custkey) AS joined,
        lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
      FROM c ORDER BY c_custkey"""),
    covers = Seq("S-format"))

  // ------------------------------------------------- 2-D histogram
  // Binned density over the (dim1, dim2) embedding plane: fixed-width
  // integer cells (the same ⌊x/w⌋ keys GridJoin shards by), per-cell
  // counts and micro-quantized centroids — the density map that sizes
  // a spatial-join's cells and exposes hot spots BEFORE running it.
  // One aggregate, integer keys, map-side combined. A raw double SUM
  // would be partial-order nondeterministic, so each coordinate is
  // floor-quantized to integer micro-units first (⌊x·10⁶⌋ — one
  // deterministic IEEE multiply + floor per row); the LONG sums are
  // exact under any partitioning and the centroid is ONE division.
  private val q258 = QueryDef(
    "q258_histogram_2d",
    (s, dir) => {
      val x = element_at(col("embedding"), 1).cast("double")
      val y = element_at(col("embedding"), 2).cast("double")
      val w = 0.1d
      t(s, dir, "embeddings")
        .select(col("vec_id"), x.as("x"), y.as("y"))
        .groupBy(floor(col("x") / lit(w)).cast("long").as("bx"),
          floor(col("y") / lit(w)).cast("long").as("by"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("x") * lit(1000000.0d)).cast("long")).as("qx"),
          sum(floor(col("y") * lit(1000000.0d)).cast("long")).as("qy"))
        .select(col("bx"), col("by"), col("n"),
          (col("qx").cast("double") / col("n").cast("double") / lit(1000000.0d))
            .as("cx"),
          (col("qy").cast("double") / col("n").cast("double") / lit(1000000.0d))
            .as("cy"))
        .orderBy("bx", "by")
    },
    Some("""WITH e AS (SELECT
          CAST(embedding[1] AS DOUBLE) AS x, CAST(embedding[2] AS DOUBLE) AS y
        FROM embeddings)
      SELECT CAST(floor(x / CAST(0.1 AS DOUBLE)) AS BIGINT) AS bx,
             CAST(floor(y / CAST(0.1 AS DOUBLE)) AS BIGINT) AS by,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(floor(x * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS DOUBLE) /
               CAST(COUNT(*) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS cx,
             CAST(SUM(CAST(floor(y * CAST(1000000 AS DOUBLE)) AS BIGINT)) AS DOUBLE) /
               CAST(COUNT(*) AS DOUBLE) / CAST(1000000 AS DOUBLE) AS cy
      FROM e GROUP BY 1, 2 ORDER BY bx, by"""),
    covers = Seq("SPATIAL-histogram-2d"))

  val all: Seq[QueryDef] =
    Seq(q257, q258)
}
