package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 gate additions (q181+): the SQL UNPIVOT parser surface,
  * per-row array set algebra, and a sequence-based date-spine gapfill
  * (the non-recursive twin of q64).
  *
  * Determinism rules as everywhere (QueryDef scaladoc): exact integer
  * / DECIMAL state, BIGINT casts on the DuckDB side, total ORDER BY;
  * array outputs surface as sorted joined strings so the hash compare
  * is representation-independent.
  */
object Round10Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // -------------------------------------------------- SQL UNPIVOT syntax
  // The SQL-parser UNPIVOT surface (q60 gates the DataFrame melt):
  // part's two numeric measures rotate to (measure, val) rows which
  // then aggregate per measure — wide-to-long without a UNION ALL
  // double-scan. Spark coerces the measure columns to their common
  // type (int → double, exact), so values hash-match the oracle's
  // hand-spelled UNION ALL.
  private val q181 = QueryDef(
    "q181_sql_unpivot",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT measure,
          COUNT(*) AS n,
          MIN(val) AS mn, MAX(val) AS mx,
          CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
          SELECT p_brand, p_size, p_retailprice FROM part)
        UNPIVOT (val FOR measure IN (p_size, p_retailprice))
        GROUP BY measure ORDER BY measure""")
    },
    Some("""WITH long AS (
        SELECT 'p_size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT 'p_retailprice', p_retailprice FROM part)
      SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
        MIN(val) AS mn, MAX(val) AS mx,
        CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM long GROUP BY measure ORDER BY measure"""),
    covers = Seq("SQL-unpivot"))

  // -------------------------------------------------- array set algebra
  // Per-row set algebra over token arrays — union / intersect /
  // except with distinct semantics, all narrow (no explode, no
  // shuffle): the in-row form of vocabulary comparison that would
  // otherwise cost two explodes and a join per document. Outputs are
  // sorted and joined to strings so the gate hashes set CONTENT, not
  // engine-specific array ordering.
  private val q182 = QueryDef(
    "q182_array_setops",
    (s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") % 4 === 0)
        .select(col("doc_id"),
          slice(split(col("text"), " "), 1, 10).as("a"),
          slice(split(col("text"), " "), 5, 11).as("b"))
      d.select(
          col("doc_id"),
          array_join(sort_array(array_distinct(array_union(col("a"), col("b")))), ",").as("u"),
          array_join(sort_array(array_distinct(array_intersect(col("a"), col("b")))), ",").as("i"),
          array_join(sort_array(array_distinct(array_except(col("a"), col("b")))), ",").as("x"),
          size(array_distinct(array_union(col("a"), col("b")))).as("n_union"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (
        SELECT doc_id, string_split(text,' ')[1:10] AS a, string_split(text,' ')[5:15] AS b
        FROM documents WHERE doc_id % 4 = 0)
      SELECT doc_id,
        COALESCE(array_to_string(list_sort(list_distinct(list_cat(a, b))), ','), '') AS u,
        COALESCE(array_to_string(list_sort(list_distinct(list_intersect(a, b))), ','), '') AS i,
        COALESCE(array_to_string(list_sort(list_distinct(
          list_filter(a, e -> NOT list_contains(b, e)))), ','), '') AS x,
        CAST(len(list_distinct(list_cat(a, b))) AS INTEGER) AS n_union
      FROM d ORDER BY doc_id"""),
    covers = Seq("ARR-setops"))

  // ----------------------------------------------------- date spine gapfill
  // Calendar-spine gapfill without recursion (q64 gates the WITH
  // RECURSIVE form): the spine materializes in-row from ONE
  // `sequence(min, max, interval 1 day)` over the global bounds (a
  // 1-row broadcast), explodes to days, and left-joins the daily
  // aggregate — absent days surface as zero-count rows. At 100 TB
  // the spine is still only O(days) rows; the daily aggregate is the
  // only data-sized operation.
  private val q183 = QueryDef(
    "q183_date_spine",
    (s, dir) => {
      val o = t(s, dir, "orders").select(to_date(col("o_orderdate")).as("d"))
      val daily = o.groupBy("d").agg(count(lit(1)).as("n_raw"))
      val spine = o.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 DAY"))).as("d"))
      spine.join(daily, Seq("d"), "left")
        .select(col("d"), coalesce(col("n_raw"), lit(0L)).as("n"))
        .filter(dayofmonth(col("d")) <= 2)
        .orderBy("d")
    },
    Some("""WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders),
      daily AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_raw FROM o GROUP BY d),
      bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM o),
      spine AS (SELECT CAST(unnest(generate_series(
          (SELECT lo FROM bounds), (SELECT hi FROM bounds),
          INTERVAL 1 DAY)) AS DATE) AS d)
      SELECT s.d, COALESCE(daily.n_raw, 0) AS n
      FROM spine s LEFT JOIN daily ON s.d = daily.d
      WHERE date_part('day', s.d) <= 2
      ORDER BY s.d"""),
    covers = Seq("GAPFILL-spine"))

  val all: Seq[QueryDef] =
    Seq(q181, q182, q183)
}
