package graft.queries

import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StringType}

import graft.Tables
import graft.etl.{Clock, DisruptionCleaner}

/** The cleaning pipeline itself under the DuckDB hash gate.
  *
  * Both engines derive identical NS-shaped raw records (id / type /
  * title / start / end strings, with planted nulls, Dutch + uppercase
  * types, short titles, malformed timestamps, missing ends) from the
  * events table; Spark runs the real [[DisruptionCleaner]] (clock
  * pinned to 2024-01-31T00:00Z), the oracle re-implements the cleaner
  * semantics in SQL. Matching per-type aggregates prove the rename /
  * type-map / title rules / coercing parse / imputation / duration
  * guards / impact cascade / regex station fallback / validation
  * chain end-to-end against an independent engine.
  */
object CleanerGateQuery {

  private val clock = Clock(Instant.parse("2024-01-31T00:00:00Z"))
  // clock + 2h as epoch micros, for the imputed-end count
  private val imputedUs: Long =
    Instant.parse("2024-01-31T02:00:00Z").toEpochMilli * 1000L

  /** NS-shaped synthetic raw records derived from the events table —
    * shared by the batch gate (q46) and the streaming AvailableNow
    * gate (Round101's q528), so both execution modes clean literally
    * the same input.
    */
  private[queries] def rawFromEvents(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val e = Tables.load(s, dir, "events")
    val endTs = timestamp_micros(unix_micros(col("ts")) +
      (col("value").cast(DecimalType(18, 2)) * 60000000).cast(LongType))
    e.select(
      when(col("event_id") % 97 === 0, lit(null).cast(StringType))
        .otherwise(col("event_id").cast(StringType)).as("id"),
      when(col("event_type") === "error", "CALAMITY")
        .when(col("event_type") === "purchase", "cancellation")
        .when(col("event_type") === "signup", "werkzaamheden")
        .when(col("event_type") === "click", "verstoring")
        .otherwise("storing").as("type"),
      when(col("event_id") % 5 === 0, lit(null).cast(StringType))
        .when(col("event_id") % 5 === 1, "ab")
        .when(col("event_id") % 5 === 2, "Storing ASD richting GVC")
        .when(col("event_id") % 5 === 3, "  Geplande werkzaamheden Utrecht  ")
        .otherwise(concat(lit("x"), col("event_id").cast(StringType))).as("title"),
      when(col("event_id") % 13 === 0, "not-a-date")
        .otherwise(concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
          lit("+0000"))).as("start"),
      when(col("event_id") % 3 === 0, lit(null).cast(StringType))
        .otherwise(concat(date_format(endTs, "yyyy-MM-dd'T'HH:mm:ss"),
          lit("+0000"))).as("end"))
  }

  /** The gate's per-type aggregate over a cleaned frame (shared with
    * q528, which must produce the identical report from the streamed
    * clean).
    */
  private[queries] def cleanedReport(
      cleaned: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    cleaned.groupBy("type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("impact_level")).as("sum_impact"),
        count(col("affected_stations")).as("n_with_stations"),
        sum(when(col("duration_minutes").isNull, 1).otherwise(0))
          .as("n_null_duration"),
        min(col("duration_minutes")).as("min_duration"),
        max(col("duration_minutes")).as("max_duration"),
        sum(when(unix_micros(col("end_time")) === imputedUs, 1).otherwise(0))
          .as("n_imputed_end"))
      .orderBy("type")

  /** The pinned cleaner clock, shared with q528. */
  private[queries] val gateClock = clock

  private val q46 = QueryDef(
    "q46_cleaner_parity",
    (s, dir) =>
      cleanedReport(DisruptionCleaner.clean(rawFromEvents(s, dir), clock)),
    Some(s"""WITH raw AS (
        SELECT
          CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST(event_id AS VARCHAR) END AS id,
          CASE event_type WHEN 'error' THEN 'CALAMITY'
               WHEN 'purchase' THEN 'cancellation'
               WHEN 'signup' THEN 'werkzaamheden'
               WHEN 'click' THEN 'verstoring'
               ELSE 'storing' END AS rtype,
          CASE CAST(event_id % 5 AS INTEGER)
               WHEN 0 THEN NULL
               WHEN 1 THEN 'ab'
               WHEN 2 THEN 'Storing ASD richting GVC'
               WHEN 3 THEN '  Geplande werkzaamheden Utrecht  '
               ELSE 'x' || CAST(event_id AS VARCHAR) END AS rtitle,
          CASE WHEN event_id % 13 = 0 THEN 'not-a-date'
               ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') || '+0000' END AS rstart,
          CASE WHEN event_id % 3 = 0 THEN NULL
               ELSE strftime(make_timestamp(epoch_us(ts) +
                      CAST(CAST(value AS DECIMAL(18,2)) * 60000000 AS BIGINT)),
                    '%Y-%m-%dT%H:%M:%S') || '+0000' END AS rend
        FROM events),
      c0 AS (
        SELECT
          COALESCE(CASE lower(rtype)
              WHEN 'verstoring' THEN 'disruption'
              WHEN 'werkzaamheden' THEN 'maintenance'
              WHEN 'calamiteit' THEN 'calamity'
              WHEN 'storing' THEN 'disruption' END, lower(rtype)) AS type,
          CASE WHEN length(trim(rtitle)) < 5 THEN NULL ELSE trim(rtitle) END AS title,
          epoch_us(try_strptime(rstart, '%Y-%m-%dT%H:%M:%S%z')) AS start_us,
          COALESCE(epoch_us(try_strptime(rend, '%Y-%m-%dT%H:%M:%S%z')), $imputedUs) AS end_us
        FROM raw WHERE id IS NOT NULL),
      c1 AS (
        SELECT type, title, start_us, end_us,
          CASE WHEN start_us IS NULL THEN NULL
               WHEN CAST(end_us - start_us AS DOUBLE) / CAST(60000000 AS DOUBLE) < 0 THEN NULL
               ELSE CAST(end_us - start_us AS DOUBLE) / CAST(60000000 AS DOUBLE)
               END AS duration
        FROM c0),
      c2 AS (
        SELECT type, start_us, end_us, duration,
          CASE WHEN type = 'calamity' THEN 5
               WHEN contains(type, 'cancel') THEN 5
               WHEN type = 'maintenance' THEN
                 CASE WHEN COALESCE(duration, 0) > 240 THEN 4 ELSE 3 END
               WHEN type = 'disruption' THEN
                 CASE WHEN COALESCE(duration, 0) > 120 THEN 4
                      WHEN COALESCE(duration, 0) > 60 THEN 3 ELSE 2 END
               ELSE 2 END AS impact,
          CASE WHEN title IS NOT NULL
                AND len(regexp_extract_all(title, '\\b[A-Z]{2,5}\\b')) > 0
               THEN array_to_string(list_sort(list_distinct(
                      regexp_extract_all(title, '\\b[A-Z]{2,5}\\b'))), ',')
               END AS affected_stations
        FROM c1)
      SELECT type,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(impact) AS BIGINT) AS sum_impact,
        CAST(COUNT(affected_stations) AS BIGINT) AS n_with_stations,
        CAST(SUM(CASE WHEN duration IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_duration,
        MIN(duration) AS min_duration,
        MAX(duration) AS max_duration,
        CAST(SUM(CASE WHEN end_us = $imputedUs THEN 1 ELSE 0 END) AS BIGINT) AS n_imputed_end
      FROM c2 GROUP BY type ORDER BY type"""),
    covers = Seq("P1-P13"))

  /** q46's oracle SQL, reused verbatim by the streaming twin q528. */
  private[queries] def parityOracle: String = q46.oracle.get

  val all: Seq[QueryDef] = Seq(q46)
}
