package graft.analytics

import java.time.ZoneOffset

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.Clock

/** Spark SQL twins of [[NsQueries]] — the reference's six queries as
  * SQL strings over temp views `disruptions` / `stations`
  * (SURVEY §3.3: each query exists in both dialects and must agree).
  * Dialect translations from SQLite are the same as the DataFrame
  * forms; Q5's scalar subquery runs natively in Spark SQL.
  */
object NsSqlQueries {

  private def d(clock: Clock): String =
    clock.now.atZone(ZoneOffset.UTC).toLocalDate.toString

  def rollingTrend(clock: Clock): String = s"""
    WITH daily_counts AS (
      SELECT DATE(start_time) AS disruption_date, type,
             COUNT(*) AS incident_count,
             AVG(duration_minutes) AS avg_duration_raw
      FROM disruptions
      WHERE start_time >= date_sub(DATE '${d(clock)}', 30)
      GROUP BY DATE(start_time), type)
    SELECT disruption_date, type, incident_count,
      ROUND(avg_duration_raw, 1) AS avg_duration_minutes,
      SUM(incident_count) OVER (PARTITION BY type ORDER BY disruption_date
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_7day_total,
      ROUND(AVG(incident_count) OVER (PARTITION BY type ORDER BY disruption_date
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS rolling_7day_avg
    FROM daily_counts
    ORDER BY disruption_date DESC, incident_count DESC"""

  val stationSeverity: String = """
    WITH unnested AS (
      SELECT d.disruption_id, d.impact_level, d.duration_minutes,
             TRIM(s.station_code) AS station_code
      FROM disruptions d
      LATERAL VIEW explode(split(d.affected_stations, ',')) s AS station_code
      WHERE d.affected_stations IS NOT NULL),
    agg AS (
      SELECT station_code,
             COUNT(DISTINCT disruption_id) AS total_disruptions,
             AVG(duration_minutes) AS avg_dur_raw,
             AVG(impact_level) AS avg_imp_raw,
             MAX(impact_level) AS max_impact_level
      FROM unnested GROUP BY station_code)
    SELECT a.station_code, st.station_name, a.total_disruptions,
      ROUND(a.avg_dur_raw, 1) AS avg_duration_minutes,
      ROUND(a.avg_imp_raw, 2) AS avg_impact_level,
      ROUND(PERCENT_RANK() OVER (ORDER BY a.total_disruptions), 3) AS disruption_percentile,
      DENSE_RANK() OVER (ORDER BY a.total_disruptions DESC) AS severity_rank,
      CASE WHEN PERCENT_RANK() OVER (ORDER BY a.total_disruptions) > 0.9 THEN 'HIGH RISK'
           WHEN PERCENT_RANK() OVER (ORDER BY a.total_disruptions) > 0.7 THEN 'MEDIUM RISK'
           ELSE 'LOW RISK' END AS risk_category
    FROM agg a LEFT JOIN stations st ON a.station_code = st.station_code
    ORDER BY a.total_disruptions DESC"""

  val dayOverDay: String = """
    WITH daily AS (
      SELECT DATE(start_time) AS disruption_date,
             COUNT(*) AS total_disruptions,
             SUM(CASE WHEN type = 'calamity' THEN 1 ELSE 0 END) AS calamities,
             SUM(CASE WHEN type = 'maintenance' THEN 1 ELSE 0 END) AS maintenance,
             SUM(CASE WHEN type = 'disruption' THEN 1 ELSE 0 END) AS disruptions,
             ROUND(AVG(duration_minutes), 1) AS avg_duration,
             MAX(impact_level) AS max_impact
      FROM disruptions GROUP BY DATE(start_time))
    SELECT disruption_date, total_disruptions, avg_duration, max_impact,
      LAG(total_disruptions, 1) OVER (ORDER BY disruption_date) AS prev_day_total,
      LEAD(total_disruptions, 1) OVER (ORDER BY disruption_date) AS next_day_total,
      total_disruptions - LAG(total_disruptions, 1) OVER (ORDER BY disruption_date) AS dod_delta,
      ROUND(100.0 * (total_disruptions - LAG(total_disruptions, 1) OVER (ORDER BY disruption_date))
        / NULLIF(LAG(total_disruptions, 1) OVER (ORDER BY disruption_date), 0), 1) AS dod_pct_change,
      SUM(total_disruptions) OVER (ORDER BY disruption_date
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_7day
    FROM daily ORDER BY disruption_date DESC"""

  val peakHour: String = """
    WITH hourly AS (
      SELECT date_format(start_time, 'HH') AS hour_of_day,
             CAST(dayofweek(start_time) - 1 AS STRING) AS day_of_week,
             COUNT(*) AS disruption_count,
             ROUND(AVG(duration_minutes), 1) AS avg_duration,
             ROUND(AVG(impact_level), 2) AS avg_impact
      FROM disruptions WHERE start_time IS NOT NULL
      GROUP BY 1, 2)
    SELECT CASE day_of_week
        WHEN '0' THEN 'Sunday' WHEN '1' THEN 'Monday' WHEN '2' THEN 'Tuesday'
        WHEN '3' THEN 'Wednesday' WHEN '4' THEN 'Thursday'
        WHEN '5' THEN 'Friday' WHEN '6' THEN 'Saturday' END AS day_name,
      hour_of_day || ':00' AS hour_label,
      disruption_count, avg_duration, avg_impact,
      ROW_NUMBER() OVER (ORDER BY disruption_count DESC) AS row_num,
      RANK() OVER (ORDER BY disruption_count DESC) AS rank_with_gaps,
      DENSE_RANK() OVER (ORDER BY disruption_count DESC) AS dense_rank
    FROM hourly ORDER BY disruption_count DESC LIMIT 20"""

  def complexAnalytics(clock: Clock): String = s"""
    WITH metrics AS (
      SELECT DATE(start_time) AS disruption_date, type,
             COUNT(*) AS incident_count,
             AVG((unix_micros(end_time) - unix_micros(start_time)) / 6e7) AS avg_dur_raw
      FROM disruptions
      WHERE start_time >= date_sub(DATE '${d(clock)}', 30)
      GROUP BY DATE(start_time), type),
    daily_tot AS (
      SELECT disruption_date, SUM(incident_count) AS day_total
      FROM metrics GROUP BY disruption_date),
    rolling AS (
      SELECT disruption_date,
             SUM(day_total) OVER (ORDER BY disruption_date
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_7day_total
      FROM daily_tot),
    station_impact AS (
      SELECT station_code, COUNT(*) AS disruption_count,
             PERCENT_RANK() OVER (ORDER BY COUNT(*)) AS severity_percentile
      FROM (SELECT TRIM(c.station_code) AS station_code
            FROM disruptions
            LATERAL VIEW explode(split(affected_stations, ',')) c AS station_code
            WHERE affected_stations IS NOT NULL)
      GROUP BY station_code)
    SELECT m.disruption_date, m.type, m.incident_count,
      ROUND(m.avg_dur_raw, 2) AS avg_duration,
      r.rolling_7day_total,
      (SELECT si.station_code FROM station_impact si
       WHERE si.severity_percentile > 0.9
       ORDER BY si.disruption_count DESC, si.station_code LIMIT 1) AS worst_station,
      ROUND(100.0 *
        SUM(CASE WHEN m.type = 'cancellation' THEN m.incident_count END)
          OVER (PARTITION BY m.disruption_date)
        / NULLIF(SUM(m.incident_count) OVER (PARTITION BY m.disruption_date), 0), 2)
        AS cancellation_rate_pct
    FROM metrics m JOIN rolling r ON m.disruption_date = r.disruption_date
    ORDER BY m.disruption_date DESC, m.incident_count DESC"""

  def overlapping(clock: Clock): String = s"""
    SELECT a.disruption_id AS disruption_a, b.disruption_id AS disruption_b,
      a.type AS type_a, b.type AS type_b,
      a.start_time AS a_start, a.end_time AS a_end,
      b.start_time AS b_start, b.end_time AS b_end,
      CAST((unix_micros(LEAST(a.end_time, b.end_time))
            - unix_micros(GREATEST(a.start_time, b.start_time))) / 6e7 AS INT)
        AS overlap_minutes
    FROM disruptions a JOIN disruptions b
      ON a.disruption_id < b.disruption_id
     AND a.start_time < b.end_time
     AND a.end_time > b.start_time
    WHERE a.start_time >= date_sub(DATE '${d(clock)}', 7)
    ORDER BY overlap_minutes DESC LIMIT 50"""

  /** Register views and run one of the six queries by name. */
  def run(
      spark: SparkSession,
      disruptions: DataFrame,
      stations: DataFrame,
      name: String,
      clock: Clock): DataFrame = {
    disruptions.createOrReplaceTempView("disruptions")
    stations.createOrReplaceTempView("stations")
    val sql = name match {
      case "rollingTrend" => rollingTrend(clock)
      case "stationSeverity" => stationSeverity
      case "dayOverDay" => dayOverDay
      case "peakHour" => peakHour
      case "complexAnalytics" => complexAnalytics(clock)
      case "overlapping" => overlapping(clock)
      case other => throw new IllegalArgumentException(other)
    }
    spark.sql(sql)
  }
}
