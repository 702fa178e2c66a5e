package graft.analytics

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.etl.Clock

/** SQL twin ≡ DataFrame twin for each of the six queries, on the same
  * synthetic frame as [[NsQueriesSpec]].
  */
class NsSqlQueriesSpec extends SparkSpec {

  private val clock = Clock(Instant.parse("2026-03-10T12:00:00Z"))

  private def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))

  private lazy val disruptions: DataFrame = {
    import spark.implicits._
    Seq(
      ("d1", "disruption",   "2026-03-09T08:00:00Z", "2026-03-09T09:30:00Z",  90.0, 3, "ASD,UTR"),
      ("d2", "disruption",   "2026-03-09T08:30:00Z", "2026-03-09T10:30:00Z", 120.0, 3, "ASD"),
      ("d3", "maintenance",  "2026-03-09T22:00:00Z", "2026-03-10T04:00:00Z", 360.0, 4, "RTD"),
      ("d4", "calamity",     "2026-03-10T06:00:00Z", "2026-03-10T07:00:00Z",  60.0, 5, null),
      ("d5", "cancellation", "2026-03-10T06:30:00Z", "2026-03-10T06:45:00Z",  15.0, 5, "ASD,GVC"),
      ("d6", "disruption",   "2026-03-10T09:00:00Z", "2026-03-10T09:20:00Z",  20.0, 2, "UTR"),
      ("d7", "maintenance",  "2026-01-01T00:00:00Z", "2026-01-01T08:00:00Z", 480.0, 4, "EHV"))
      .map { case (id, t, s0, e0, dur, imp, st) =>
        (id, t, s"Title $id", s"Desc $id", ts(s0), ts(e0), dur, imp, st,
          false, ts("2026-03-10T11:00:00Z"), ts("2026-03-10T11:00:00Z"))
      }
      .toDF("disruption_id", "type", "title", "description", "start_time",
        "end_time", "duration_minutes", "impact_level", "affected_stations",
        "is_resolved", "created_at", "updated_at")
  }

  private lazy val stations: DataFrame = {
    import spark.implicits._
    graft.etl.NsSchemas.stationSeed
      .toDF("station_code", "station_name", "latitude", "longitude", "country")
  }

  private def same(sqlName: String, df: DataFrame): Unit = {
    val viaSql = NsSqlQueries.run(spark, disruptions, stations, sqlName, clock)
    assert(viaSql.columns.toSeq == df.columns.toSeq, "column mismatch")
    val a = viaSql.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val b = df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(a.toSeq == b.toSeq)
  }

  test("Q1 SQL ≡ DataFrame") {
    same("rollingTrend", NsQueries.rollingTrend(disruptions, clock))
  }
  test("Q2 SQL ≡ DataFrame") {
    same("stationSeverity", NsQueries.stationSeverity(disruptions, stations))
  }
  test("Q3 SQL ≡ DataFrame") {
    same("dayOverDay", NsQueries.dayOverDay(disruptions))
  }
  test("Q4 SQL ≡ DataFrame") {
    same("peakHour", NsQueries.peakHour(disruptions))
  }
  test("Q5 SQL ≡ DataFrame") {
    same("complexAnalytics", NsQueries.complexAnalytics(disruptions, clock))
  }
  test("Q6 SQL ≡ DataFrame") {
    same("overlapping", NsQueries.overlapping(disruptions, clock))
  }
}
