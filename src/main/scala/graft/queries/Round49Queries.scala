package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-49 gate addition (q295): session bounce rates from gap-based
  * sessionization.
  */
object Round49Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- bounce rate
  // Daily bounce rate: share of sessions (30-minute inactivity gaps,
  // q42's sessionization rule) that contain exactly ONE event — the
  // engagement metric every product dashboard leads with. Session ids
  // are a running sum of integer gap-flips per user (the q283 island
  // technique on time instead of type); each session dates to its
  // FIRST event's day; per-day tallies are exact counts and the rate
  // is one division. One user-partitioned window pass + two
  // aggregates — no self-joins at any scale.
  private val q295 = QueryDef(
    "q295_bounce_rate",
    (s, dir) => {
      val gapUs = 30L * 60L * 1000000L
      val wSeq = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      val wRun = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val e = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val sessions = e
        .withColumn("prev", lag(col("us"), 1).over(wSeq))
        .withColumn("flip",
          when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("flip")).over(wRun))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"))
      sessions
        .withColumn("d", to_date(timestamp_micros(col("start_us"))))
        .groupBy("d")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1L, 1L).otherwise(0L)).as("bounces"))
        .select(col("d"), col("n_sessions"), col("bounces"),
          (col("bounces").cast("double") / col("n_sessions").cast("double"))
            .as("bounce_rate"))
        .orderBy("d")
    },
    Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
      f AS (SELECT *,
          CASE WHEN LAG(us) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) IS NULL
               OR us - LAG(us) OVER (PARTITION BY user_id
                 ORDER BY us, event_id) > 30 * 60 * CAST(1000000 AS BIGINT)
               THEN 1 ELSE 0 END AS flip
        FROM e),
      i AS (SELECT *,
          CAST(SUM(flip) OVER (PARTITION BY user_id ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS sid
        FROM f),
      sess AS (SELECT user_id, sid,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          MIN(us) AS start_us
        FROM i GROUP BY 1, 2),
      daily AS (SELECT CAST(make_timestamp(start_us) AS DATE) AS d,
          CAST(COUNT(*) AS BIGINT) AS n_sessions,
          CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS bounces
        FROM sess GROUP BY 1)
      SELECT d, n_sessions, bounces,
        CAST(bounces AS DOUBLE) / CAST(n_sessions AS DOUBLE) AS bounce_rate
      FROM daily ORDER BY d"""),
    covers = Seq("A-bounce-rate"))

  val all: Seq[QueryDef] =
    Seq(q295)
}
