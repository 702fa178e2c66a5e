package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-39 gate additions (q278+): conversion attribution and
  * magnitude histograms.
  */
object Round39Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- attribution
  // First-touch vs last-touch conversion attribution: every purchase
  // credits the first and the last click/view that preceded it within
  // a 7-day lookback. The candidate join keys on user_id (ONE hash
  // shuffle; per-user event counts are bounded, so the per-key fanout
  // is too), then row_number under two total orders picks the two
  // touches. Latencies are integer seconds (µs div 10⁶); the per-
  // (model, touch-type) mean is one division of exact longs.
  private val q278 = QueryDef(
    "q278_attribution",
    (s, dir) => {
      val e = t(s, dir, "events")
      val touches = e.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_id").as("t_id"),
          col("event_type").as("touch_type"),
          unix_micros(col("ts")).as("t_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"),
          unix_micros(col("ts")).as("p_us"))
      val lookbackUs = 7L * 86400L * 1000000L
      val cand = purchases.join(touches, "user_id")
        .filter(col("t_us") <= col("p_us") &&
          col("t_us") > col("p_us") - lookbackUs)
      val wFirst = Window.partitionBy("p_id")
        .orderBy(asc("t_us"), asc("t_id"))
      val wLast = Window.partitionBy("p_id")
        .orderBy(desc("t_us"), desc("t_id"))
      val attributed = cand
        .withColumn("rn_first", row_number().over(wFirst))
        .withColumn("rn_last", row_number().over(wLast))
      val first = attributed.filter(col("rn_first") === 1)
        .select(lit("first_touch").as("model"), col("touch_type"),
          expr("(p_us - t_us) div 1000000").as("latency_s"))
      val last = attributed.filter(col("rn_last") === 1)
        .select(lit("last_touch").as("model"), col("touch_type"),
          expr("(p_us - t_us) div 1000000").as("latency_s"))
      first.unionByName(last)
        .groupBy("model", "touch_type")
        .agg(count(lit(1)).as("n_conversions"),
          sum(col("latency_s")).as("lat_sum"))
        .select(col("model"), col("touch_type"), col("n_conversions"),
          (col("lat_sum").cast("double") / col("n_conversions").cast("double"))
            .as("mean_latency_s"))
        .orderBy("model", "touch_type")
    },
    Some("""WITH touches AS (SELECT user_id, event_id AS t_id,
          event_type AS touch_type, epoch_us(ts) AS t_us
        FROM events WHERE event_type IN ('click', 'view')),
      purchases AS (SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'),
      cand AS (SELECT p.p_id, t.touch_type, p.p_us, t.t_us, t.t_id
        FROM purchases p JOIN touches t USING (user_id)
        WHERE t.t_us <= p.p_us
          AND t.t_us > p.p_us - 7 * 86400 * CAST(1000000 AS BIGINT)),
      attributed AS (SELECT *,
          ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_us ASC, t_id ASC)
            AS rn_first,
          ROW_NUMBER() OVER (PARTITION BY p_id ORDER BY t_us DESC, t_id DESC)
            AS rn_last
        FROM cand),
      unioned AS (
        SELECT 'first_touch' AS model, touch_type,
          (p_us - t_us) // 1000000 AS latency_s
        FROM attributed WHERE rn_first = 1
        UNION ALL
        SELECT 'last_touch' AS model, touch_type,
          (p_us - t_us) // 1000000 AS latency_s
        FROM attributed WHERE rn_last = 1)
      SELECT model, touch_type,
        CAST(COUNT(*) AS BIGINT) AS n_conversions,
        CAST(SUM(latency_s) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS mean_latency_s
      FROM unioned GROUP BY 1, 2 ORDER BY model, touch_type"""),
    covers = Seq("A-attribution"))

  // ------------------------------------------------- magnitude hist
  // Power-of-two magnitude histogram of order value: bucket
  // ⌊log2(cents)⌋ computed EXACTLY as the binary-digit count of the
  // integer (conv ↔ bin string length — no floating log, so no libm
  // at all), with the bucket bounds reconstructed by integer shifts.
  // The log-scaled histogram that sizes sketches and spots heavy
  // tails, gated bit-exactly. One aggregate on (priority, bucket).
  private val q279 = QueryDef(
    "q279_magnitude_hist",
    (s, dir) => {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")
      t(s, dir, "orders")
        .select(col("o_orderpriority").as("p"), cents.as("cents"))
        .filter(col("cents") > 0)
        .withColumn("bucket",
          (length(conv(col("cents"), 10, 2)) - 1).cast("long"))
        .groupBy("p", "bucket")
        .agg(count(lit(1)).as("n"),
          min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"))
        .withColumn("lo", expr("shiftleft(1L, cast(bucket as int))"))
        .withColumn("hi", expr("shiftleft(1L, cast(bucket + 1 as int)) - 1L"))
        .select(col("p"), col("bucket"), col("lo"), col("hi"), col("n"),
          col("min_cents"), col("max_cents"))
        .orderBy("p", "bucket")
    },
    Some("""WITH o AS (SELECT o_orderpriority AS p,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM orders),
      b AS (SELECT p, cents,
          CAST(length(bin(cents)) - 1 AS BIGINT) AS bucket
        FROM o WHERE cents > 0)
      SELECT p, bucket,
        CAST(1 AS BIGINT) << bucket AS lo,
        (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS hi,
        CAST(COUNT(*) AS BIGINT) AS n,
        MIN(cents) AS min_cents, MAX(cents) AS max_cents
      FROM b GROUP BY p, bucket ORDER BY p, bucket"""),
    covers = Seq("AGG-magnitude-hist"))

  val all: Seq[QueryDef] =
    Seq(q278, q279)
}
