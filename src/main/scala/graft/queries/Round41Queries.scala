package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-41 gate additions (q282+): the skyline operator and run-length
  * encoding of event sequences.
  */
object Round41Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- skyline
  // 2-D skyline (Pareto frontier): per segment, the orders no other
  // order beats on BOTH date and price (minimize each; strict in at
  // least one coordinate). The classic O(n²) domination test
  // collapses to two window minima over ONE sort: a row is dominated
  // iff an earlier-date row has price ≤ p (min over a RANGE frame
  // ending 1 day back) or a same-date row has price < p (min over the
  // date partition). All compares are exact DECIMAL/integer — no
  // float boundary picks the frontier — and the windows share the
  // (segment, day) sort, so Catalyst plans one Exchange + one sort.
  private val q282 = QueryDef(
    "q282_skyline",
    (s, dir) => {
      val o = t(s, dir, "orders").join(
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderkey"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("p"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
            .cast("long").as("ed"))
      val wEarlier = Window.partitionBy("seg").orderBy("ed")
        .rangeBetween(Window.unboundedPreceding, -1)
      val wSameDay = Window.partitionBy("seg", "ed")
      o.withColumn("m_earlier", min(col("p")).over(wEarlier))
        .withColumn("m_same", min(col("p")).over(wSameDay))
        .filter((col("m_earlier").isNull || col("m_earlier") > col("p")) &&
          col("m_same") >= col("p"))
        .select(col("seg"), col("o_orderkey"), col("ed"),
          col("p").cast("double").as("price"))
        .orderBy("seg", "ed", "o_orderkey")
    },
    Some("""WITH o AS (SELECT c_mktsegment AS seg, o_orderkey,
          CAST(o_totalprice AS DECIMAL(18,2)) AS p,
          CAST(DATE_DIFF('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS ed
        FROM orders JOIN customer ON o_custkey = c_custkey),
      w AS (SELECT *,
          MIN(p) OVER (PARTITION BY seg ORDER BY ed
            RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_earlier,
          MIN(p) OVER (PARTITION BY seg, ed) AS m_same
        FROM o)
      SELECT seg, o_orderkey, ed, CAST(p AS DOUBLE) AS price
      FROM w
      WHERE (m_earlier IS NULL OR m_earlier > p) AND m_same >= p
      ORDER BY seg, ed, o_orderkey"""),
    covers = Seq("A-skyline"))

  // ------------------------------------------------- event RLE
  // Run-length encoding of per-user event streams: consecutive
  // repeats of the same event type collapse to (type, run_length,
  // start, end) — the gaps-and-islands shape that compresses bursty
  // telemetry and feeds sequence models fixed-alphabet runs. Island
  // ids are a running SUM of integer lag-flips (one window), the
  // per-island rollup is exact counts and min/max µs — partitioned by
  // user end to end, so the plan is one user shuffle at any scale.
  private val q283 = QueryDef(
    "q283_event_rle",
    (s, dir) => {
      val wSeq = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
      val wRun = Window.partitionBy("user_id")
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val e = t(s, dir, "events")
        .filter(col("user_id") % 20 === 0)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      e.withColumn("flip",
          when(lag(col("event_type"), 1).over(wSeq).isNull, 1L)
            .when(lag(col("event_type"), 1).over(wSeq) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("flip")).over(wRun))
        // event_type is constant within an island, so it can be a
        // GROUP key — keeping it out of the aggregation buffer keeps
        // the rollup on the HashAggregate path (a first()/min() string
        // buffer would demote to SortAggregate, PlanAudit's flag)
        .groupBy("user_id", "island", "event_type")
        .agg(count(lit(1)).as("run_len"),
          min(col("us")).as("start_us"),
          max(col("us")).as("end_us"))
        .select(col("user_id"), col("island"), col("event_type"),
          col("run_len"), col("start_us"), col("end_us"))
        .orderBy("user_id", "island")
    },
    Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us, ts
        FROM events WHERE user_id % 20 = 0),
      f AS (SELECT *,
          CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) IS NULL THEN 1
               WHEN LAG(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) <> event_type THEN 1
               ELSE 0 END AS flip
        FROM e),
      i AS (SELECT *,
          CAST(SUM(flip) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS island
        FROM f)
      SELECT user_id, island, MIN(event_type) AS event_type,
        CAST(COUNT(*) AS BIGINT) AS run_len,
        MIN(us) AS start_us, MAX(us) AS end_us
      FROM i GROUP BY user_id, island ORDER BY user_id, island"""),
    covers = Seq("TS-rle"))

  val all: Seq[QueryDef] =
    Seq(q282, q283)
}
