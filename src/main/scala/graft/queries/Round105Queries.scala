package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.EventStreams

/** Round-11 gate: the streaming state-sizing census.
  *
  * The one streaming regime the engine's Auto doctrine cannot reach at
  * run time is the state-store instance count: it is pinned into the
  * checkpoint at first start, so the choice must be made BEFORE any
  * data flows, from batch history. This gate IS that pre-deployment
  * step as a first-class oracle-gated operator: over the `events`
  * table, for a ladder of watermark horizons, the peak number of rows
  * any in-horizon state (watermarked dedup / stream-stream join
  * buffer) would ever hold per event type — a RANGE-framed sliding
  * count over event-time seconds, maxed per (type, horizon) — and the
  * instance count [[EventStreams.recommendedStatePartitions]]
  * recommends for that peak. The recommendation function executes
  * LIVE on the driver over the census result (bounded: one row per
  * type × horizon — the Auto-probe collect shape), so a regression in
  * the sizing rule itself breaks this gate's hash, not just a spec.
  *
  * Determinism: event timestamps carry sub-second micros, so both
  * engines bucket to FLOOR seconds before the RANGE frame (Spark's
  * timestamp→long cast is floorDiv(micros, 1e6); the oracle uses
  * integer `epoch_us // 1000000`) — a round-to-nearest cast on either
  * side would shift frame membership and break the hash. Rows within
  * the same floored second are RANGE peers in both engines.
  *
  * `gateRowsPerInstance` = 64 is a GATE-SCALE divisor so the sf0.01
  * census discriminates (peaks 7–506 → 1/2/8 instances across the
  * horizon ladder); production callers keep the measured default
  * [[EventStreams.MeasuredHealthyStateRowsPerInstance]] (provenance:
  * SCALING.md round 11, the dev/StreamScale partition crossover).
  */
object Round105Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Watermark horizons the census sizes for: 30 min (the gates'
    * production lateness), one day, one week.
    */
  private val HorizonsSec = Seq(1800L, 86400L, 604800L)

  private val gateRowsPerInstance = 64L

  private def stateSizing(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      // floor-seconds bucketing (see scaladoc: cast = floorDiv micros)
      .select(col("event_type"), col("ts").cast("long").as("sec"))
    // The 100 TB shape: the heavy lifting is a shuffle-parallel
    // per-(type, second) pre-aggregation; the RANGE window then runs
    // over AT MOST one row per distinct second per type — bounded by
    // the feed's time span, not its volume (and rows in the same
    // floored second are RANGE peers, so summing per-second counts is
    // value-identical to the oracle's per-row sliding count). If the
    // span itself outgrows one task, coarsen the bucket toward the
    // horizon resolution — the census's one tunable.
    val perSec = ev.groupBy("event_type", "sec").agg(count(lit(1)).as("n"))
    // Sliding sum as a DIFFERENCE of two cumulative sums, not a bounded
    // RANGE frame: Spark's sliding-frame processor re-aggregates the
    // whole buffered frame for every output row, so a horizon that
    // spans most of the feed (one week here) makes the window
    // O(rows × frame) per type — measured 11.4 s at sf0.1 (r11
    // baseline), the single most expensive gate. Both frames below are
    // (UNBOUNDED PRECEDING, x) shapes, which Spark evaluates
    // incrementally (add-only) in O(rows) total. Equivalence is exact
    // integer arithmetic over the per-second pre-aggregate, whose `sec`
    // is DISTINCT within each type partition: for integer seconds,
    //   sum over RANGE [s-h, s]
    //     = sum over RANGE (-inf, s]          (c1)
    //     - sum over RANGE (-inf, s-(h+1)]    (c2: rows with sec < s-h)
    // with an empty c2 frame summing to null -> coalesce 0. All three
    // horizons (plus c1) share one (partitionBy type, orderBy sec)
    // sort, so the whole census is ONE exchange + ONE WindowExec pass
    // instead of three sliding-frame branches unioned (3 exchanges,
    // 3 sorts, O(rows × frame) each) — measured 11.42 -> 0.72 s.
    val byType = Window.partitionBy("event_type").orderBy("sec")
    val c1 = sum("n").over(
      byType.rangeBetween(Window.unboundedPreceding, Window.currentRow))
    def inHorizon(h: Long) = c1 - coalesce(
      sum("n").over(byType.rangeBetween(Window.unboundedPreceding, -(h + 1))),
      lit(0L))
    val withSums = perSec.select(
      col("event_type") +:
        HorizonsSec.map(h => inHorizon(h).as(s"__ih_$h")): _*)
    val peakPerType = withSums.groupBy("event_type")
      .agg(max(col(s"__ih_${HorizonsSec.head}")).as(s"__peak_${HorizonsSec.head}"),
        HorizonsSec.tail.map(h => max(col(s"__ih_$h")).as(s"__peak_$h")): _*)
    // unpivot to the census's (event_type, horizon_sec, peak) rows
    val stackArgs = HorizonsSec
      .map(h => s"${h}L, __peak_$h").mkString(", ")
    val peaks = peakPerType.select(col("event_type"),
      expr(s"stack(${HorizonsSec.size}, $stackArgs) " +
        "AS (horizon_sec, peak_state_rows)"))
    // bounded-collect: O(types × horizons) model-sized census rows —
    // the sizing rule runs LIVE on each, like q532's in-gate probe
    val sized = peaks.collect().toSeq.map { r =>
      val peak = r.getAs[Long]("peak_state_rows")
      (r.getAs[String]("event_type"), r.getAs[Long]("horizon_sec"), peak,
        EventStreams.recommendedStatePartitions(
          peak, rowsPerInstance = gateRowsPerInstance).toLong)
    }
    import s.implicits._
    sized.toDF("event_type", "horizon_sec", "peak_state_rows",
        "recommended_instances")
      .orderBy("event_type", "horizon_sec")
  }

  // ---------------------------------------- streaming state sizing
  private val q533 = QueryDef(
    "q533_state_sizing",
    stateSizing,
    Some(s"""
      WITH h AS (
        SELECT event_type, hz.horizon_sec,
               count(*) OVER (
                 PARTITION BY event_type, hz.horizon_sec
                 ORDER BY epoch_us(ts) // 1000000
                 RANGE BETWEEN hz.horizon_sec PRECEDING AND CURRENT ROW
               ) AS in_horizon
        FROM events
        CROSS JOIN (SELECT unnest([${HorizonsSec.mkString(", ")}]) AS horizon_sec) hz)
      SELECT event_type, horizon_sec,
             max(in_horizon) AS peak_state_rows,
             greatest(1, CAST(ceil(max(in_horizon) / $gateRowsPerInstance.0) AS BIGINT))
               AS recommended_instances
      FROM h
      GROUP BY event_type, horizon_sec
      ORDER BY event_type, horizon_sec"""),
    covers = Seq("STREAM-state-sizing"))

  val all: Seq[QueryDef] = Seq(q533)
}
