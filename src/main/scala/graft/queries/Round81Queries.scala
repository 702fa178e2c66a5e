package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Kmv

/** Round-81 gate additions (q424–q426): the KMV theta-sketch surface
  * ([[graft.functions.KmvMinK]]). The sketch hashes with md5 (60
  * bits), so every estimate is DETERMINISTIC and the DuckDB oracles
  * below re-derive the identical sketches with window order
  * statistics — approximate algorithms hash-gated exactly, not
  * rows-only.
  */
object Round81Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val K = 64

  /** Shared oracle CTE: per-type k-minimum distinct user hashes. */
  private val kmvCte =
    s"""h AS (SELECT DISTINCT event_type,
          CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
            AS BIGINT) AS hv
        FROM events),
      r AS (SELECT event_type, hv,
          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h),
      sk AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
          MAX(CASE WHEN rn = $K THEN hv END) AS hk
        FROM r WHERE rn <= $K GROUP BY event_type)"""

  // ------------------------------------------------- KMV distinct
  // Distinct users per event type: the bounded-memory KMV estimate
  // next to the exact count. At 100 TB the sketch ships 64 longs per
  // (partition × type) instead of every distinct user through the
  // exchange; here the gate proves the ESTIMATE ITSELF, not just row
  // counts, matches an independent engine.
  private val q424 = QueryDef(
    "q424_kmv_distinct",
    (s, dir) => {
      val e = t(s, dir, "events")
      val sk = e.groupBy("event_type")
        .agg(Kmv.sketch(s, Kmv.hash60(col("user_id")), K).as("sk"),
          countDistinct(col("user_id")).as("n_exact"))
      sk.select(col("event_type"), col("n_exact"),
          Kmv.estimate(col("sk"), K).as("n_est"))
        .withColumn("rel_err",
          abs(col("n_est") - col("n_exact").cast("double"))
            / col("n_exact").cast("double"))
        .orderBy("event_type")
    },
    Some(s"""WITH $kmvCte,
      ex AS (SELECT event_type,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events GROUP BY event_type),
      est AS (SELECT sk.event_type, n_exact,
          CASE WHEN m < $K THEN CAST(m AS DOUBLE)
               ELSE CAST(${K - 1} AS DOUBLE) * 1152921504606846976
                 / CAST(hk AS DOUBLE) END AS n_est
        FROM sk JOIN ex ON sk.event_type = ex.event_type)
      SELECT event_type, n_exact, n_est,
        abs(n_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
          AS rel_err
      FROM est ORDER BY event_type"""),
    covers = Seq("SKETCH-kmv"))

  // ------------------------------------------------- KMV intersection
  // Audience overlap between every event-type pair via theta-sketch
  // algebra — the set operation HLL cannot do. Exact overlap rides
  // along for calibration; both engines compute the identical
  // θ = min(threshold) scaling.
  private val q425 = QueryDef(
    "q425_kmv_intersection",
    (s, dir) => {
      val e = t(s, dir, "events")
      val sk = e.groupBy("event_type")
        .agg(Kmv.sketch(s, Kmv.hash60(col("user_id")), K).as("sk"))
      val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"))
      val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"))
      val pairs = a.join(b, col("type_a") < col("type_b"))
      val tu = e.select(col("event_type"), col("user_id")).distinct()
      val exact = tu.select(col("event_type").as("type_a"),
          col("user_id"))
        .join(tu.select(col("event_type").as("type_b"), col("user_id")),
          Seq("user_id"))
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n_shared_exact"))
      pairs.join(exact, Seq("type_a", "type_b"), "left")
        .withColumn("n_shared_exact", coalesce(col("n_shared_exact"), lit(0L)))
        .select(col("type_a"), col("type_b"), col("n_shared_exact"),
          Kmv.intersectEstimate(col("ska"), col("skb"), K)
            .as("n_shared_est"))
        .orderBy("type_a", "type_b")
    },
    Some(s"""WITH $kmvCte,
      mins AS (SELECT event_type, hv FROM r WHERE rn <= $K),
      th AS (SELECT event_type,
          CASE WHEN m < $K THEN CAST(1152921504606846976 AS DOUBLE)
               ELSE CAST(hk AS DOUBLE) END AS theta
        FROM sk),
      tu AS (SELECT DISTINCT event_type, user_id FROM events),
      exact AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          CAST(COUNT(*) AS BIGINT) AS n_shared_exact
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2),
      pairs AS (SELECT ta.event_type AS type_a, tb.event_type AS type_b,
          LEAST(ta.theta, tb.theta) AS theta
        FROM th ta JOIN th tb ON ta.event_type < tb.event_type),
      inter AS (SELECT ma.event_type AS type_a, mb.event_type AS type_b,
          ma.hv
        FROM mins ma JOIN mins mb
          ON ma.hv = mb.hv AND ma.event_type < mb.event_type),
      shared AS (SELECT p.type_a, p.type_b, p.theta,
          CAST(COUNT(i.hv) FILTER (WHERE CAST(i.hv AS DOUBLE) < p.theta)
            AS BIGINT) AS n_sh
        FROM pairs p LEFT JOIN inter i
          ON p.type_a = i.type_a AND p.type_b = i.type_b
        GROUP BY 1, 2, 3)
      SELECT s.type_a, s.type_b,
        COALESCE(e.n_shared_exact, 0) AS n_shared_exact,
        CAST(s.n_sh AS DOUBLE) * 1152921504606846976 / s.theta
          AS n_shared_est
      FROM shared s LEFT JOIN exact e
        ON s.type_a = e.type_a AND s.type_b = e.type_b
      ORDER BY s.type_a, s.type_b"""),
    covers = Seq("SKETCH-kmv-intersect"))

  // ------------------------------------------------- KMV union
  // Global distinct users as the k-min merge of per-type sketches —
  // the KMV union law (k smallest of a union live in the union of
  // per-part k-smallest) makes the merged sketch IDENTICAL to a
  // sketch built over the whole table, so incremental/partitioned
  // sketch maintenance loses nothing.
  private val q426 = QueryDef(
    "q426_kmv_union",
    (s, dir) => {
      val e = t(s, dir, "events")
      val merged = e.groupBy("event_type")
        .agg(Kmv.sketch(s, Kmv.hash60(col("user_id")), K).as("sk"))
        .agg(flatten(collect_list(col("sk"))).as("all_h"),
          count(lit(1)).as("n_types"))
        .select(col("n_types"),
          slice(array_sort(array_distinct(col("all_h"))), 1, K).as("sk"))
      val exact = e.agg(countDistinct(col("user_id")).as("n_exact"))
      merged.crossJoin(exact)
        .select(col("n_types"), col("n_exact"),
          Kmv.estimate(col("sk"), K).as("n_est"))
    },
    Some(s"""WITH hg AS (SELECT DISTINCT
          CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
            AS BIGINT) AS hv
        FROM events),
      rg AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hg),
      sg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
          MAX(CASE WHEN rn = $K THEN hv END) AS hk
        FROM rg WHERE rn <= $K),
      nt AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events),
      ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events)
      SELECT n_types, n_exact,
        CASE WHEN m < $K THEN CAST(m AS DOUBLE)
             ELSE CAST(${K - 1} AS DOUBLE) * 1152921504606846976
               / CAST(hk AS DOUBLE) END AS n_est
      FROM sg, nt, ex"""),
    covers = Seq("SKETCH-kmv-union"))

  val all: Seq[QueryDef] =
    Seq(q424, q425, q426)
}
