package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Round-96 gate additions (q497–q501): pipeline governance — the
  * differential-privacy contribution-bounding table, the watermark-
  * delay audit (how late do events actually arrive), session-gap
  * sensitivity, the one-row corpus curation report (q500 — the
  * summary a data-curation run ships), and order-consolidation
  * opportunity. Exact counts and integer lateness everywhere.
  */
object Round96Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- DP contribution
  // Contribution bounding for a DP release of per-type event counts:
  // per event_type, the max and P99 per-user contribution (exact
  // integer picks), P99 as the suggested clip, and the exact count
  // mass clipping would discard — the sensitivity/utility trade
  // table a DP-SQL engine needs BEFORE calibrating noise.
  private val q497 = QueryDef(
    "q497_dp_contribution",
    (s, dir) => {
      val contrib = t(s, dir, "events")
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
      val prof = contrib.groupBy("event_type")
        .agg(count(lit(1)).as("n_users"), sum("c").as("true_total"),
          max("c").as("max_contrib"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("clip"))
      contrib.join(broadcast(prof), Seq("event_type"))
        .groupBy("event_type", "n_users", "true_total", "max_contrib",
          "clip")
        .agg(sum(least(col("c"), col("clip"))).as("clipped_total"))
        .select(col("event_type"), col("n_users"), col("true_total"),
          col("max_contrib"), col("clip"), col("clipped_total"),
          ((col("true_total") - col("clipped_total")).cast("double") /
            col("true_total").cast("double")).as("loss_share"))
        .orderBy("event_type")
    },
    Some("""WITH contrib AS (SELECT event_type, user_id,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2),
      prof AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
          CAST(SUM(c) AS BIGINT) AS true_total,
          CAST(MAX(c) AS BIGINT) AS max_contrib,
          CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY c)
            AS BIGINT) AS clip
        FROM contrib GROUP BY 1)
      SELECT c.event_type, p.n_users, p.true_total, p.max_contrib,
        p.clip, CAST(SUM(LEAST(c.c, p.clip)) AS BIGINT)
          AS clipped_total,
        CAST(p.true_total - SUM(LEAST(c.c, p.clip)) AS DOUBLE) /
          CAST(p.true_total AS DOUBLE) AS loss_share
      FROM contrib c JOIN prof p ON p.event_type = c.event_type
      GROUP BY c.event_type, p.n_users, p.true_total, p.max_contrib,
        p.clip
      ORDER BY c.event_type"""),
    covers = Seq("PRIV-contribution-bound"))

  // ------------------------------------------------- lateness audit
  // Watermark-delay evidence: treating event_id as arrival order,
  // how far behind the running event-time high-water mark do events
  // arrive? Share late plus P50/P99/max lateness (exact microsecond
  // picks) — the table that justifies a withWatermark("X minutes")
  // choice instead of folklore. Global arrival order ⇒ one ordered
  // window at gate scale; at 100 TB the same audit runs per ingest
  // shard and takes the max.
  private val q498 = QueryDef(
    "q498_watermark_lateness",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), expr("unix_micros(ts)").as("us"))
      // running high-watermark over ALL EVENTS — row-scale on the
      // fact feed, converted from the single-partition window to the
      // two-phase value-bucketed form (round-12 window audit;
      // bit-identical by GlobalOrderSpec)
      val late = graft.operators.GlobalOrder.prefixMax(
          ev, col("event_id"), leadDesc = false,
          Seq(col("event_id")), col("us"), "hwm")
        .withColumn("late_us",
          greatest(lit(0L), col("hwm") - col("us")))
        .filter(col("hwm").isNotNull)
      late.agg(count(lit(1)).as("n_events"),
          sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY late_us)")
            .cast(LongType).as("p50_us"),
          expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY late_us)")
            .cast(LongType).as("p99_us"),
          max("late_us").as("max_us"))
        .select(col("n_events"), col("n_late"),
          (col("n_late").cast("double") / col("n_events").cast("double"))
            .as("late_share"),
          (col("p50_us").cast("double") / lit(1000000.0)).as("p50_sec"),
          (col("p99_us").cast("double") / lit(1000000.0)).as("p99_sec"),
          (col("max_us").cast("double") / lit(1000000.0)).as("max_sec"))
    },
    Some("""WITH ev AS (SELECT event_id,
          CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
      late AS (SELECT event_id, us,
          GREATEST(0, MAX(us) OVER (ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - us)
            AS late_us,
          MAX(us) OVER (ORDER BY event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        FROM ev)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(COUNT(*) FILTER (WHERE late_us > 0) AS BIGINT) AS n_late,
        CAST(COUNT(*) FILTER (WHERE late_us > 0) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS late_share,
        CAST(CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY late_us)
          AS BIGINT) AS DOUBLE) / 1000000.0 AS p50_sec,
        CAST(CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY late_us)
          AS BIGINT) AS DOUBLE) / 1000000.0 AS p99_sec,
        CAST(MAX(late_us) AS DOUBLE) / 1000000.0 AS max_sec
      FROM late WHERE hwm IS NOT NULL"""),
    covers = Seq("STREAM-lateness-audit"))

  // ------------------------------------------------- gap sensitivity
  // How much does the session count depend on the inactivity
  // threshold? Sessions at 10/30/60-minute gaps from ONE lag pass:
  // a session starts where the user's gap exceeds the threshold —
  // exact integer micros compares, one division for events/session.
  private val q499 = QueryDef(
    "q499_session_gap_sensitivity",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"),
        col("event_id"))
      val gaps = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("unix_micros(ts)").as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("gap_us", col("us") - col("prev_us"))
      // all three thresholds fold into ONE conditional aggregation
      // over one pass of the gap stream (was: a checkpoint plus a
      // separate count job per threshold), then unpivot via stack —
      // no driver action in the gate at all
      def starts(g: Long): Column =
        sum(when(col("prev_us").isNull ||
          col("gap_us") > g * 1000000L, 1L).otherwise(0L))
      gaps.agg(count(lit(1)).as("n"), starts(600L).as("s600"),
          starts(1800L).as("s1800"), starts(3600L).as("s3600"))
        .select(expr("stack(3, CAST(600 AS BIGINT), s600, " +
          "CAST(1800 AS BIGINT), s1800, CAST(3600 AS BIGINT), s3600)")
          .as(Seq("gap_seconds", "n_sessions")), col("n").as("n_events"))
        .withColumn("events_per_session",
          col("n_events").cast("double") / col("n_sessions").cast("double"))
        .orderBy("gap_seconds")
    },
    Some("""WITH gaps AS (SELECT user_id,
          CAST(epoch_us(ts) AS BIGINT) AS us,
          lag(CAST(epoch_us(ts) AS BIGINT), 1) OVER (
            PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events),
      gs AS (SELECT CAST(unnest([600, 1800, 3600]) AS BIGINT)
          AS gap_seconds),
      stats AS (SELECT g.gap_seconds,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM gaps
            WHERE prev_us IS NULL
              OR us - prev_us > g.gap_seconds * 1000000) AS n_sessions,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM gaps) AS n_events
        FROM gs g)
      SELECT gap_seconds, n_sessions, n_events,
        CAST(n_events AS DOUBLE) / CAST(n_sessions AS DOUBLE)
          AS events_per_session
      FROM stats ORDER BY gap_seconds"""),
    covers = Seq("STREAM-gap-sensitivity"))

  // ------------------------------------------------- curation report
  // q500: the one-row corpus curation report — document and token
  // inventory, language breadth, exact-duplicate mass, verified
  // near-dup pairs and their transitive clusters, the removable-doc
  // count, and the Gopher-style quality-fail census (top-term share
  // ≥ 25% or < 10 tokens). The summary every curation run ships;
  // each field is an exact count from a pipeline gated separately
  // elsewhere.
  private val q500 = QueryDef(
    "q500_curation_report",
    (s, dir) => {
      val docs = t(s, dir, "documents").localCheckpoint()
      // doc-level inventory and the whole token census in TWO actions
      // instead of five: one agg over docs, and one explode → per-
      // (doc, term) counts → per-doc rollup (n_tok = Σc, top_c =
      // max c) → corpus rollup — the previous shape exploded the
      // corpus twice and joined the halves back.
      val byTok = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("tk"))
        .groupBy("doc_id", "tk").agg(count(lit(1)).as("c"))
      val perDoc = byTok.groupBy("doc_id")
        .agg(sum("c").as("n_tok"), max("c").as("top_c"))
      val head = docs.agg(count(lit(1)).as("n_docs"),
          countDistinct("lang").as("n_langs"),
          countDistinct("text").as("n_uniq"))
        .crossJoin(perDoc.agg(sum("n_tok").as("n_tokens"),
          sum(when(col("n_tok") < 10 ||
            lit(4L) * col("top_c") >= col("n_tok"), 1L).otherwise(0L))
            .as("n_quality_fail")))
        // bounded-collect: one fully-aggregated summary row
        .collect()(0)
      val nDocs = head.getLong(0)
      val nLangs = head.getLong(1)
      val nUniqueTexts = head.getLong(2)
      val totalTok = head.getLong(3)
      val quality = head.getLong(4)
      // q500's pair set IS q22's pipeline — read the session-cached
      // copy (see Round44's q289 note; the oracle re-derives it)
      val pairs = GraphGateSource.cached(s, "q22-pairs:" + dir)(
          graft.SparkEntry.queries("q22_ngram_jaccard")(s, dir))
        .select(col("doc_a"), col("doc_b"))
      val nPairs = pairs.count()
      val clusters = graft.dedup.Dedup.clusters(pairs)
        .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      // bounded-collect: one fully-aggregated summary row
      val sums = clusters.agg(count(lit(1)).as("n_clusters"),
        sum("sz").as("n_clustered")).collect()(0)
      val removable = sums.getLong(1) - sums.getLong(0)
      import s.implicits._
      Seq((nDocs, nLangs, totalTok, nDocs - nUniqueTexts, nPairs,
        sums.getLong(0), removable, quality))
        .toDF("n_docs", "n_langs", "n_tokens", "n_exact_dups",
          "n_neardup_pairs", "n_clusters", "n_removable",
          "n_quality_fail")
        .withColumn("keep_rate",
          (col("n_docs") - col("n_exact_dups") - col("n_removable") -
            col("n_quality_fail")).cast("double") /
            col("n_docs").cast("double"))
    },
    Some("""WITH RECURSIVE docs AS (SELECT * FROM documents),
      toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk
        FROM docs),
      tok AS (SELECT doc_id, unnest(tk) AS tk FROM toksrc),
      tok_stats AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM tok GROUP BY 1),
      top_share AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_c
        FROM (SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        GROUP BY 1),
      quality AS (SELECT CAST(COUNT(*) AS BIGINT) AS nq
        FROM tok_stats t JOIN top_share s ON s.doc_id = t.doc_id
        WHERE t.n_tok < 10 OR 4 * s.top_c >= t.n_tok),
      sh AS (SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
        FROM toksrc WHERE len(tk) >= 3),
      sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh
        GROUP BY 1),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(COUNT(*) AS BIGINT) AS common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM p0
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.4),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        FROM reach GROUP BY a),
      cstats AS (SELECT CAST(COUNT(DISTINCT cluster_id) AS BIGINT)
          AS n_clusters,
          CAST(COUNT(*) AS BIGINT) AS n_clustered
        FROM comp)
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM docs) AS n_docs,
        (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM docs)
          AS n_langs,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM tok) AS n_tokens,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM docs) -
          (SELECT CAST(COUNT(DISTINCT text) AS BIGINT) FROM docs)
          AS n_exact_dups,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs)
          AS n_neardup_pairs,
        c.n_clusters,
        c.n_clustered - c.n_clusters AS n_removable,
        q.nq AS n_quality_fail,
        CAST((SELECT COUNT(*) FROM docs) -
          ((SELECT COUNT(*) FROM docs) -
            (SELECT COUNT(DISTINCT text) FROM docs)) -
          (c.n_clustered - c.n_clusters) - q.nq AS DOUBLE) /
          CAST((SELECT COUNT(*) FROM docs) AS DOUBLE) AS keep_rate
      FROM cstats c CROSS JOIN quality q"""),
    covers = Seq("LLM-curation-report"))

  // ------------------------------------------------- consolidation
  // Shipping-consolidation opportunity: customers placing multiple
  // orders on the same day — the extra orders are mergeable
  // shipments. Multi-order days, extra-order count and share, and
  // the mean orders per multi-day, all exact.
  private val q501 = QueryDef(
    "q501_order_consolidation",
    (s, dir) => {
      val perDay = t(s, dir, "orders")
        .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("c"))
      perDay.agg(count(lit(1)).as("n_cust_days"),
          sum("c").as("n_orders"),
          sum(when(col("c") >= 2, 1L).otherwise(0L)).as("n_multi_days"),
          sum(when(col("c") >= 2, col("c") - 1L).otherwise(0L))
            .as("n_extra_orders"),
          sum(when(col("c") >= 2, col("c")).otherwise(0L))
            .as("n_multi_orders"))
        .select(col("n_cust_days"), col("n_orders"), col("n_multi_days"),
          col("n_extra_orders"),
          (col("n_extra_orders").cast("double") /
            col("n_orders").cast("double")).as("consolidatable_share"),
          (col("n_multi_orders").cast("double") /
            col("n_multi_days").cast("double")).as("orders_per_multi_day"))
    },
    Some("""WITH per_day AS (SELECT o_custkey,
          CAST(o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1, 2)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cust_days,
        CAST(SUM(c) AS BIGINT) AS n_orders,
        CAST(COUNT(*) FILTER (WHERE c >= 2) AS BIGINT) AS n_multi_days,
        CAST(SUM(CASE WHEN c >= 2 THEN c - 1 ELSE 0 END) AS BIGINT)
          AS n_extra_orders,
        CAST(SUM(CASE WHEN c >= 2 THEN c - 1 ELSE 0 END) AS DOUBLE) /
          CAST(SUM(c) AS DOUBLE) AS consolidatable_share,
        CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS DOUBLE) /
          CAST(COUNT(*) FILTER (WHERE c >= 2) AS DOUBLE)
          AS orders_per_multi_day
      FROM per_day"""),
    covers = Seq("OPS-consolidation"))

  val all: Seq[QueryDef] = Seq(q497, q498, q499, q500, q501)
}
