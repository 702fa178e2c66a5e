package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-65 gate additions (q344–q348): preprocessing plans and
  * structural audits — outlier clipping, basket depth, experiment
  * split balance, peak detection, and inverted-index gap statistics.
  */
object Round65Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Q = 1048576L // 2^20 fixed-point scale

  // ------------------------------------------------- clip plan
  // The outlier-clipping plan a feature-normalization step ships:
  // per probe dimension, exact P1/P99 thresholds (percentile_disc on
  // quantized values — order statistics, no interpolation) and the
  // fraction of values outside them. Thresholds aggregate to 8 rows
  // and broadcast back; the outside-count is one more scan.
  private val q344 = QueryDef(
    "q344_embedding_clip_plan",
    (s, dir) => {
      val dims = 0 until 64 by 8
      val e = t(s, dir, "embeddings").select(
        dims.map(d => floor(element_at(col("embedding"), d + 1).cast("double")
          * lit(Q.toDouble)).cast(LongType).as(s"q$d")): _*)
      val long = e.select(explode(array(dims.map(d =>
        struct(lit(d.toLong).as("dim"), col(s"q$d").as("qv"))): _*)).as("p"))
        .select(col("p.dim"), col("p.qv"))
      val th = long.groupBy("dim").agg(
        expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY qv)")
          .cast(LongType).as("p01"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY qv)")
          .cast(LongType).as("p99"))
      long.join(broadcast(th), Seq("dim"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"),
          first(col("p01")).as("p01"), first(col("p99")).as("p99"),
          sum(when(col("qv") < col("p01") || col("qv") > col("p99"), 1L)
            .otherwise(0L)).as("n_clipped"))
        .select(col("dim"),
          (col("p01").cast("double") / lit(Q.toDouble)).as("lo"),
          (col("p99").cast("double") / lit(Q.toDouble)).as("hi"),
          col("n_clipped"),
          (col("n_clipped").cast("double") / col("n").cast("double"))
            .as("clip_rate"))
        .orderBy("dim")
    },
    Some("""WITH dims AS (SELECT unnest([0,8,16,24,32,40,48,56]) AS d),
      lng AS (SELECT CAST(d AS BIGINT) AS dim,
          CAST(floor(CAST(embedding[d + 1] AS DOUBLE) * 1048576) AS BIGINT)
            AS qv
        FROM embeddings, dims),
      th AS (SELECT dim,
          CAST(percentile_disc(0.01) WITHIN GROUP (ORDER BY qv) AS BIGINT)
            AS p01,
          CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY qv) AS BIGINT)
            AS p99
        FROM lng GROUP BY dim),
      g AS (SELECT lng.dim, CAST(COUNT(*) AS BIGINT) AS n,
          MIN(p01) AS p01, MIN(p99) AS p99,
          CAST(SUM(CASE WHEN qv < p01 OR qv > p99 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped
        FROM lng JOIN th USING (dim)
        GROUP BY lng.dim)
      SELECT dim,
        CAST(p01 AS DOUBLE) / CAST(1048576 AS DOUBLE) AS lo,
        CAST(p99 AS DOUBLE) / CAST(1048576 AS DOUBLE) AS hi,
        n_clipped,
        CAST(n_clipped AS DOUBLE) / CAST(n AS DOUBLE) AS clip_rate
      FROM g ORDER BY dim"""),
    covers = Seq("SIM-clip-plan"))

  // ------------------------------------------------- basket depth
  // Mean order value as a function of basket depth (line count):
  // does a deeper basket mean proportionally more revenue? Per-order
  // rollup, then depth buckets with exact DECIMAL totals and one
  // division — the curve a pricing model reads.
  private val q345 = QueryDef(
    "q345_basket_depth_curve",
    (s, dir) => {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      val per = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("depth"), sum(rev).as("r"))
      per.groupBy("depth")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("r")).cast(DecimalType(38, 4)).as("tot"))
        .select(col("depth"), col("n_orders"),
          (col("tot").cast("double") / col("n_orders").cast("double"))
            .as("mean_order_value"),
          (col("tot").cast("double") /
            (col("n_orders") * col("depth")).cast("double"))
            .as("mean_line_value"))
        .orderBy("depth")
    },
    Some("""WITH per AS (SELECT l_orderkey,
          CAST(COUNT(*) AS BIGINT) AS depth,
          SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4))) AS r
        FROM lineitem GROUP BY l_orderkey),
      g AS (SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_orders,
          CAST(SUM(r) AS DECIMAL(38,4)) AS tot
        FROM per GROUP BY depth)
      SELECT depth, n_orders,
        CAST(tot AS DOUBLE) / CAST(n_orders AS DOUBLE) AS mean_order_value,
        CAST(tot AS DOUBLE) / CAST(n_orders * depth AS DOUBLE)
          AS mean_line_value
      FROM g ORDER BY depth"""),
    covers = Seq("A-basket-depth"))

  // ------------------------------------------------- A/B split balance
  // Sample-ratio-mismatch audit for a deterministic md5-parity
  // experiment split of the corpus: arm sizes with the chi-square
  // statistic against 50/50, plus per-arm mean length — the balance
  // check run before trusting any experiment readout. All counts
  // exact; chi² = (a−b)²/(a+b) over exact longs.
  private val q346 = QueryDef(
    "q346_ab_srm_check",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("arm",
          (conv(substring(md5(col("text")), 1, 8), 16, 10)
            .cast(LongType) % 2).cast(LongType))
      val g = d.groupBy("arm")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("schars"))
      val wide = g.agg(
        sum(when(col("arm") === 0, col("n_docs")).otherwise(0L)).as("a"),
        sum(when(col("arm") === 1, col("n_docs")).otherwise(0L)).as("b"),
        sum(when(col("arm") === 0, col("schars")).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1, col("schars")).otherwise(0L)).as("cb"))
      wide.select(col("a").as("arm_a"), col("b").as("arm_b"),
        (((col("a") - col("b")) * (col("a") - col("b"))).cast("double") /
          (col("a") + col("b")).cast("double")).as("srm_chi2"),
        (col("ca").cast("double") / col("a").cast("double"))
          .as("mean_chars_a"),
        (col("cb").cast("double") / col("b").cast("double"))
          .as("mean_chars_b"))
    },
    Some("""WITH d AS (SELECT n_chars,
          CAST(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 2
            AS BIGINT) AS arm
        FROM documents),
      g AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS schars
        FROM d GROUP BY arm),
      wide AS (SELECT
          CAST(SUM(CASE WHEN arm = 0 THEN n_docs ELSE 0 END) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN arm = 1 THEN n_docs ELSE 0 END) AS BIGINT) AS b,
          CAST(SUM(CASE WHEN arm = 0 THEN schars ELSE 0 END) AS BIGINT)
            AS ca,
          CAST(SUM(CASE WHEN arm = 1 THEN schars ELSE 0 END) AS BIGINT)
            AS cb
        FROM g)
      SELECT a AS arm_a, b AS arm_b,
        CAST((a - b) * (a - b) AS DOUBLE) / CAST(a + b AS DOUBLE)
          AS srm_chi2,
        CAST(ca AS DOUBLE) / CAST(a AS DOUBLE) AS mean_chars_a,
        CAST(cb AS DOUBLE) / CAST(b AS DOUBLE) AS mean_chars_b
      FROM wide"""),
    covers = Seq("SAMPLE-srm"))

  // ------------------------------------------------- peak days
  // Local-maximum detection on the daily volume series per event
  // type: days strictly above both neighbors (lag/lead over the date
  // order), counted and the tallest peak reported — the alarm-day
  // census of a monitoring pipeline.
  private val q347 = QueryDef(
    "q347_peak_days",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("d")
      val flagged = daily
        .withColumn("prev", lag(col("x"), 1).over(w))
        .withColumn("nxt", lead(col("x"), 1).over(w))
        .filter(col("prev").isNotNull && col("nxt").isNotNull)
        .withColumn("is_peak", col("x") > col("prev") && col("x") > col("nxt"))
      flagged.groupBy("event_type")
        .agg(count(lit(1)).as("n_interior_days"),
          sum(when(col("is_peak"), 1L).otherwise(0L)).as("n_peaks"),
          max(when(col("is_peak"), col("x")).otherwise(lit(null)))
            .as("tallest_peak"))
        .withColumn("peak_rate",
          col("n_peaks").cast("double") / col("n_interior_days").cast("double"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, d),
      f AS (SELECT event_type, x,
          lag(x) OVER (PARTITION BY event_type ORDER BY d) AS prev,
          lead(x) OVER (PARTITION BY event_type ORDER BY d) AS nxt
        FROM daily)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_interior_days,
        CAST(SUM(CASE WHEN x > prev AND x > nxt THEN 1 ELSE 0 END)
          AS BIGINT) AS n_peaks,
        MAX(CASE WHEN x > prev AND x > nxt THEN x END) AS tallest_peak,
        CAST(SUM(CASE WHEN x > prev AND x > nxt THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS peak_rate
      FROM f WHERE prev IS NOT NULL AND nxt IS NOT NULL
      GROUP BY event_type
      ORDER BY event_type"""),
    covers = Seq("TS-peaks"))

  // ------------------------------------------------- postings gaps
  // Inverted-index compressibility audit: for each top-20 term, the
  // doc_id postings-list delta-gap statistics (mean gap from the
  // span/(n−1) identity — no per-gap pass — and the exact max gap
  // from one lag window). Small mean gaps = dense postings = cheap
  // delta encoding; the table says which terms index well.
  private val q348 = QueryDef(
    "q348_postings_gaps",
    (s, dir) => {
      val post = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .distinct()
      val top = post.groupBy("term").agg(count(lit(1)).as("df"))
        .orderBy(desc("df"), asc("term")).limit(20)
      val w = Window.partitionBy("term").orderBy("doc_id")
      val gaps = post.join(broadcast(top), Seq("term"))
        .withColumn("gap", col("doc_id") - lag(col("doc_id"), 1).over(w))
      gaps.groupBy("term")
        .agg(first(col("df")).as("df"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"),
          max(col("gap")).as("max_gap"))
        .select(col("term"), col("df"), col("max_gap"),
          ((col("last_doc") - col("first_doc")).cast("double") /
            (col("df") - 1L).cast("double")).as("mean_gap"))
        .orderBy(desc("df"), asc("term"))
    },
    Some("""WITH post AS (SELECT DISTINCT doc_id, term
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents)),
      top AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM post GROUP BY term
              ORDER BY df DESC, term LIMIT 20),
      gaps AS (SELECT post.term, df, doc_id,
          doc_id - lag(doc_id) OVER (PARTITION BY post.term ORDER BY doc_id)
            AS gap
        FROM post JOIN top USING (term))
      SELECT term, CAST(MIN(df) AS BIGINT) AS df,
        CAST(MAX(gap) AS BIGINT) AS max_gap,
        CAST(MAX(doc_id) - MIN(doc_id) AS DOUBLE)
          / CAST(MIN(df) - 1 AS DOUBLE) AS mean_gap
      FROM gaps GROUP BY term
      ORDER BY df DESC, term"""),
    covers = Seq("TXT-postings-gaps"))

  val all: Seq[QueryDef] =
    Seq(q344, q345, q346, q347, q348)
}
