package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Round-9 gate additions (q176+): corpus-order novelty attribution,
  * integer-quantized label centroids, timestamp-interval RANGE
  * frames, and the SQL-syntax PIVOT surface.
  *
  * Determinism rules as everywhere (QueryDef scaladoc): exact integer
  * / DECIMAL state, doubles only from ONE shared IEEE tree, BIGINT
  * casts on the DuckDB side, total ORDER BY.
  */
object Round9Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------- n-gram novelty curve
  // Ingestion-order novelty: treating doc_id as arrival order, a
  // doc's novelty is the fraction of its distinct 5-grams whose FIRST
  // corpus occurrence is that doc (min doc_id over the gram's
  // postings). The curve is the standard diminishing-returns
  // diagnostic for crawl scheduling — when novelty flattens, the
  // source is mined out. Two keyed shuffles regardless of corpus
  // size: gram→min(doc) aggregate, postings⋈first re-join; ties
  // (gram first seen twice in one doc) are impossible because
  // postings are per-doc DISTINCT.
  private val q176 = QueryDef(
    "q176_ngram_novelty",
    (s, dir) => {
      val post = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.WordShingles(s, col("text"), 5)).as("g"))
        .distinct()
      val first = post.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
      post.join(first, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty",
          col("n_novel").cast("double") / col("n_grams").cast("double"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      gi AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i
             FROM d WHERE len(tk) >= 5),
      post AS (SELECT DISTINCT doc_id,
                 tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                 tk[i+3] || ' ' || tk[i+4] AS g
               FROM gi),
      first AS (SELECT g, MIN(doc_id) AS first_doc FROM post GROUP BY g)
      SELECT p.doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_grams,
        CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        CAST(SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS novelty
      FROM post p JOIN first f USING (g)
      GROUP BY p.doc_id ORDER BY p.doc_id"""),
    covers = Seq("TEXT-novelty"))

  // ------------------------------------------- label centroids (quantized)
  // Per-label embedding centroids through exact integer arithmetic:
  // each float coordinate scales by 2^20 (a power of two, so the
  // double multiply and floor are EXACT), sums accumulate as BIGINT
  // (order-independent), and the centroid surfaces as one double
  // division — bit-identical under any partitioning, unlike a naive
  // float mean. The classifier-diagnostics shape: posexplode to
  // (label, dim, q), one groupBy — at 100 TB this is the standard
  // "collapse the corpus to per-class statistics" pass.
  private val q177 = QueryDef(
    "q177_label_centroids",
    (s, dir) => {
      val q = t(s, dir, "embeddings")
        .select(col("label"),
          posexplode(transform(col("embedding"),
            x => floor(x.cast("double") * lit(1048576d)).cast(LongType)))
            .as(Seq("dim", "qv")))
        .filter(col("dim") % 16 === 0)
      q.groupBy("label", "dim")
        .agg(count(lit(1)).as("n_vecs"), sum(col("qv")).as("qsum"))
        .select(col("label"), col("dim"), col("n_vecs"),
          (col("qsum").cast("double") /
            (col("n_vecs") * 1048576L).cast("double")).as("centroid"))
        .orderBy("label", "dim")
    },
    Some("""WITH e AS (SELECT label, embedding FROM embeddings),
      qi AS (SELECT label, tk.i - 1 AS dim,
               CAST(floor(CAST(embedding[tk.i] AS DOUBLE) * 1048576) AS BIGINT) AS qv
             FROM e, (SELECT unnest(generate_series(1, 64)) AS i) tk
             WHERE (tk.i - 1) % 16 = 0),
      g AS (SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n_vecs,
              CAST(SUM(qv) AS BIGINT) AS qsum
            FROM qi GROUP BY 1, 2)
      SELECT label, dim, n_vecs,
        CAST(qsum AS DOUBLE) / CAST(n_vecs * 1048576 AS DOUBLE) AS centroid
      FROM g WHERE dim % 16 = 0
      ORDER BY label, dim"""),
    covers = Seq("SIM-centroids"))

  // ------------------------------------- timestamp-interval RANGE frame
  // RANGE BETWEEN INTERVAL ... PRECEDING over an actual timestamp
  // ORDER BY — the value-based frame where gaps in the calendar
  // matter (q53 gates the numeric-epoch emulation; this is the
  // native SQL-syntax form on both engines). Trailing 7-day revenue
  // per priority over gapped daily buckets; sums stay DECIMAL inside
  // the frame, surfaced once as double.
  private val q178 = QueryDef(
    "q178_interval_frame",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH daily AS (
          SELECT o_orderpriority AS prio, to_date(o_orderdate) AS d,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY 1, 2),
        fr AS (
          SELECT prio, d, rev,
            SUM(rev) OVER w AS rev_7d,
            COUNT(*) OVER w AS n_days_7d
          FROM daily
          WINDOW w AS (PARTITION BY prio ORDER BY CAST(d AS TIMESTAMP)
            RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW))
        SELECT prio, d, CAST(rev AS DOUBLE) AS rev,
          CAST(rev_7d AS DOUBLE) AS rev_7d, n_days_7d
        FROM fr WHERE day(d) = 1
        ORDER BY prio, d""")
    },
    Some("""WITH daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1, 2),
      fr AS (
        SELECT prio, d, rev,
          SUM(rev) OVER w AS rev_7d,
          CAST(COUNT(*) OVER w AS BIGINT) AS n_days_7d
        FROM daily
        WINDOW w AS (PARTITION BY prio ORDER BY CAST(d AS TIMESTAMP)
          RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW))
      SELECT prio, d, CAST(rev AS DOUBLE) AS rev,
        CAST(rev_7d AS DOUBLE) AS rev_7d, n_days_7d
      FROM fr WHERE date_part('day', d) = 1
      ORDER BY prio, d"""),
    covers = Seq("W-interval-frame"))

  // ------------------------------------------------- SQL PIVOT syntax
  // The SQL-parser PIVOT surface (q44 gates the DataFrame .pivot
  // path, q118 the discovered-value path): orders pivoted to one
  // column per status, per priority. The Spark side runs actual
  // `PIVOT (... FOR ... IN ...)` SQL; the oracle spells the same
  // contract as conditional aggregation.
  private val q179 = QueryDef(
    "q179_sql_pivot",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT prio,
          CAST(o_rev AS DOUBLE) AS o_rev, o_n,
          CAST(f_rev AS DOUBLE) AS f_rev, f_n,
          CAST(p_rev AS DOUBLE) AS p_rev, p_n
        FROM (
          SELECT o_orderpriority AS prio, o_orderstatus AS st,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price
          FROM orders)
        PIVOT (
          SUM(price) AS rev, COUNT(price) AS n
          FOR st IN ('O' AS o, 'F' AS f, 'P' AS p))
        ORDER BY prio""")
    },
    Some("""SELECT o_orderpriority AS prio,
        CAST(SUM(CASE WHEN o_orderstatus = 'O'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS o_rev,
        CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS o_n,
        CAST(SUM(CASE WHEN o_orderstatus = 'F'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS f_rev,
        CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS f_n,
        CAST(SUM(CASE WHEN o_orderstatus = 'P'
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_rev,
        CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS p_n
      FROM orders GROUP BY 1 ORDER BY 1"""),
    covers = Seq("SQL-pivot"))

  // ------------------------------------------- timezone day bucketing
  // The reference's real timezone hazard (SURVEY §7.4 risk 3): events
  // stored as UTC instants but reported by Dutch business day. Local
  // day = from_utc_timestamp(ts, Europe/Amsterdam) — a per-row
  // expression using the JVM's IANA tzdata, so DST transitions (+1
  // winter, +2 summer) are handled by rules, not offset arithmetic.
  // n_shifted counts the midnight-band rows whose UTC date differs
  // from the local date — exactly the rows a naive UTC DATE() bucket
  // misfiles. The oracle converts with DuckDB's own tzdata
  // (timezone('Europe/Amsterdam', timezone('UTC', ts))) — agreement
  // proves both engines apply the same rules, DST edges included.
  private val q180 = QueryDef(
    "q180_tz_bucket",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("local_d",
          to_date(from_utc_timestamp(col("ts"), "Europe/Amsterdam")))
        .withColumn("utc_d", to_date(col("ts")))
      ev.groupBy("local_d")
        .agg(count(lit(1)).as("n"),
          sum(when(col("local_d") =!= col("utc_d"), 1L).otherwise(0L))
            .as("n_shifted"))
        .orderBy("local_d")
    },
    Some("""WITH ev AS (
        SELECT CAST(timezone('Europe/Amsterdam', timezone('UTC', ts)) AS DATE) AS local_d,
               CAST(ts AS DATE) AS utc_d
        FROM events)
      SELECT local_d,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN local_d <> utc_d THEN 1 ELSE 0 END) AS BIGINT) AS n_shifted
      FROM ev GROUP BY local_d
      ORDER BY local_d"""),
    covers = Seq("TZ-bucketing"))

  val all: Seq[QueryDef] =
    Seq(q176, q177, q178, q179, q180)
}
