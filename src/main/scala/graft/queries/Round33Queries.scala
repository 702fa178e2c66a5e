package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-33 gate additions (q263+): time-weighted averaging,
  * k-anonymity auditing, and k-NN label-noise scoring.
  */
object Round33Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ------------------------------------------------- time-weighted avg
  // TWAP: each observation holds until the next one (or the end of
  // day), so the daily average weights every value by how long it was
  // current — the right mean for irregular telemetry, where the
  // arithmetic mean over-counts bursts. All arithmetic exact: values
  // as integer cents, durations as integer microseconds from
  // unix_micros (lead() with an end-of-day default), so the weighted
  // sum is a LONG (≤ 5·10¹⁵ < 2⁵³ — even the double cast is exact)
  // and the TWAP is one shared IEEE division tree. The lead() window
  // partitions by (user, day) — event-grain but perfectly parallel at
  // any scale.
  private val q263 = QueryDef(
    "q263_twap",
    (s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("user_id") % 10 === 0)
        .select(col("user_id"), col("event_id"), col("ts"),
          (dec(col("value")) * 100).cast("long").as("cents"),
          to_date(col("ts")).as("day"))
      val w = Window.partitionBy("user_id", "day")
        .orderBy(col("ts"), col("event_id"))
      val endOfDay = unix_micros(date_add(col("day"), 1).cast("timestamp"))
      e.withColumn("dur_us",
          coalesce(lead(unix_micros(col("ts")), 1).over(w), endOfDay)
            - unix_micros(col("ts")))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_events"),
          sum(col("cents") * col("dur_us")).as("sw"),
          sum(col("dur_us")).as("sd"))
        .select(col("user_id"), col("day"), col("n_events"),
          (col("sw").cast("double") / col("sd").cast("double")
            / lit(100.0d)).as("twap"))
        .orderBy("user_id", "day")
    },
    Some("""WITH e AS (SELECT user_id, event_id, ts,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
          CAST(ts AS DATE) AS day
        FROM events WHERE user_id % 10 = 0),
      d AS (SELECT *,
          COALESCE(LEAD(epoch_us(ts)) OVER (PARTITION BY user_id, day
                     ORDER BY ts, event_id),
                   epoch_us(CAST(day + INTERVAL 1 DAY AS TIMESTAMP)))
            - epoch_us(ts) AS dur_us
        FROM e)
      SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(SUM(cents * dur_us) AS DOUBLE) / CAST(SUM(dur_us) AS DOUBLE)
          / CAST(100 AS DOUBLE) AS twap
      FROM d GROUP BY 1, 2 ORDER BY user_id, day"""),
    covers = Seq("TS-twap"))

  // ------------------------------------------------- k-anonymity audit
  // Privacy gate for training-data release: bucket documents by their
  // quasi-identifier tuple (lang, source, length-centile bucket) and
  // count how many docs sit in groups smaller than k=5 — those rows
  // re-identify and must be suppressed or generalized before the
  // corpus ships. Two cascaded exact-count aggregates (group sizes,
  // then per-(lang, source) suppression tallies) — map-side combined,
  // no joins, integer end to end. The same shape audits ANY release
  // k: only the `< 5` literal changes.
  private val q264 = QueryDef(
    "q264_k_anonymity",
    (s, dir) => {
      val groups = t(s, dir, "documents")
        .select(col("lang"), col("source"),
          expr("n_chars div 100").as("len_bucket"))
        .groupBy("lang", "source", "len_bucket")
        .agg(count(lit(1)).as("n"))
      groups.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_groups"),
          sum(col("n")).as("n_docs"),
          sum(when(col("n") < 5, 1L).otherwise(0L)).as("suppressed_groups"),
          sum(when(col("n") < 5, col("n")).otherwise(0L)).as("suppressed_docs"))
        .withColumn("kept_docs", col("n_docs") - col("suppressed_docs"))
        .orderBy("lang", "source")
    },
    Some("""WITH groups AS (
        SELECT lang, source, n_chars // 100 AS len_bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2, 3)
      SELECT lang, source,
        CAST(COUNT(*) AS BIGINT) AS n_groups,
        CAST(SUM(n) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS suppressed_groups,
        CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS suppressed_docs,
        CAST(SUM(n) AS BIGINT)
          - CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS kept_docs
      FROM groups GROUP BY 1, 2 ORDER BY lang, source"""),
    covers = Seq("PRIV-k-anon"))

  // ------------------------------------------------- label-noise audit
  // Confident-learning-style label QA: for a 20% audit sample, check
  // each vector's label against its 5 nearest neighbors (q29's
  // portable cosine). Low agreement flags a probably-mislabeled
  // example BEFORE it trains a model. Emits the agreement count, the
  // modal neighbor label (votes DESC, label ASC — a total order) and
  // the suspect verdict. The audit sample is the broadcast side and
  // the full corpus streams — at 100 TB the same vote runs off the
  // q30/q45 bucketed-ANN neighbor source instead of brute force.
  private val q265 = QueryDef(
    "q265_label_noise",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
      val a = e.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"))
      val c = e.select(col("vec_id").as("n_id"), col("label").as("n_label"),
        col("embedding").as("n_emb"))
      graft.similarity.KnnVote.auditLabels(s, a, c, 5, suspectMax = 2L)
        .withColumnRenamed("q_id", "a_id")
        .withColumnRenamed("q_label", "a_label")
        .orderBy("a_id")
    },
    Some("""WITH a AS (SELECT vec_id AS a_id, label AS a_label, embedding AS a_emb
               FROM embeddings WHERE vec_id % 5 = 0),
      c AS (SELECT vec_id AS n_id, label AS n_label, embedding AS n_emb
            FROM embeddings),
      scored AS (
        SELECT a_id, a_label, n_id, n_label,
          list_sum(list_transform(list_zip(a_emb, n_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
          (sqrt(list_sum(list_transform(list_zip(a_emb, a_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) *
           sqrt(list_sum(list_transform(list_zip(n_emb, n_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))) AS cos
        FROM c, a WHERE a_id <> n_id),
      ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id
                   ORDER BY cos DESC, n_id) AS rk FROM scored),
      votes AS (SELECT a_id, a_label, n_label,
                  CAST(COUNT(*) AS BIGINT) AS votes
                FROM ranked WHERE rk <= 5 GROUP BY 1, 2, 3),
      tallied AS (SELECT *,
          CAST(SUM(CASE WHEN n_label = a_label THEN votes ELSE 0 END)
            OVER (PARTITION BY a_id) AS BIGINT) AS agree_n,
          ROW_NUMBER() OVER (PARTITION BY a_id
            ORDER BY votes DESC, n_label) AS vr
        FROM votes)
      SELECT a_id, a_label, agree_n, n_label AS modal_label,
        agree_n <= 2 AS suspect
      FROM tallied WHERE vr = 1 ORDER BY a_id"""),
    covers = Seq("SIM-label-noise"))

  val all: Seq[QueryDef] =
    Seq(q263, q264, q265)
}
