package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Round-14 gate additions (q192+): near-dup cluster
  * canonicalization (the keep/drop decision that completes the dedup
  * pipeline) and Wilson-lower-bound rate ranking (small-sample-safe
  * quality ordering).
  */
object Round14Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // -------------------------------------- near-dup canonicalization
  // The decision stage after near-dup clustering (q71 gates the
  // components themselves): within every cluster keep ONE canonical
  // document — longest text, ties to the lowest doc_id — and mark
  // the rest dropped with a pointer to their replacement. Window
  // rank inside clusters is O(cluster) work after the same
  // clustering cost as q71; singleton docs (no near-dup) keep
  // themselves. This is the exact shape of a production dedup sweep:
  // the corpus rewrite is driven by the (doc → canonical) map this
  // query emits.
  private val q192 = QueryDef(
    "q192_dedup_canonicalize",
    (s, dir) => {
      // session-cached copy of q22's verified-pairs output (the shared
      // input of q71/q192/q289/q332/q351/q359 — q22's own gate still
      // rebuilds, so its bench timing stays honest)
      val pairs = GraphGateSource.cached(s, "q22-pairs:" + dir)(
        graft.SparkEntry.queries("q22_ngram_jaccard")(s, dir))
        .select("doc_a", "doc_b")
      val clusters = graft.dedup.Dedup.clusters(pairs)
      val docs = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val labeled = docs.join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      val w = Window.partitionBy("cluster_id")
        .orderBy(desc("n_chars"), col("doc_id"))
      labeled
        .withColumn("rk", row_number().over(w))
        .withColumn("canonical_id",
          first(col("doc_id")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
        .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
          (col("rk") === 1).as("kept"))
        .orderBy("doc_id")
    },
    Some("""WITH RECURSIVE toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
             FROM toksrc WHERE len(tk) >= 3),
      sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS common
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b FROM p0
                JOIN sizes sa ON doc_a = sa.doc_id
                JOIN sizes sb ON doc_b = sb.doc_id
                WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.4),
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      comp AS (SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT) AS cluster_id
               FROM reach GROUP BY a),
      labeled AS (
        SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
      ranked AS (
        SELECT doc_id, cluster_id,
          ROW_NUMBER() OVER (PARTITION BY cluster_id
            ORDER BY n_chars DESC, doc_id) AS rk,
          FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
            ORDER BY n_chars DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS canonical_id
        FROM labeled)
      SELECT doc_id, cluster_id, canonical_id, rk = 1 AS kept
      FROM ranked ORDER BY doc_id"""),
    covers = Seq("DEDUP-canonicalize"))

  // --------------------------------------------- Wilson lower bound
  // Small-sample-safe rate ranking: per user cohort, the conversion
  // rate purchase/click with its Wilson-score lower bound (z=1.96).
  // Counts are exact integers; the bound is ONE shared IEEE tree of
  // correctly-rounded ops (÷, ·, sqrt) written identically in both
  // engines — bit-stable like q184's z-scores. Ranking sources by
  // wilson_low instead of raw rate is how a curation pipeline avoids
  // promoting a 1-for-1 source over a 900-for-1000 one.
  private val q193 = QueryDef(
    "q193_wilson_bound",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .groupBy((col("user_id") % 20).as("cohort"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("clicks"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"))
        .filter(col("clicks") > 0)
      // proportion of purchase events among click+purchase events —
      // a true [0,1] binomial proportion, which is what the Wilson
      // interval models
      val n = (col("clicks") + col("purchases")).cast("double")
      val p = col("purchases").cast("double") / n
      val z2 = lit(1.96) * lit(1.96)
      val denom = lit(1.0) + z2 / n
      val center = p + z2 / (lit(2.0) * n)
      val rad = lit(1.96) * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))
      ev.select(col("cohort"), col("clicks"), col("purchases"),
          p.as("rate"), ((center - rad) / denom).as("wilson_low"))
        .orderBy("cohort")
    },
    Some("""WITH agg AS (
        SELECT user_id % 20 AS cohort,
          CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases
        FROM events GROUP BY 1),
      x AS (
        SELECT cohort, clicks, purchases,
          CAST(clicks + purchases AS DOUBLE) AS n,
          CAST(purchases AS DOUBLE) / CAST(clicks + purchases AS DOUBLE) AS p
        FROM agg WHERE clicks > 0),
      z AS (SELECT CAST(1.96 AS DOUBLE) AS zz)
      SELECT cohort, clicks, purchases, p AS rate,
        ((p + (zz * zz) / (CAST(2.0 AS DOUBLE) * n))
          - zz * sqrt(p * (CAST(1.0 AS DOUBLE) - p) / n
                      + (zz * zz) / (CAST(4.0 AS DOUBLE) * n * n)))
        / (CAST(1.0 AS DOUBLE) + (zz * zz) / n) AS wilson_low
      FROM x, z ORDER BY cohort"""),
    covers = Seq("A-wilson"))

  val all: Seq[QueryDef] =
    Seq(q192, q193)
}
