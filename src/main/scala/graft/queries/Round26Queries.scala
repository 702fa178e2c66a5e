package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-26 gate additions (q245+): feature-engineering and
  * corpus-mix diagnostics — rank-uniform quantile normalization and
  * total-variation distribution drift.
  *
  * Determinism rules as everywhere (QueryDef scaladoc): ranks are
  * exact integers with unique tiebreaks, every double is ONE shared
  * IEEE tree, total ORDER BY.
  */
object Round26Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------- rank-uniform normalization
  // Quantile (rank-uniform) normalization of a feature — the ML
  // preprocessing step that maps any distribution onto Uniform(0,1)
  // regardless of its shape, where z-scores (q184) assume
  // Gaussian-ish tails. Per label, each vector's L2 norm (the q55
  // sequential-fold tree, bit-identical across engines) gets its
  // within-label rank; u = (2·rank − 1) / (2·n) is the midpoint
  // plotting position — exact integers until ONE division. vec_id
  // tiebreaks make ranks total even under float-equal norms. One
  // partitioned window pass; at 100 TB the per-label sort shards by
  // label exactly like q159's equi-depth histogram.
  private val q245 = QueryDef(
    "q245_rank_uniform",
    (s, dir) => {
      val l2 = sqrt(aggregate(
        zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v))
      val w = Window.partitionBy("label").orderBy(col("l2"), col("vec_id"))
      val n = Window.partitionBy("label")
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), l2.as("l2"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(n))
        .select(col("vec_id"), col("label"), col("l2"), col("rank"),
          ((col("rank") * 2 - 1).cast("double") / (col("n") * 2).cast("double"))
            .as("u"))
        .orderBy("vec_id")
    },
    Some("""WITH n AS (
        SELECT vec_id, label,
          sqrt(list_sum(list_transform(list_zip(embedding, embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) AS l2
        FROM embeddings),
      r AS (
        SELECT vec_id, label, l2,
          CAST(ROW_NUMBER() OVER (PARTITION BY label ORDER BY l2, vec_id)
            AS BIGINT) AS rank,
          COUNT(*) OVER (PARTITION BY label) AS n
        FROM n)
      SELECT vec_id, label, l2, rank,
        CAST(rank * 2 - 1 AS DOUBLE) / CAST(n * 2 AS DOUBLE) AS u
      FROM r ORDER BY vec_id"""),
    covers = Seq("ML-rank-uniform"))

  // ------------------------------------------- total-variation drift
  // Total-variation distance between each source's language
  // distribution and the corpus-wide one: TV = ½ Σ_l |p_l − q_l| —
  // the corpus-mix drift gauge whose units (fraction of mass that
  // must move) are directly actionable, complementing chi-square
  // (q206, significance) and KS (q208, continuous). Exact to the
  // last bit: over the common denominator n_s·N the summand is the
  // INTEGER |n_sl·N − N_l·n_s| — absent (source, lang) cells
  // contribute N_l·n_s via the dense grid join (q206's pattern) — and
  // the single division by 2·n_s·N happens once per source. Counts
  // aggregate map-side; the grid is |sources|×|langs|, dimension-
  // sized, so every join below it broadcasts at any corpus scale.
  private val q246 = QueryDef(
    "q246_tv_drift",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val cell = d.groupBy("source", "lang").agg(count(lit(1)).as("n_sl"))
      val bySource = d.groupBy("source").agg(count(lit(1)).as("n_s"))
      val byLang = d.groupBy("lang").agg(count(lit(1)).as("n_l"))
      val total = d.agg(count(lit(1)).as("n_tot"))
      val grid = bySource.crossJoin(broadcast(byLang))
        .join(cell, Seq("source", "lang"), "left")
        .na.fill(0L, Seq("n_sl"))
        .crossJoin(broadcast(total))
      grid
        .groupBy(col("source"), col("n_s"), col("n_tot"))
        .agg(sum(abs(col("n_sl") * col("n_tot") - col("n_l") * col("n_s")))
          .as("num"))
        .select(col("source"), col("n_s"),
          (col("num").cast("double") /
            (col("n_s") * col("n_tot") * 2).cast("double")).as("tv"))
        .orderBy("source")
    },
    Some("""WITH cell AS (SELECT source, lang, COUNT(*) AS n_sl
          FROM documents GROUP BY 1, 2),
      s AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
      l AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY 1),
      tot AS (SELECT COUNT(*) AS n_tot FROM documents),
      grid AS (
        SELECT s.source, s.n_s, l.n_l, tot.n_tot,
               COALESCE(cell.n_sl, 0) AS n_sl
        FROM s CROSS JOIN l CROSS JOIN tot
        LEFT JOIN cell ON cell.source = s.source AND cell.lang = l.lang)
      SELECT source, CAST(n_s AS BIGINT) AS n_s,
        CAST(SUM(abs(n_sl * n_tot - n_l * n_s)) AS DOUBLE) /
          CAST(n_s * n_tot * 2 AS DOUBLE) AS tv
      FROM grid
      GROUP BY source, n_s, n_tot
      ORDER BY source"""),
    covers = Seq("QA-tv-drift"))

  val all: Seq[QueryDef] =
    Seq(q245, q246)
}
