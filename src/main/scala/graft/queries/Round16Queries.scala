package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-16 gate additions (q196+): vocabulary-health diagnostics
  * (hapax share) and skip-gram window pair extraction — the
  * word2vec/GloVe-style co-occurrence counting stage.
  */
object Round16Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ----------------------------------------------- vocabulary health
  // Per-source lexical health: vocabulary size, hapax legomena share
  // (words seen exactly once — a high share flags OCR noise or
  // boilerplate-free diversity), and the corpus coverage of the
  // source's top-10 words. One token aggregate per source feeds all
  // three — integer counts end-to-end, one double division each.
  private val q196 = QueryDef(
    "q196_vocab_health",
    (s, dir) => {
      val tf = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val byRank = tf.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(desc("c"), col("w"))))
      byRank.groupBy("source")
        .agg(count(lit(1)).as("n_vocab"),
          sum(col("c")).as("n_tokens"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
          sum(when(col("rk") <= 10, col("c")).otherwise(0L)).as("top10_tokens"))
        .select(col("source"), col("n_vocab"), col("n_tokens"), col("n_hapax"),
          (col("n_hapax").cast("double") / col("n_vocab").cast("double"))
            .as("hapax_share"),
          (col("top10_tokens").cast("double") / col("n_tokens").cast("double"))
            .as("top10_coverage"))
        .orderBy("source")
    },
    Some("""WITH tf AS (
        SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 1, 2),
      ranked AS (
        SELECT source, w, c,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, w) AS rk
        FROM tf)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_vocab,
        CAST(SUM(c) AS BIGINT) AS n_tokens,
        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS hapax_share,
        CAST(SUM(CASE WHEN rk <= 10 THEN c ELSE 0 END) AS DOUBLE)
          / CAST(SUM(c) AS DOUBLE) AS top10_coverage
      FROM ranked GROUP BY source ORDER BY source"""),
    covers = Seq("TEXT-vocab-health"))

  // ------------------------------------------- skip-gram pair counts
  // Word2vec-style co-occurrence extraction: (center, context) pairs
  // within a ±2 token window, counted corpus-wide. Each token emits
  // its 4 context POSITIONS, which equi-join back to the token table
  // on (doc, position) — strictly linear in corpus size (a naive
  // positions theta-join is per-doc quadratic before its filter);
  // out-of-range probes simply find no match. The count aggregate is
  // the one data-sized shuffle, keyed by pair. Top-30 by (count
  // desc, pair) is the training-table head.
  private val q197 = QueryDef(
    "q197_skipgram_pairs",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " "))
          .as(Seq("pos", "w")))
      val probes = tok.select(col("doc_id"), col("w").as("center"),
        explode(array(col("pos") - 2, col("pos") - 1,
          col("pos") + 1, col("pos") + 2)).as("pb"))
      val ctx = tok.select(col("doc_id"), col("pos").as("pb"),
        col("w").as("context"))
      probes.join(ctx, Seq("doc_id", "pb"))
        .groupBy("center", "context")
        .agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("center"), col("context"))
        .limit(30)
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      toki AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i FROM d),
      tok AS (SELECT doc_id, i - 1 AS pos, tk[i] AS w FROM toki),
      pairs AS (
        SELECT a.w AS center, b.w AS context
        FROM tok a JOIN tok b
          ON a.doc_id = b.doc_id AND a.pos <> b.pos
         AND b.pos BETWEEN a.pos - 2 AND a.pos + 2)
      SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs GROUP BY 1, 2
      ORDER BY n DESC, center, context LIMIT 30"""),
    covers = Seq("TEXT-skipgram"))

  val all: Seq[QueryDef] =
    Seq(q196, q197)
}
