package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-53 gate additions (q299, q300): assortment coverage and the
  * per-source corpus datasheet.
  */
object Round53Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- catalog coverage
  // Dead-stock audit: per brand, how much of the catalog has never
  // been ordered. One left-anti join of the part dim against the
  // distinct traded part keys (the fact side collapses to its key set
  // FIRST — the aggregate-before-join shape, so the join is
  // dim × distinct-keys, not dim × fact), then exact per-brand
  // tallies and one division.
  private val q299 = QueryDef(
    "q299_catalog_coverage",
    (s, dir) => {
      val traded = t(s, dir, "lineitem").select(col("l_partkey")).distinct()
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val dead = p.join(traded, col("p_partkey") === col("l_partkey"),
        "left_anti")
        .groupBy("p_brand").agg(count(lit(1)).as("n_dead"))
      p.groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
        .join(dead, Seq("p_brand"), "left")
        .withColumn("n_dead", coalesce(col("n_dead"), lit(0L)))
        .select(col("p_brand"), col("n_parts"), col("n_dead"),
          (col("n_dead").cast("double") / col("n_parts").cast("double"))
            .as("dead_share"))
        .orderBy("p_brand")
    },
    Some("""WITH traded AS (SELECT DISTINCT l_partkey FROM lineitem),
      dead AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_dead
        FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM traded)
        GROUP BY 1),
      tot AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1)
      SELECT t.p_brand, t.n_parts, COALESCE(d.n_dead, 0) AS n_dead,
        CAST(COALESCE(d.n_dead, 0) AS DOUBLE) / CAST(t.n_parts AS DOUBLE)
          AS dead_share
      FROM tot t LEFT JOIN dead d ON t.p_brand = d.p_brand
      ORDER BY t.p_brand"""),
    covers = Seq("A-catalog-coverage"))

  // ------------------------------------------------- corpus datasheet
  // The per-source datasheet a curated corpus ships with — one row
  // per source joining the engine's quality families: volume (docs,
  // tokens), exact-duplicate rate (md5 groups, q21's rule), length
  // profile (mean chars), language purity (majority-language share,
  // a total-order modal pick), and lexical concentration (Simpson's
  // index, q269's integer-rational form). Every ingredient is an
  // exact count or DECIMAL sum; each ratio closes with one division.
  // Five aggregates join on the 20-row source grain — dimension-sized
  // from the first shuffle on.
  private val q300 = QueryDef(
    "q300_corpus_datasheet",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val base = d.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      val toks = d.select(col("source"),
          explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val tokStats = toks.groupBy("source", "term")
        .agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_terms"),
          sum(col("c") * (col("c") - 1L)).as("s_num"))
      val dups = d.groupBy(col("source"), md5(col("text")).as("h"))
        .agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(sum(col("n") - 1L).as("n_exact_dups"))
      val langRank = d.groupBy("source", "lang")
        .agg(count(lit(1)).as("nl"))
        .withColumn("lr", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("source")
            .orderBy(desc("nl"), asc("lang"))))
        .filter(col("lr") === 1)
        .select(col("source"), col("lang").as("top_lang"),
          col("nl").as("top_lang_docs"))
      base.join(tokStats, "source").join(dups, "source").join(langRank, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_terms"),
          (col("total_chars").cast("double") / col("n_docs").cast("double"))
            .as("mean_chars"),
          col("n_exact_dups"),
          (col("n_exact_dups").cast("double") / col("n_docs").cast("double"))
            .as("dup_rate"),
          col("top_lang"),
          (col("top_lang_docs").cast("double") / col("n_docs").cast("double"))
            .as("lang_purity"),
          (col("s_num").cast("double") /
            (col("n_tokens").cast("double")
              * (col("n_tokens") - 1L).cast("double"))).as("simpson"))
        .orderBy("source")
    },
    Some("""WITH base AS (SELECT source,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY 1),
      tok AS (SELECT source, t.term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
        WHERE length(t.term) > 0),
      tc AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
             FROM tok GROUP BY 1, 2),
      tok_stats AS (SELECT source,
          CAST(SUM(c) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_terms,
          CAST(SUM(c * (c - 1)) AS BIGINT) AS s_num
        FROM tc GROUP BY 1),
      dups AS (SELECT source, CAST(SUM(n - 1) AS BIGINT) AS n_exact_dups
        FROM (SELECT source, md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY 1, 2)
        GROUP BY 1),
      lang_rank AS (SELECT source, lang AS top_lang, nl AS top_lang_docs
        FROM (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS nl,
                ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY COUNT(*) DESC, lang ASC) AS lr
              FROM documents GROUP BY 1, 2)
        WHERE lr = 1)
      SELECT b.source, b.n_docs, t.n_tokens, t.n_terms,
        CAST(b.total_chars AS DOUBLE) / CAST(b.n_docs AS DOUBLE) AS mean_chars,
        d.n_exact_dups,
        CAST(d.n_exact_dups AS DOUBLE) / CAST(b.n_docs AS DOUBLE) AS dup_rate,
        l.top_lang,
        CAST(l.top_lang_docs AS DOUBLE) / CAST(b.n_docs AS DOUBLE)
          AS lang_purity,
        CAST(t.s_num AS DOUBLE) /
          (CAST(t.n_tokens AS DOUBLE) * CAST(t.n_tokens - 1 AS DOUBLE))
          AS simpson
      FROM base b
      JOIN tok_stats t ON t.source = b.source
      JOIN dups d ON d.source = b.source
      JOIN lang_rank l ON l.source = b.source
      ORDER BY b.source"""),
    covers = Seq("TEXT-datasheet"))

  val all: Seq[QueryDef] =
    Seq(q299, q300)
}
