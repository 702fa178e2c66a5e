package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-58 gate additions (q309–q313): privacy, mixture design, and
  * distribution-drift audits over the document corpus.
  *
  * Determinism: counts and cumulative sums are exact longs; every
  * double is a single division (or abs/max chain) over those exact
  * integers, evaluated as the same IEEE tree on both engines.
  */
object Round58Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- l-diversity
  // k-anonymity (q264) says how many rows share a quasi-identifier;
  // l-diversity says how many DISTINCT sensitive values hide inside
  // each group — a k-anonymous group whose members all share one
  // source still leaks it. Quasi-id = (lang, 200-char length band),
  // sensitive = source; flags groups failing k<5 or l<3. One groupBy,
  // countDistinct inside it — a single shuffle at any scale.
  private val q309 = QueryDef(
    "q309_l_diversity",
    (s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), expr("n_chars DIV 200").as("len_band"),
          col("source"))
        .groupBy("lang", "len_band")
        .agg(count(lit(1)).as("k_size"),
          countDistinct(col("source")).as("l_div"))
        .withColumn("at_risk", col("k_size") < 5 || col("l_div") < 3)
        .orderBy("lang", "len_band")
    },
    Some("""SELECT lang, n_chars // 200 AS len_band,
        CAST(COUNT(*) AS BIGINT) AS k_size,
        CAST(COUNT(DISTINCT source) AS BIGINT) AS l_div,
        (COUNT(*) < 5 OR COUNT(DISTINCT source) < 3) AS at_risk
      FROM documents
      GROUP BY lang, len_band
      ORDER BY lang, len_band"""),
    covers = Seq("PRIV-l-diversity"))

  // ------------------------------------------------- mixture reweighting
  // The downsample-only plan to a uniform source mixture: per source
  // its actual share, the keep-probability multiplier min(1, target/
  // actual), and the integral kept-count floor(N²/(S·n)) — computed
  // with DECIMAL(38,0)/HUGEINT integral division so N² stays exact
  // past int64 (10¹² docs). Two aggregates and a broadcast scalar —
  // no per-row work at all.
  private val q310 = QueryDef(
    "q310_mixture_reweight",
    (s, dir) => {
      val per = t(s, dir, "documents")
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
      val tot = per.agg(sum(col("n_docs")).as("nn"), count(lit(1)).as("ss"))
      per.crossJoin(broadcast(tot))
        .selectExpr(
          "source", "n_docs",
          "CAST(n_docs AS DOUBLE) / CAST(nn AS DOUBLE) AS share",
          "LEAST(CAST(1 AS DOUBLE), (CAST(1 AS DOUBLE) / CAST(ss AS DOUBLE))" +
            " / (CAST(n_docs AS DOUBLE) / CAST(nn AS DOUBLE))) AS multiplier",
          "LEAST(n_docs, (CAST(nn AS DECIMAL(38,0)) * CAST(nn AS DECIMAL(38,0)))" +
            " DIV (CAST(ss AS DECIMAL(38,0)) * CAST(n_docs AS DECIMAL(38,0))))" +
            " AS kept")
        .orderBy("source")
    },
    Some("""WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source),
      tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
          CAST(COUNT(*) AS BIGINT) AS ss FROM per)
      SELECT source, n_docs,
        CAST(n_docs AS DOUBLE) / CAST(nn AS DOUBLE) AS share,
        LEAST(CAST(1 AS DOUBLE), (CAST(1 AS DOUBLE) / CAST(ss AS DOUBLE))
          / (CAST(n_docs AS DOUBLE) / CAST(nn AS DOUBLE))) AS multiplier,
        LEAST(n_docs, CAST((CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT))
          // (CAST(ss AS HUGEINT) * CAST(n_docs AS HUGEINT)) AS BIGINT)) AS kept
      FROM per, tot
      ORDER BY source"""),
    covers = Seq("MIX-reweight"))

  // ------------------------------------------------- dup token inflation
  // What exact-duplicate documents do to corpus statistics: top-20
  // term frequencies in the raw corpus vs the text-distinct corpus,
  // and the inflation ratio raw/deduped. Every term surviving in raw
  // survives dedup (one copy of each distinct text remains), so the
  // ratio's denominator is never zero. The distinct is one shuffle on
  // text; both token explosions aggregate map-side before their
  // term-keyed shuffles.
  private val q311 = QueryDef(
    "q311_dup_token_inflation",
    (s, dir) => {
      val d = t(s, dir, "documents")
      def tf(df: DataFrame): DataFrame = df
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("f"))
      val raw = tf(d).withColumnRenamed("f", "freq_raw")
      val ded = tf(d.select("text").distinct())
        .withColumnRenamed("f", "freq_dedup")
      raw.join(ded, Seq("term"))
        .orderBy(desc("freq_raw"), asc("term")).limit(20)
        .select(col("term"), col("freq_raw"), col("freq_dedup"),
          (col("freq_raw").cast("double") / col("freq_dedup").cast("double"))
            .as("inflation"))
        .orderBy(desc("freq_raw"), asc("term"))
    },
    Some("""WITH raw AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq_raw
          FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
          GROUP BY term),
      ded AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq_dedup
          FROM (SELECT unnest(string_split(text, ' ')) AS term
                FROM (SELECT DISTINCT text FROM documents))
          GROUP BY term)
      SELECT term, freq_raw, freq_dedup,
        CAST(freq_raw AS DOUBLE) / CAST(freq_dedup AS DOUBLE) AS inflation
      FROM raw JOIN ded USING (term)
      ORDER BY freq_raw DESC, term LIMIT 20"""),
    covers = Seq("DD-token-inflation"))

  // ------------------------------------------------- per-source KS drift
  // q208's two-sample Kolmogorov–Smirnov, decomposed per source: each
  // source's n_chars distribution against the REST of the corpus —
  // the drill-down that names the drifting source instead of only
  // detecting drift. ECDFs evaluate on the dense sources × distinct-
  // values grid (|sources|·|values| rows, window cumsums partitioned
  // by source); sup|F_s − F_rest| is exact-integer cumulative counts
  // through one division each and an order-independent max.
  private val q312 = QueryDef(
    "q312_ks_by_source",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val vals = d.select(col("n_chars").as("v")).distinct()
      val srcCnt = d.groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c"))
      val gblCnt = d.groupBy(col("n_chars").as("v"))
        .agg(count(lit(1)).as("gc"))
      val wSrc = Window.partitionBy("source").orderBy("v")
      val wAll = Window.orderBy("v")
      val allCum = vals.join(gblCnt, Seq("v"), "left")
        .withColumn("gcum", sum(coalesce(col("gc"), lit(0L))).over(wAll))
        .select("v", "gcum")
      val perSrc = d.groupBy("source").agg(count(lit(1)).as("n_src"))
      val nTot = d.agg(count(lit(1)).as("n_tot"))
      val dense = d.select("source").distinct().crossJoin(vals)
        .join(srcCnt, Seq("source", "v"), "left")
        .withColumn("scum", sum(coalesce(col("c"), lit(0L))).over(wSrc))
      dense.join(allCum, Seq("v"))
        .join(perSrc, Seq("source"))
        .crossJoin(broadcast(nTot))
        .select(col("source"), col("n_src"),
          abs(col("scum").cast("double") / col("n_src").cast("double") -
            (col("gcum") - col("scum")).cast("double") /
              (col("n_tot") - col("n_src")).cast("double")).as("dd"))
        .groupBy("source", "n_src")
        .agg(max(col("dd")).as("ks"))
        .orderBy("source")
    },
    Some("""WITH vals AS (SELECT DISTINCT n_chars AS v FROM documents),
      srcs AS (SELECT DISTINCT source FROM documents),
      sc AS (SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
             FROM documents GROUP BY source, n_chars),
      gc AS (SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS gc
             FROM documents GROUP BY n_chars),
      acum AS (SELECT v, CAST(SUM(gc) OVER (ORDER BY v) AS BIGINT) AS gcum
               FROM vals LEFT JOIN gc USING (v)),
      ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src
             FROM documents GROUP BY source),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM documents),
      dense AS (SELECT source, v,
          CAST(SUM(COALESCE(c, 0)) OVER (PARTITION BY source ORDER BY v)
            AS BIGINT) AS scum
        FROM (SELECT * FROM srcs CROSS JOIN vals) g
        LEFT JOIN sc USING (source, v))
      SELECT source, n_src,
        MAX(abs(CAST(scum AS DOUBLE) / CAST(n_src AS DOUBLE)
          - CAST(gcum - scum AS DOUBLE) / CAST(n_tot - n_src AS DOUBLE)))
          AS ks
      FROM dense JOIN acum USING (v) JOIN ps USING (source), nt
      GROUP BY source, n_src
      ORDER BY source"""),
    covers = Seq("DRIFT-ks-by-source"))

  // ------------------------------------------------- rare-token docs
  // OCR-garbage / junk detector: a document whose RAREST token has a
  // low document frequency is carrying vocabulary little else shares.
  // Per doc, min document-frequency over its distinct terms; grouped
  // by that exact min-df (bounded by the distinct df values of the
  // vocabulary, not by corpus size), with doc count and exact mean
  // length per group. df joins back to postings on the term key —
  // high-cardinality, no skew; everything else aggregates map-side.
  private val q313 = QueryDef(
    "q313_rare_token_docs",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val post = d.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term")).distinct()
      val df = post.groupBy("term").agg(count(lit(1)).as("df"))
      val minDf = post.join(df, Seq("term"))
        .groupBy("doc_id").agg(min(col("df")).as("min_df"))
      minDf.join(d.select("doc_id", "n_chars"), Seq("doc_id"))
        .groupBy("min_df")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("schars"))
        .select(col("min_df"), col("n_docs"),
          (col("schars").cast("double") / col("n_docs").cast("double"))
            .as("mean_chars"))
        .orderBy("min_df")
    },
    Some("""WITH post AS (SELECT DISTINCT doc_id, term
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM documents)),
      df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post
             GROUP BY term),
      md AS (SELECT doc_id, MIN(df) AS min_df
             FROM post JOIN df USING (term) GROUP BY doc_id),
      b AS (SELECT min_df, n_chars
            FROM md JOIN documents USING (doc_id))
      SELECT min_df, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars
      FROM b GROUP BY min_df ORDER BY min_df"""),
    covers = Seq("TXT-rare-token"))

  val all: Seq[QueryDef] =
    Seq(q309, q310, q311, q312, q313)
}
