package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Round-63 gate additions (q334–q338): distribution comparison and
  * temporal structure — Q-Q tables, change-point scans, exit states,
  * duplication propensity, and rank-location profiles.
  *
  * Determinism: order statistics (percentile_disc, row_number ranks)
  * and exact integer prefix algebra; doubles are terminal divisions.
  */
object Round63Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- Q-Q table
  // Quantile-quantile comparison of document length between each
  // language and the corpus: the harmonization table a score-
  // normalization step reads. percentile_disc picks real members
  // (exact order statistics, no interpolation), evaluated at the
  // deciles; the corpus side broadcasts.
  private val q334 = QueryDef(
    "q334_qq_table",
    (s, dir) => {
      val d = t(s, dir, "documents")
      def qcols(src: DataFrame, pre: String) = src.agg(
        expr(s"percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars)")
          .as(s"${pre}1"),
        (2 to 9).map(i =>
          expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY n_chars)")
            .as(s"$pre$i")): _*)
      val perLang = d.groupBy("lang").agg(
        expr("percentile_disc(0.1) WITHIN GROUP (ORDER BY n_chars)").as("l1"),
        (2 to 9).map(i =>
          expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY n_chars)")
            .as(s"l$i")): _*)
      val corpus = qcols(d, "c")
      val unpivoted = perLang.crossJoin(broadcast(corpus))
        .select(col("lang"), explode(array((1 to 9).map(i =>
          struct(lit(i.toLong).as("decile"),
            col(s"l$i").as("lang_q"), col(s"c$i").as("corpus_q"))): _*))
          .as("p"))
        .select(col("lang"), col("p.decile"),
          // Spark's percentile_disc surfaces DOUBLE even over integer
          // input; the picked values are exact members, so the BIGINT
          // cast is lossless and matches the oracle's type
          col("p.lang_q").cast(LongType).as("lang_q"),
          col("p.corpus_q").cast(LongType).as("corpus_q"))
      unpivoted
        .withColumn("qq_ratio",
          col("lang_q").cast("double") / col("corpus_q").cast("double"))
        .orderBy("lang", "decile")
    },
    Some {
      val langQ = (1 to 9).map(i =>
        s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY n_chars) AS l$i")
        .mkString(", ")
      val corpQ = (1 to 9).map(i =>
        s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY n_chars) AS c$i")
        .mkString(", ")
      val rows = (1 to 9).map(i =>
        s"SELECT lang, CAST($i AS BIGINT) AS decile, " +
          s"CAST(l$i AS BIGINT) AS lang_q, " +
          s"CAST(c$i AS BIGINT) AS corpus_q FROM pl, c")
        .mkString(" UNION ALL ")
      s"""WITH pl AS (SELECT lang, $langQ FROM documents GROUP BY lang),
      c AS (SELECT $corpQ FROM documents),
      u AS ($rows)
      SELECT lang, decile, lang_q, corpus_q,
        CAST(lang_q AS DOUBLE) / CAST(corpus_q AS DOUBLE) AS qq_ratio
      FROM u ORDER BY lang, decile"""
    },
    covers = Seq("STAT-qq"))

  // ------------------------------------------------- change-point scan
  // Largest regime shift per event type: for each day index t of D,
  // the scaled deviation of the prefix count from the uniform path,
  // |D·P_t − t·T| — an exact-integer CUSUM-style scan; the reported
  // day maximizes it (ties → earliest day). Prefix sums are one
  // window per type; the argmax is one more.
  private val q335 = QueryDef(
    "q335_changepoint_scan",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("d")
      val pref = daily
        .withColumn("p", sum(col("x")).over(w))
        .withColumn("t", row_number().over(w).cast(LongType))
      val tot = pref.groupBy("event_type")
        .agg(max(col("p")).as("total"), max(col("t")).as("dd"))
      val dev = pref.join(tot, Seq("event_type"))
        .withColumn("dev",
          abs(col("dd") * col("p") - col("t") * col("total")))
      val wPick = Window.partitionBy("event_type")
        .orderBy(desc("dev"), asc("d"))
      dev.withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
        .select(col("event_type"), col("d").as("changepoint_day"),
          col("t").as("day_index"), col("dd").as("n_days"),
          (col("dev").cast("double") /
            (col("dd") * col("total")).cast("double")).as("magnitude"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, d),
      pref AS (SELECT event_type, d, x,
          CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT)
            AS p,
          CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
            AS BIGINT) AS t
        FROM daily),
      tot AS (SELECT event_type, MAX(p) AS total, MAX(t) AS dd
              FROM pref GROUP BY event_type),
      dev AS (SELECT pref.event_type, d, t, dd, total,
          abs(dd * p - t * total) AS dev
        FROM pref JOIN tot USING (event_type)),
      pick AS (SELECT *, row_number() OVER (PARTITION BY event_type
          ORDER BY dev DESC, d) AS rn FROM dev)
      SELECT event_type, d AS changepoint_day, t AS day_index, dd AS n_days,
        CAST(dev AS DOUBLE) / CAST(dd * total AS DOUBLE) AS magnitude
      FROM pick WHERE rn = 1
      ORDER BY event_type"""),
    covers = Seq("TS-changepoint"))

  // ------------------------------------------------- exit states
  // Where do users end? The distribution of each user's LAST event
  // type ((ts, event_id) total order) — the exit-state table of a
  // churn analysis, with the share per exit type. One window, one
  // aggregate.
  private val q336 = QueryDef(
    "q336_exit_state",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(desc("ts"), desc("event_id"))
      val last = t(s, dir, "events")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      val g = last.groupBy(col("event_type").as("exit_type"))
        .agg(count(lit(1)).as("n_users"))
      val tot = g.agg(sum(col("n_users")).as("t"))
      g.crossJoin(broadcast(tot))
        .select(col("exit_type"), col("n_users"),
          (col("n_users").cast("double") / col("t").cast("double"))
            .as("share"))
        .orderBy("exit_type")
    },
    Some("""WITH last AS (SELECT user_id, event_type,
          row_number() OVER (PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events),
      g AS (SELECT event_type AS exit_type, CAST(COUNT(*) AS BIGINT)
          AS n_users
        FROM last WHERE rn = 1 GROUP BY event_type),
      tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS t FROM g)
      SELECT exit_type, n_users,
        CAST(n_users AS DOUBLE) / CAST(t AS DOUBLE) AS share
      FROM g, tot
      ORDER BY exit_type"""),
    covers = Seq("A-exit-state"))

  // ------------------------------------------------- dup propensity
  // Are longer documents duplicated more? Exact-dup group size
  // (copies per distinct text) crossed with the 200-char length band:
  // per band, distinct texts, total docs, and the mean copy count —
  // the curation prior that decides where dedup effort pays.
  private val q337 = QueryDef(
    "q337_dup_propensity",
    (s, dir) => {
      val groups = t(s, dir, "documents")
        .groupBy(col("text"), expr("n_chars DIV 200").as("len_band"))
        .agg(count(lit(1)).as("copies"))
      groups.groupBy("len_band")
        .agg(count(lit(1)).as("n_texts"), sum(col("copies")).as("n_docs"),
          max(col("copies")).as("max_copies"))
        .select(col("len_band"), col("n_texts"), col("n_docs"),
          col("max_copies"),
          (col("n_docs").cast("double") / col("n_texts").cast("double"))
            .as("mean_copies"))
        .orderBy("len_band")
    },
    Some("""WITH g AS (SELECT text, n_chars // 200 AS len_band,
          CAST(COUNT(*) AS BIGINT) AS copies
        FROM documents GROUP BY text, len_band)
      SELECT len_band, CAST(COUNT(*) AS BIGINT) AS n_texts,
        CAST(SUM(copies) AS BIGINT) AS n_docs,
        MAX(copies) AS max_copies,
        CAST(SUM(copies) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_copies
      FROM g GROUP BY len_band
      ORDER BY len_band"""),
    covers = Seq("DD-propensity"))

  // ------------------------------------------------- rank location
  // Mann-Whitney-style location profile: each source's mean corpus
  // percentile of document length — sources drifting long or short in
  // one number each. Global ranks are unique ((n_chars, doc_id)
  // total order), the mean percentile is Σrank/(n_src·(N+1)) — a
  // single division over exact longs; 0.5 = perfectly central.
  private val q338 = QueryDef(
    "q338_source_rank_location",
    (s, dir) => {
      val d = t(s, dir, "documents")
      // global length rank over ALL DOCUMENTS — row-scale; two-phase
      // GlobalOrder form (round-12 window audit, bit-identical by
      // GlobalOrderSpec)
      val ranked = graft.operators.GlobalOrder.rowNumber(
          d.select(col("source"), col("n_chars"), col("doc_id")),
          col("n_chars"), leadDesc = false,
          Seq(col("n_chars"), col("doc_id")), "rk")
        .withColumn("rk", col("rk").cast(LongType))
      val tot = ranked.agg(count(lit(1)).as("nn"))
      ranked.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("rk")).as("srk"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"),
          (col("srk").cast("double") /
            (col("n_docs") * (col("nn") + 1L)).cast("double"))
            .as("mean_percentile"))
        .orderBy("source")
    },
    Some("""WITH r AS (SELECT source,
          CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rk
        FROM documents),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM r)
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(rk) AS DOUBLE) / CAST(COUNT(*) * (nn + 1) AS DOUBLE)
          AS mean_percentile
      FROM r, tot
      GROUP BY source, nn
      ORDER BY source"""),
    covers = Seq("STAT-rank-location"))

  val all: Seq[QueryDef] =
    Seq(q334, q335, q336, q337, q338)
}
