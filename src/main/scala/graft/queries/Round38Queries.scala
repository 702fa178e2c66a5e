package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-38 gate additions (q276+): audience decomposition and
  * multiset vocabulary overlap.
  */
object Round38Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- new vs returning
  // Weekly audience decomposition: each active user counts as NEW in
  // the ISO week of their first event and RETURNING afterwards — the
  // growth-accounting split behind every DAU/WAU dashboard. The first
  // touch comes from a per-user min() aggregate (map-side combined)
  // joined back to the distinct user-week activity set; both sides
  // shuffle on user_id once. ISO week bucketing is the q247-pinned
  // semantics. Everything is exact counts; the returning share is one
  // division.
  private val q276 = QueryDef(
    "q276_new_vs_returning",
    (s, dir) => {
      val e = t(s, dir, "events")
        .select(col("user_id"),
          weekofyear(to_date(col("ts"))).cast("long").as("wk"),
          to_date(col("ts")).as("d"))
      val firstTouch = e.groupBy("user_id").agg(min(col("d")).as("first_d"))
      val active = e.select("user_id", "wk").distinct()
      val firstWk = firstTouch
        .select(col("user_id"),
          weekofyear(col("first_d")).cast("long").as("first_wk"))
      active.join(firstWk, "user_id")
        .groupBy("wk")
        .agg(count(lit(1)).as("active_users"),
          sum(when(col("wk") === col("first_wk"), 1L).otherwise(0L))
            .as("new_users"))
        .withColumn("returning_users", col("active_users") - col("new_users"))
        .select(col("wk"), col("active_users"), col("new_users"),
          col("returning_users"),
          (col("returning_users").cast("double") /
            col("active_users").cast("double")).as("returning_share"))
        .orderBy("wk")
    },
    Some("""WITH e AS (SELECT user_id,
          CAST(weekofyear(CAST(ts AS DATE)) AS BIGINT) AS wk,
          CAST(ts AS DATE) AS d
        FROM events),
      first_touch AS (SELECT user_id, MIN(d) AS first_d FROM e GROUP BY 1),
      active AS (SELECT DISTINCT user_id, wk FROM e),
      first_wk AS (SELECT user_id,
          CAST(weekofyear(first_d) AS BIGINT) AS first_wk
        FROM first_touch),
      g AS (SELECT wk,
          CAST(COUNT(*) AS BIGINT) AS active_users,
          CAST(SUM(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT)
            AS new_users
        FROM active JOIN first_wk USING (user_id) GROUP BY wk)
      SELECT wk, active_users, new_users,
        active_users - new_users AS returning_users,
        CAST(active_users - new_users AS DOUBLE)
          / CAST(active_users AS DOUBLE) AS returning_share
      FROM g ORDER BY wk"""),
    covers = Seq("A-new-returning"))

  // ------------------------------------------------- weighted overlap
  // Multiset (weighted) Jaccard between source vocabularies:
  // Σ min(c_a, c_b) / Σ max(c_a, c_b) over term FREQUENCIES — q271's
  // set version says whether two corpora share words; this says
  // whether they USE them alike (a source quoting another's rare
  // terms once scores low here). A FULL OUTER join on term per pair
  // would explode, so the identity Σmax = n_a + n_b − Σmin turns the
  // problem into an INNER join on shared terms plus per-source
  // totals — exactly the q271 plan shape, integer end to end, one
  // closing division.
  private val q277 = QueryDef(
    "q277_weighted_vocab_overlap",
    (s, dir) => {
      val counts = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy("source", "term").agg(count(lit(1)).as("c"))
      val totals = counts.groupBy("source").agg(sum(col("c")).as("nt"))
      val inter = counts.as("a")
        .join(counts.as("b"), Seq("term"))
        .filter(col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(sum(least(col("a.c"), col("b.c"))).as("sum_min"))
      inter
        .join(totals.select(col("source").as("src_a"), col("nt").as("na")),
          "src_a")
        .join(totals.select(col("source").as("src_b"), col("nt").as("nb")),
          "src_b")
        .select(col("src_a"), col("src_b"), col("sum_min"),
          (col("na") + col("nb") - col("sum_min")).as("sum_max"),
          (col("sum_min").cast("double") /
            (col("na") + col("nb") - col("sum_min")).cast("double"))
            .as("weighted_jaccard"))
        .orderBy("src_a", "src_b")
    },
    Some("""WITH counts AS (SELECT source, t.term, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
        WHERE length(t.term) > 0 GROUP BY 1, 2),
      totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nt
                 FROM counts GROUP BY 1),
      inter AS (SELECT a.source AS src_a, b.source AS src_b,
                  CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS sum_min
        FROM counts a JOIN counts b USING (term)
        WHERE a.source < b.source GROUP BY 1, 2)
      SELECT src_a, src_b, sum_min,
        ta.nt + tb.nt - sum_min AS sum_max,
        CAST(sum_min AS DOUBLE) / CAST(ta.nt + tb.nt - sum_min AS DOUBLE)
          AS weighted_jaccard
      FROM inter
      JOIN totals ta ON ta.source = src_a
      JOIN totals tb ON tb.source = src_b
      ORDER BY src_a, src_b"""),
    covers = Seq("TEXT-weighted-overlap"))

  val all: Seq[QueryDef] =
    Seq(q276, q277)
}
