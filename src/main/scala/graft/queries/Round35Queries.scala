package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-35 gate additions (q269+): diversity and distribution-drift
  * measures that stay inside the determinism rules — Simpson's index
  * is integer-rational end to end, and Hellinger distance needs only
  * correctly-rounded IEEE sqrt (ln-based entropy/KL are banned from
  * hash-gated queries: no two libms round them identically, see q52).
  */
object Round35Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def toks(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)

  // ------------------------------------------------- Simpson diversity
  // Vocabulary concentration per source: Simpson's index
  // S = Σ c(c−1) / (n(n−1)) — the probability two tokens drawn
  // without replacement are the SAME term — and its Gini–Simpson
  // complement (diversity). The entropy alternative that stays exact:
  // Σ c(c−1) is a plain LONG sum of integer products, and the index
  // is ONE division of exact integers — no logarithm anywhere, so the
  // hash gate holds across engines. Two cascaded count aggregates on
  // the token stream; at any corpus size this is a map-side-combined
  // shuffle on (source, term) then on source.
  private val q269 = QueryDef(
    "q269_simpson_diversity",
    (s, dir) => {
      val counts = toks(s, dir).groupBy("source", "term")
        .agg(count(lit(1)).as("c"))
      counts.groupBy("source")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_terms"),
          sum(col("c") * (col("c") - 1L)).as("s_num"))
        .filter(col("n_tokens") > 1)
        .select(col("source"), col("n_tokens"), col("n_terms"),
          (col("s_num").cast("double") /
            (col("n_tokens").cast("double")
              * (col("n_tokens") - 1L).cast("double"))).as("simpson"),
          (lit(1.0d) - col("s_num").cast("double") /
            (col("n_tokens").cast("double")
              * (col("n_tokens") - 1L).cast("double"))).as("diversity"))
        .orderBy("source")
    },
    Some("""WITH tok AS (SELECT source, t.term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
        WHERE length(t.term) > 0),
      counts AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
                 FROM tok GROUP BY 1, 2),
      g AS (SELECT source,
          CAST(SUM(c) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_terms,
          CAST(SUM(c * (c - 1)) AS BIGINT) AS s_num
        FROM counts GROUP BY source)
      SELECT source, n_tokens, n_terms,
        CAST(s_num AS DOUBLE) /
          (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE)) AS simpson,
        CAST(1 AS DOUBLE) - CAST(s_num AS DOUBLE) /
          (CAST(n_tokens AS DOUBLE) * CAST(n_tokens - 1 AS DOUBLE)) AS diversity
      FROM g WHERE n_tokens > 1 ORDER BY source"""),
    covers = Seq("TEXT-simpson"))

  // ------------------------------------------------- Hellinger drift
  // How far each source's term distribution sits from the corpus-wide
  // one: squared Hellinger distance
  // H² = ½ Σ_union (√p − √q)², folded as Σ_present ((√p−√q)² − q) + 1
  // (terms absent from the source contribute exactly q, and every
  // source term is in the global vocabulary). Bounded [0,1] like
  // q246's total-variation drift but sensitive to the tail. Every
  // per-term value is ONE fixed IEEE tree over exact counts (sqrt is
  // correctly rounded — the q195 rule), and the cross-term double sum
  // folds an ORDERED term list sequentially on both engines
  // (aggregate ↔ list_reduce), so the gate hash holds.
  private val q270 = QueryDef(
    "q270_hellinger_drift",
    (s, dir) => {
      val tk = toks(s, dir)
      val sc = tk.groupBy("source", "term").agg(count(lit(1)).as("c"))
      val st = tk.groupBy("source").agg(count(lit(1)).as("ns"))
      val gc = tk.groupBy("term").agg(count(lit(1)).as("g"))
      val gt = tk.agg(count(lit(1)).as("ng"))
      val p = col("c").cast("double") / col("ns").cast("double")
      val q = col("g").cast("double") / col("ng").cast("double")
      val d = sqrt(p) - sqrt(q)
      val terms = sc.join(st, "source").join(gc, "term").crossJoin(broadcast(gt))
        .withColumn("v", d * d - q)
      terms.groupBy("source")
        .agg(first(col("ns")).as("n_tokens"),
          count(lit(1)).as("n_shared_terms"),
          aggregate(
            sort_array(collect_list(struct(col("term"), col("v")))),
            lit(0.0d), (acc, x) => acc + x.getField("v")).as("fold"))
        .select(col("source"), col("n_tokens"), col("n_shared_terms"),
          ((col("fold") + lit(1.0d)) / lit(2.0d)).as("h2"),
          sqrt((col("fold") + lit(1.0d)) / lit(2.0d)).as("hellinger"))
        .orderBy("source")
    },
    Some("""WITH tok AS (SELECT source, t.term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
        WHERE length(t.term) > 0),
      sc AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
             FROM tok GROUP BY 1, 2),
      st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
             FROM tok GROUP BY 1),
      gc AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS g
             FROM tok GROUP BY 1),
      gt AS (SELECT CAST(COUNT(*) AS BIGINT) AS ng FROM tok),
      terms AS (SELECT sc.source, sc.term,
          (sqrt(CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))
            - sqrt(CAST(g AS DOUBLE) / CAST(ng AS DOUBLE)))
          * (sqrt(CAST(c AS DOUBLE) / CAST(ns AS DOUBLE))
            - sqrt(CAST(g AS DOUBLE) / CAST(ng AS DOUBLE)))
          - CAST(g AS DOUBLE) / CAST(ng AS DOUBLE) AS v,
          ns
        FROM sc JOIN st USING (source) JOIN gc USING (term) CROSS JOIN gt),
      folded AS (SELECT source,
          MIN(ns) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
          list_reduce(list(v ORDER BY term), (a, b) -> a + b) AS fold
        FROM terms GROUP BY source)
      SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, n_shared_terms,
        (fold + CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE) AS h2,
        sqrt((fold + CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE)) AS hellinger
      FROM folded ORDER BY source"""),
    covers = Seq("TEXT-hellinger"))

  val all: Seq[QueryDef] =
    Seq(q269, q270)
}
