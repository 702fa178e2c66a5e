package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-18 gate additions (q206+): exact classical statistics the
  * curation loop leans on — chi-square independence of corpus
  * dimensions and rank-sum (Mann-Whitney) AUC for classifier-quality
  * scoring — both reduced to integer arithmetic plus a handful of
  * correctly-rounded IEEE ops so the gate hash-matches.
  */
object Round18Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------- chi-square independence
  // Is the corpus' language mix independent of its source? Pearson's
  // chi² over the FULL source × lang grid (absent cells count as
  // observed 0 — dropping them biases the statistic). The per-cell
  // term (o·N − rt·ct)² / (rt·ct·N) keeps numerator and denominator
  // exact DECIMAL integers — squaring o·N overflows a BIGINT at
  // corpus scale — with ONE division per cell; the cross-cell double
  // sum folds in (source, lang) order on both engines (Spark
  // aggregate over a sorted struct array ↔ DuckDB ordered
  // list_reduce, the q195 pattern), so even float addition order is
  // pinned. Cramér's V normalizes by the grid shape: ÷ and sqrt are
  // correctly rounded, hash-safe.
  private val q206 = QueryDef(
    "q206_chi_square",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val obs = d.groupBy("source", "lang").agg(count(lit(1)).as("o"))
      val grid = d.select("source").distinct()
        .crossJoin(d.select("lang").distinct())
      val rt = d.groupBy("source").agg(count(lit(1)).as("rt"))
      val ct = d.groupBy("lang").agg(count(lit(1)).as("ct"))
      val n = d.select(count(lit(1)).as("n"))
      val dec = "decimal(38,0)"
      val cells = grid
        .join(obs, Seq("source", "lang"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .join(rt, "source").join(ct, "lang").crossJoin(n)
        .withColumn("num",
          pow2(col("o").cast(dec) * col("n").cast(dec)
            - col("rt").cast(dec) * col("ct").cast(dec)))
        .withColumn("den",
          col("rt").cast(dec) * col("ct").cast(dec) * col("n").cast(dec))
        .withColumn("term", col("num").cast("double") / col("den").cast("double"))
      cells
        .agg(
          count(lit(1)).as("n_cells"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          aggregate(
            sort_array(collect_list(struct(col("source"), col("lang"), col("term")))),
            lit(0.0), (acc, x) => acc + x.getField("term")).as("chi2"),
          first(col("n")).as("n_docs"))
        .select(
          col("n_cells"),
          ((col("n_sources") - 1) * (col("n_langs") - 1)).as("dof"),
          col("chi2"),
          sqrt(col("chi2") / (col("n_docs") *
            least(col("n_sources") - 1, col("n_langs") - 1)).cast("double"))
            .as("cramers_v"))
    },
    Some("""WITH obs AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
          FROM documents GROUP BY 1, 2),
      grid AS (SELECT s.source, l.lang
          FROM (SELECT DISTINCT source FROM documents) s,
               (SELECT DISTINCT lang FROM documents) l),
      rt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS rt FROM documents GROUP BY 1),
      ct AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS ct FROM documents GROUP BY 1),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
      cells AS (
        SELECT g.source, g.lang,
          CAST((COALESCE(o, 0)::HUGEINT * n::HUGEINT - rt::HUGEINT * ct::HUGEINT)
            * (COALESCE(o, 0)::HUGEINT * n::HUGEINT - rt::HUGEINT * ct::HUGEINT)
            AS DOUBLE)
          / CAST(rt::HUGEINT * ct::HUGEINT * n::HUGEINT AS DOUBLE) AS term
        FROM grid g
        LEFT JOIN obs USING (source, lang)
        JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN n)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
        CAST((COUNT(DISTINCT source) - 1) * (COUNT(DISTINCT lang) - 1) AS BIGINT) AS dof,
        list_reduce(list(term ORDER BY source, lang), (a, b) -> a + b) AS chi2,
        sqrt(list_reduce(list(term ORDER BY source, lang), (a, b) -> a + b)
          / CAST((SELECT n FROM n)
            * LEAST(COUNT(DISTINCT source) - 1, COUNT(DISTINCT lang) - 1) AS DOUBLE))
          AS cramers_v
      FROM cells"""),
    covers = Seq("STAT-chi-square"))

  private def pow2(c: Column): Column = c * c

  // --------------------------------------------- rank-sum AUC
  // Mann-Whitney AUC of "does embedding dim 1 separate label L from
  // the rest", one-vs-rest per label — the eval metric behind every
  // quality-classifier gate in a curation loop. Exact: ties
  // contribute ½ via doubled average ranks (2·r̄ = 2·rank + ties − 1,
  // integers end-to-end), AUC = (2R − n_pos(n_pos+1)) / (2·n_pos·n_neg)
  // as ONE division of exact BIGINTs. The global score ranking is a
  // single window sort here; at 100 TB rank() range-partitions by
  // score with per-partition offsets (the q159 equi-depth shape) —
  // the integer arithmetic is unchanged.
  private val q207 = QueryDef(
    "q207_auc_ranksum",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("label"),
          element_at(col("embedding"), 1).cast("double").as("score"))
      val wr = Window.orderBy("score")
      val wt = Window.partitionBy("score")
      val ranked = e
        .withColumn("rk", rank().over(wr).cast("long"))
        .withColumn("ties", count(lit(1)).over(wt))
        .withColumn("r2", lit(2L) * col("rk") + col("ties") - 1L)
      val n = ranked.select(count(lit(1)).as("n_all"))
      ranked.groupBy("label")
        .agg(count(lit(1)).as("n_pos"), sum(col("r2")).as("r2sum"))
        .crossJoin(n)
        .select(col("label"), col("n_pos"),
          ((col("r2sum") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
            (lit(2L) * col("n_pos") * (col("n_all") - col("n_pos"))).cast("double"))
            .as("auc"))
        .orderBy("label")
    },
    Some("""WITH e AS (SELECT label, CAST(embedding[1] AS DOUBLE) AS score FROM embeddings),
      ranked AS (
        SELECT label,
          2 * RANK() OVER (ORDER BY score) + COUNT(*) OVER (PARTITION BY score) - 1 AS r2
        FROM e),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all FROM e)
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_pos,
        CAST(CAST(SUM(r2) AS BIGINT) - COUNT(*) * (COUNT(*) + 1) AS DOUBLE)
          / CAST(2 * COUNT(*) * (n_all - COUNT(*)) AS DOUBLE) AS auc
      FROM ranked CROSS JOIN n
      GROUP BY label, n_all ORDER BY label"""),
    covers = Seq("STAT-auc"))

  // --------------------------------------------- Kolmogorov-Smirnov
  // Two-sample KS distance between the dim-1 score distributions of
  // even- and odd-labeled vectors — the drift test between two
  // corpus slices. Exact to the last bit: the ECDF gap at a point is
  // |cumA/nA − cumB/nB| = |cumA·nB − cumB·nA| / (nA·nB), so the
  // maximum is found over cross-multiplied INTEGERS (no float
  // compare ever decides the argmax) and divided once at the end.
  // One distinct-score aggregate, one ordered window — at 100 TB the
  // cumulative sums range-partition by score like any global rank.
  private val q208 = QueryDef(
    "q208_ks_statistic",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select((col("label") % 2).as("g"),
          element_at(col("embedding"), 1).cast("double").as("score"))
      val per = e.groupBy("score")
        .agg(
          sum(when(col("g") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("g") === 1, 1L).otherwise(0L)).as("cb"))
      val w = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = per
        .withColumn("cum_a", sum(col("ca")).over(w))
        .withColumn("cum_b", sum(col("cb")).over(w))
      val ns = e.agg(
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("nb"))
      cum.crossJoin(ns)
        .select(col("na"), col("nb"),
          abs(col("cum_a") * col("nb") - col("cum_b") * col("na")).as("gap"))
        .groupBy("na", "nb")
        .agg(max(col("gap")).as("ks_num"))
        .select(col("na"), col("nb"), col("ks_num"),
          (col("ks_num").cast("double") / (col("na") * col("nb")).cast("double"))
            .as("ks"))
    },
    Some("""WITH e AS (
        SELECT label % 2 AS g, CAST(embedding[1] AS DOUBLE) AS score FROM embeddings),
      per AS (
        SELECT score,
          CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM e GROUP BY score),
      cum AS (
        SELECT
          CAST(SUM(ca) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
          CAST(SUM(cb) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
        FROM per),
      ns AS (SELECT
          CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
          CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
        FROM e)
      SELECT na, nb,
        CAST(MAX(ABS(cum_a * nb - cum_b * na)) AS BIGINT) AS ks_num,
        CAST(MAX(ABS(cum_a * nb - cum_b * na)) AS DOUBLE)
          / CAST(na * nb AS DOUBLE) AS ks
      FROM cum CROSS JOIN ns
      GROUP BY na, nb"""),
    covers = Seq("STAT-ks"))

  // --------------------------------------------- Cohen's kappa
  // Chance-corrected agreement between the declared `lang` column and
  // q26's heuristic language identifier — the inter-annotator metric
  // for deciding whether a cheap labeler can replace an expensive
  // one. κ = (agree·n − Σ_c rowₙ(c)·colₙ(c)) / (n² − Σ_c rowₙ(c)·colₙ(c)):
  // both numerator and denominator are exact BIGINT bilinears of
  // marginal counts, so κ is ONE division of integers. The heuristic
  // 'unknown' class has zero row-marginal and drops out of the
  // chance term by itself.
  private val q209 = QueryDef(
    "q209_cohens_kappa",
    (s, dir) => {
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      def has(words: String*): Column =
        words.map(w => padded.contains(s" $w ")).reduce(_ || _)
      val pred = when(has("der", "und", "nicht", "das"), "de")
        .when(has("el", "los", "las", "una"), "es")
        .when(has("le", "les", "des", "une"), "fr")
        .when(has("de", "het", "een", "niet"), "nl")
        .when(has("the", "and", "of", "is"), "en")
        .otherwise("unknown")
      val d = t(s, dir, "documents").select(col("lang"), pred.as("pred_lang"))
      val ra = d.groupBy(col("lang").as("cls")).agg(count(lit(1)).as("ra"))
      val rb = d.groupBy(col("pred_lang").as("cls")).agg(count(lit(1)).as("rb"))
      val pe = ra.join(rb, "cls")
        .agg(sum(col("ra") * col("rb")).as("pe_num"))
      d.agg(
          count(lit(1)).as("n"),
          sum(when(col("lang") === col("pred_lang"), 1L).otherwise(0L)).as("agree"))
        .crossJoin(pe)
        .select(col("n"), col("agree"), col("pe_num"),
          ((col("agree") * col("n") - col("pe_num")).cast("double") /
            (col("n") * col("n") - col("pe_num")).cast("double")).as("kappa"))
    },
    Some {
      def has(words: Seq[String]): String =
        words.map(w => s"contains(' ' || lower(text) || ' ', ' $w ')")
          .mkString("(", " OR ", ")")
      s"""WITH d AS (
        SELECT lang,
          CASE WHEN ${has(Seq("der", "und", "nicht", "das"))} THEN 'de'
               WHEN ${has(Seq("el", "los", "las", "una"))} THEN 'es'
               WHEN ${has(Seq("le", "les", "des", "une"))} THEN 'fr'
               WHEN ${has(Seq("de", "het", "een", "niet"))} THEN 'nl'
               WHEN ${has(Seq("the", "and", "of", "is"))} THEN 'en'
               ELSE 'unknown' END AS pred_lang
        FROM documents),
      ra AS (SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS ra FROM d GROUP BY 1),
      rb AS (SELECT pred_lang AS cls, CAST(COUNT(*) AS BIGINT) AS rb FROM d GROUP BY 1),
      pe AS (SELECT CAST(SUM(ra * rb) AS BIGINT) AS pe_num FROM ra JOIN rb USING (cls))
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) AS BIGINT) AS agree,
        pe_num,
        CAST(SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) * COUNT(*) - pe_num AS DOUBLE)
          / CAST(COUNT(*) * COUNT(*) - pe_num AS DOUBLE) AS kappa
      FROM d CROSS JOIN pe
      GROUP BY pe_num"""
    },
    covers = Seq("STAT-kappa"))

  // ------------------------------------- precision/recall/F1 sweep
  // Classifier operating-point sweep: precision, recall and F1 of
  // "dim-1 score ≥ t ⇒ even label" at each decile threshold of the
  // score distribution. Thresholds are EXACT order statistics
  // (row_number = ceil(q·n), q164's integer arithmetic — no
  // interpolated floats), the 9-row threshold table broadcasts into
  // a bounded 9× fan-out, and every metric is ONE division of exact
  // integer confusion counts. The full sweep is a single corpus scan
  // + one keyed aggregate — not 9 passes.
  private val q210 = QueryDef(
    "q210_pr_f1_sweep",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select((col("label") % 2 === 0).as("pos"),
          element_at(col("embedding"), 1).cast("double").as("score"))
      val n = e.count()
      val ranked = e.select(col("score"))
        .withColumn("rn", row_number().over(Window.orderBy("score", "score")))
      val thresholds = ranked
        .join(
          s.range(1, 10).select(col("id").as("decile"),
            ceil(col("id") * n / 10.0).cast("long").as("rn")),
          "rn")
        .select(col("decile"), col("score").as("t"))
      e.crossJoin(broadcast(thresholds))
        .groupBy("decile", "t")
        .agg(
          sum(when(col("score") >= col("t") && col("pos"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("score") >= col("t") && !col("pos"), 1L).otherwise(0L)).as("fp"),
          sum(when(col("score") < col("t") && col("pos"), 1L).otherwise(0L)).as("fn"))
        .select(col("decile"), col("tp"), col("fp"), col("fn"),
          (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
            .as("precision"),
          (col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
            .as("recall"),
          ((lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double")).as("f1"))
        .orderBy("decile")
    },
    Some("""WITH e AS (
        SELECT label % 2 = 0 AS pos, CAST(embedding[1] AS DOUBLE) AS score
        FROM embeddings),
      ranked AS (
        SELECT score, row_number() OVER (ORDER BY score, score) AS rn FROM e),
      n AS (SELECT COUNT(*) AS n FROM e),
      thresholds AS (
        SELECT d.decile, r.score AS t
        FROM (SELECT unnest(generate_series(1, 9)) AS decile) d
        JOIN n ON TRUE
        JOIN ranked r ON r.rn = CAST(CEIL(d.decile * n / 10.0) AS BIGINT)),
      cm AS (
        SELECT decile, t,
          CAST(SUM(CASE WHEN score >= t AND pos THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          CAST(SUM(CASE WHEN score >= t AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          CAST(SUM(CASE WHEN score < t AND pos THEN 1 ELSE 0 END) AS BIGINT) AS fn
        FROM e CROSS JOIN thresholds GROUP BY decile, t)
      SELECT decile, tp, fp, fn,
        CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
        CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall,
        CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) AS f1
      FROM cm ORDER BY decile"""),
    covers = Seq("STAT-pr-f1"))

  // ------------------------------------- degree assortativity
  // Do heavily-co-purchased parts pair with other heavy parts?
  // Pearson correlation of endpoint degrees over the co-purchase
  // graph's symmetrized edges — the graph-health diagnostic next to
  // q151/q152/q161. Degrees and all five power sums are exact
  // integers (DECIMAL(38,0) bilinears: m·Σxy overflows a BIGINT at
  // fact scale), so r is one correctly-rounded double tree at the
  // very end. Edges dedup across orders (degree = distinct
  // neighbors); the in-row pair expansion is q200's — no self-join.
  private val q211 = QueryDef(
    "q211_degree_assortativity",
    (s, dir) => {
      // distinct co-purchase pairs (u < v) from the session-scoped
      // shared cache — the same set the in-row pair expansion this
      // replaced produced, at zero per-execution build cost
      val edges = GraphGateSource.copurchaseW(s, dir).select("u", "v")
      val deg = edges.select(col("u").as("node"))
        .unionAll(edges.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      // BROADCAST the degree fetches: deg is O(#nodes) (a dimension,
      // not a fact), and the shuffled form re-exchanges the edge frame
      // twice — measured −30% at sf1 AND the hot-at-max skew rung
      // (7.8→5.4 s / 5.2→3.7 s, same-JVM min-of-3, round-10 A/B).
      // Structurally it also removes the only place a hub at the id
      // MAXIMUM could serialize: the id-canonical edges put such a hub
      // ONLY on the v side, so the v-join's shuffle partition carries
      // the hub's whole edge mass — with no exchange there is nothing
      // to skew. At 10⁹ nodes (deg outgrows a broadcast) fall back to
      // SkewJoin.saltedInnerJoin on the v fetch — measured WORSE here
      // (7.7/7.1 s: replication cost without a straggler to pay it off)
      // so it is the fallback, not the default.
      val withDeg = edges
        .join(broadcast(deg.select(col("node").as("u"), col("deg").as("du"))), "u")
        .join(broadcast(deg.select(col("node").as("v"), col("deg").as("dv"))), "v")
        .select("du", "dv")
      val sym = withDeg.select(col("du").as("x"), col("dv").as("y"))
        .unionAll(withDeg.select(col("dv").as("x"), col("du").as("y")))
      val dec = "decimal(38,0)"
      sym.agg(
          count(lit(1)).as("m"),
          sum(col("x")).as("sx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sx2"))
        .select(col("m"), col("sx"), col("sxy"), col("sx2"),
          (((col("m").cast(dec) * col("sxy").cast(dec)
            - col("sx").cast(dec) * col("sx").cast(dec)).cast("double")) /
            ((col("m").cast(dec) * col("sx2").cast(dec)
              - col("sx").cast(dec) * col("sx").cast(dec)).cast("double")))
            .as("assortativity"))
    },
    Some("""WITH baskets AS (
        SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
        FROM lineitem GROUP BY l_orderkey),
      edges AS (
        SELECT DISTINCT ps[i] AS u, ps[j] AS v
        FROM baskets,
          UNNEST(generate_series(1, len(ps))) AS ti(i),
          UNNEST(generate_series(1, len(ps))) AS tj(j)
        WHERE i < j),
      deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
          SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
        GROUP BY node),
      sym AS (
        SELECT du.deg AS x, dv.deg AS y
        FROM edges JOIN deg du ON u = du.node JOIN deg dv ON v = dv.node
        UNION ALL
        SELECT dv.deg, du.deg
        FROM edges JOIN deg du ON u = du.node JOIN deg dv ON v = dv.node)
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
        CAST(SUM(x) AS BIGINT) AS sx,
        CAST(SUM(x * y) AS BIGINT) AS sxy,
        CAST(SUM(x * x) AS BIGINT) AS sx2,
        CAST(COUNT(*)::HUGEINT * SUM(x * y)::HUGEINT
          - SUM(x)::HUGEINT * SUM(x)::HUGEINT AS DOUBLE)
        / CAST(COUNT(*)::HUGEINT * SUM(x * x)::HUGEINT
          - SUM(x)::HUGEINT * SUM(x)::HUGEINT AS DOUBLE) AS assortativity
      FROM sym"""),
    covers = Seq("GRAPH-assortativity"))

  // ------------------------------------- top-k as a mergeable aggregate
  // graft.functions.ExactTopK under the gate: top-3 order totals per
  // priority class via the TypedImperativeAggregate (bounded min-heap
  // state, map-side combine ships ≤k values per group instead of the
  // group's rows — the winning shape for tiny k over huge groups; the
  // window row_number form is gated separately as q58). Cents-exact
  // DECIMAL→BIGINT values; the oracle slices DuckDB's descending
  // ordered list aggregate.
  private val q212 = QueryDef(
    "q212_topk_aggregate",
    (s, dir) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
      t(s, dir, "orders")
        .select(col("o_orderpriority"), cents.as("cents"))
        .groupBy("o_orderpriority")
        .agg(
          graft.functions.ExactTopK(s, col("cents"), 3).as("topk"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"),
          array_join(transform(col("topk"), _.cast("string")), ",").as("top3"),
          col("n"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
        array_to_string(
          (list(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) DESC))[:3],
          ',') AS top3,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    covers = Seq("AGG-typed-imperative-topk"))

  val all: Seq[QueryDef] =
    Seq(q206, q207, q208, q209, q210, q211, q212)
}
