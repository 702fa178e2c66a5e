package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-97 gate additions (q502–q506): the causal-inference toolkit
  * — difference-in-differences, stratified ATE (strata folded in
  * fixed order), Fellegi-Sunter record-linkage weights, local-linear
  * regression discontinuity (Cramer 2×2 over exact moments), and the
  * event-study coefficient series. Every estimate is a fixed
  * arithmetic tree over exact sums — causal econometrics under a
  * hash gate.
  */
object Round97Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def cents: Column =
    (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)

  private def segJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment").as("segment")), Seq("o_custkey"))

  // ------------------------------------------------- diff-in-diff
  // Canonical 2×2 DiD: BUILDING customers (treated) vs the rest,
  // 1996–97 pre vs 1998–99 post, outcome = mean order value. Four
  // exact-ratio cell means, one subtraction tree — the
  // parallel-trends workhorse. The pre-period gap rides along as
  // the trend diagnostic.
  private val q502 = QueryDef(
    "q502_diff_in_diff",
    (s, dir) => {
      val o = segJoin(s, dir)
        .select((col("segment") === "BUILDING").as("treated"),
          cents.as("y"), year(to_date(col("o_orderdate"))).as("yr"))
        .filter(col("yr") >= 1996 && col("yr") <= 1999)
        .withColumn("post", col("yr") >= 1998)
      val cells = o.groupBy("treated", "post")
        .agg(sum("y").as("sy"), count(lit(1)).as("n"))
        .withColumn("mu",
          col("sy").cast("double") / col("n").cast("double"))
      val wide = cells.agg(
        max(when(col("treated") && col("post"), col("mu"))).as("t_post"),
        max(when(col("treated") && !col("post"), col("mu"))).as("t_pre"),
        max(when(!col("treated") && col("post"), col("mu"))).as("c_post"),
        max(when(!col("treated") && !col("post"), col("mu"))).as("c_pre"))
      wide.select(col("t_pre"), col("t_post"), col("c_pre"), col("c_post"),
        ((col("t_post") - col("t_pre")) - (col("c_post") - col("c_pre")))
          .as("did_cents"),
        (col("t_pre") - col("c_pre")).as("pre_gap_cents"))
    },
    Some("""WITH o AS (SELECT
          (c.c_mktsegment = 'BUILDING') AS treated,
          CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS y,
          (year(CAST(o.o_orderdate AS DATE)) >= 1998) AS post
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE year(CAST(o.o_orderdate AS DATE)) BETWEEN 1996 AND 1999),
      cells AS (SELECT treated, post,
          CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu
        FROM o GROUP BY 1, 2),
      wide AS (SELECT
          MAX(CASE WHEN treated AND post THEN mu END) AS t_post,
          MAX(CASE WHEN treated AND NOT post THEN mu END) AS t_pre,
          MAX(CASE WHEN NOT treated AND post THEN mu END) AS c_post,
          MAX(CASE WHEN NOT treated AND NOT post THEN mu END) AS c_pre
        FROM cells)
      SELECT t_pre, t_post, c_pre, c_post,
        (t_post - t_pre) - (c_post - c_pre) AS did_cents,
        t_pre - c_pre AS pre_gap_cents
      FROM wide"""),
    covers = Seq("CAUSAL-did"))

  // ------------------------------------------------- stratified ATE
  // Stratified treatment-effect estimate: urgent-priority orders
  // (treated) vs others within each segment stratum, pooled with
  // stratum-share weights. Per-stratum effects are exact-ratio
  // differences; the pooled ATE folds Σ w_h·Δ_h in segment order —
  // the Neyman-stratified estimator that a raw mean-difference
  // confounds.
  private val q503 = QueryDef(
    "q503_stratified_ate",
    (s, dir) => {
      val o = segJoin(s, dir)
        .select(col("segment"),
          (col("o_orderpriority") === "1-URGENT").as("tr"), cents.as("y"))
      val strata = o.groupBy("segment")
        .agg(count(lit(1)).as("n_h"),
          sum(when(col("tr"), col("y"))).as("s1"),
          sum(when(col("tr"), 1L).otherwise(0L)).as("n1"),
          sum(when(!col("tr"), col("y"))).as("s0"),
          sum(when(!col("tr"), 1L).otherwise(0L)).as("n0"))
        .withColumn("effect",
          col("s1").cast("double") / col("n1").cast("double") -
            col("s0").cast("double") / col("n0").cast("double"))
        .localCheckpoint()
      val pooled = strata
        .agg(sum("n_h").as("n"),
          sort_array(collect_list(struct(col("segment"), col("n_h"),
            col("effect")))).as("sl"))
        .withColumn("wsum",
          aggregate(col("sl"), lit(0.0), (a, e) =>
            a + e.getField("n_h").cast("double") * e.getField("effect")))
        .select((col("wsum") / col("n").cast("double")).as("ate"))
      strata.crossJoin(broadcast(pooled))
        .select(col("segment"), col("n_h"), col("n1"), col("n0"),
          col("effect").as("effect_cents"), col("ate").as("ate_cents"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT c.c_mktsegment AS segment,
          (o.o_orderpriority = '1-URGENT') AS tr,
          CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      strata AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_h,
          CAST(SUM(CASE WHEN tr THEN y END) AS BIGINT) AS s1,
          CAST(COUNT(*) FILTER (WHERE tr) AS BIGINT) AS n1,
          CAST(SUM(CASE WHEN NOT tr THEN y END) AS BIGINT) AS s0,
          CAST(COUNT(*) FILTER (WHERE NOT tr) AS BIGINT) AS n0
        FROM o GROUP BY 1),
      eff AS (SELECT *,
          CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
            CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS effect
        FROM strata),
      pooled AS (SELECT
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(CAST(n_h AS DOUBLE) * effect ORDER BY segment)),
            (a, b) -> a + b) /
            CAST(SUM(n_h) AS DOUBLE) AS ate
        FROM eff)
      SELECT e.segment, e.n_h, e.n1, e.n0,
        e.effect AS effect_cents, p.ate AS ate_cents
      FROM eff e CROSS JOIN pooled p ORDER BY e.segment"""),
    covers = Seq("CAUSAL-stratified-ate"))

  // ------------------------------------------------- Fellegi-Sunter
  // Record-linkage agreement weights: exact-duplicate text pairs are
  // the labeled matches M; for each comparison field (lang, source,
  // 100-char length band) m = P(agree|M) over the match pairs and
  // u = P(agree|random) from value frequencies Σf(f−1)/(N(N−1)) —
  // all exact-integer ratios, m/u the linkage odds. The weights
  // table that turns fuzzy matching into scores.
  private val q504 = QueryDef(
    "q504_fellegi_sunter",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          expr("n_chars DIV 100").as("band"))
        .localCheckpoint()
      val n = docs.count()
      val matches = docs.as("a")
        .join(docs.as("b"), col("a.text") === col("b.text") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(
          (col("a.lang") === col("b.lang")).as("ag_lang"),
          (col("a.source") === col("b.source")).as("ag_source"),
          (col("a.band") === col("b.band")).as("ag_band"))
      val m = matches.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("ag_lang"), 1L).otherwise(0L)).as("m_lang"),
        sum(when(col("ag_source"), 1L).otherwise(0L)).as("m_source"),
        sum(when(col("ag_band"), 1L).otherwise(0L)).as("m_band"))
      val uAgg = Seq("lang", "source", "band").map { f =>
        docs.groupBy(f).agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * (col("c") - 1L)).as(s"u${f}_num"))
      }.reduce(_ crossJoin _)
      m.crossJoin(uAgg)
        .select(
          explode(array(
            struct(lit("1_lang").as("field"),
              (col("m_lang").cast("double") / col("n_pairs").cast("double"))
                .as("m"),
              (col("ulang_num").cast("double") /
                lit((n * (n - 1)).toDouble)).as("u")),
            struct(lit("2_source").as("field"),
              (col("m_source").cast("double") /
                col("n_pairs").cast("double")).as("m"),
              (col("usource_num").cast("double") /
                lit((n * (n - 1)).toDouble)).as("u")),
            struct(lit("3_band").as("field"),
              (col("m_band").cast("double") / col("n_pairs").cast("double"))
                .as("m"),
              (col("uband_num").cast("double") /
                lit((n * (n - 1)).toDouble)).as("u")))).as("r"))
        .select(col("r.field"), col("r.m"), col("r.u"),
          (col("r.m") / col("r.u")).as("odds"))
        .orderBy("field")
    },
    Some("""WITH docs AS (SELECT doc_id, text, lang, source,
          n_chars // 100 AS band FROM documents),
      n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM docs),
      matches AS (SELECT
          (a.lang = b.lang) AS ag_lang,
          (a.source = b.source) AS ag_source,
          (a.band = b.band) AS ag_band
        FROM docs a JOIN docs b
          ON b.text = a.text AND a.doc_id < b.doc_id),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(COUNT(*) FILTER (WHERE ag_lang) AS BIGINT) AS m_lang,
          CAST(COUNT(*) FILTER (WHERE ag_source) AS BIGINT) AS m_source,
          CAST(COUNT(*) FILTER (WHERE ag_band) AS BIGINT) AS m_band
        FROM matches),
      ul AS (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS u_num FROM
        (SELECT COUNT(*) AS c FROM docs GROUP BY lang)),
      us AS (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS u_num FROM
        (SELECT COUNT(*) AS c FROM docs GROUP BY source)),
      ub AS (SELECT CAST(SUM(c * (c - 1)) AS BIGINT) AS u_num FROM
        (SELECT COUNT(*) AS c FROM docs GROUP BY band)),
      rows_ AS (
        SELECT '1_lang' AS field,
          CAST(m.m_lang AS DOUBLE) / CAST(m.n_pairs AS DOUBLE) AS m,
          CAST(ul.u_num AS DOUBLE) /
            CAST(n.n * (n.n - 1) AS DOUBLE) AS u
        FROM m, ul, n
        UNION ALL
        SELECT '2_source',
          CAST(m.m_source AS DOUBLE) / CAST(m.n_pairs AS DOUBLE),
          CAST(us.u_num AS DOUBLE) / CAST(n.n * (n.n - 1) AS DOUBLE)
        FROM m, us, n
        UNION ALL
        SELECT '3_band',
          CAST(m.m_band AS DOUBLE) / CAST(m.n_pairs AS DOUBLE),
          CAST(ub.u_num AS DOUBLE) / CAST(n.n * (n.n - 1) AS DOUBLE)
        FROM m, ub, n)
      SELECT field, m, u, m / u AS odds FROM rows_ ORDER BY field"""),
    covers = Seq("LINK-fellegi-sunter"))

  // ------------------------------------------------- RDD (sharp)
  // Local-linear regression discontinuity at the $15,000 order-value
  // threshold, outcome = line count per order, bandwidth $2,000:
  // each side fits y = α + βx (x centered at the cutoff) by exact
  // 2×2 Cramer — α̂ = (Σy·Σx² − Σx·Σxy)/(nΣx² − (Σx)²), one double
  // division per side — and the RD estimate is α̂₊ − α̂₋. The naive
  // mean jump rides along to show the slope-bias it hides.
  private val q505 = QueryDef(
    "q505_regression_discontinuity",
    (s, dir) => {
      val thr = 1500000L
      val hbw = 200000L
      val lines = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("y"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), cents.as("v"))
        .join(lines, Seq("o_orderkey"))
        .withColumn("x", col("v") - thr)
        .filter(col("x") >= -hbw && col("x") < hbw)
        .withColumn("right", col("x") >= 0L)
      def d38(c: Column): Column = c.cast(DecimalType(38, 0))
      val sides = o.groupBy("right")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(d38(col("x")) * d38(col("x"))).as("sxx"),
          sum("y").as("sy"),
          sum(d38(col("x")) * d38(col("y"))).as("sxy"))
        .withColumn("alpha",
          (d38(col("sy")) * col("sxx") - d38(col("sx")) * col("sxy"))
            .cast("double") /
          (d38(col("n")) * col("sxx") - d38(col("sx")) * d38(col("sx")))
            .cast("double"))
        .withColumn("mu", col("sy").cast("double") / col("n").cast("double"))
      val wide = sides.agg(
        max(when(col("right"), col("alpha"))).as("a_right"),
        max(when(!col("right"), col("alpha"))).as("a_left"),
        max(when(col("right"), col("mu"))).as("mu_right"),
        max(when(!col("right"), col("mu"))).as("mu_left"),
        max(when(col("right"), col("n"))).as("n_right"),
        max(when(!col("right"), col("n"))).as("n_left"))
      wide.select(col("n_left"), col("n_right"),
        (col("mu_right") - col("mu_left")).as("naive_jump"),
        (col("a_right") - col("a_left")).as("rd_estimate"))
    },
    Some("""WITH lines AS (SELECT l_orderkey AS o_orderkey,
          CAST(COUNT(*) AS BIGINT) AS y
        FROM lineitem GROUP BY 1),
      o AS (SELECT
          CAST(CAST(od.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            - 1500000 AS x,
          l.y
        FROM orders od JOIN lines l ON l.o_orderkey = od.o_orderkey
        WHERE CAST(CAST(od.o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT) - 1500000 >= -200000
          AND CAST(CAST(od.o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT) - 1500000 < 200000),
      sides AS (SELECT (x >= 0) AS right_side,
          CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
          SUM(CAST(x AS HUGEINT) * x) AS sxx,
          CAST(SUM(y) AS BIGINT) AS sy,
          SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM o GROUP BY 1),
      fit AS (SELECT right_side, n, sy,
          CAST(CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy
            AS DOUBLE) /
          CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
            AS DOUBLE) AS alpha,
          CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mu
        FROM sides)
      SELECT
        MAX(CASE WHEN NOT right_side THEN n END) AS n_left,
        MAX(CASE WHEN right_side THEN n END) AS n_right,
        MAX(CASE WHEN right_side THEN mu END) -
          MAX(CASE WHEN NOT right_side THEN mu END) AS naive_jump,
        MAX(CASE WHEN right_side THEN alpha END) -
          MAX(CASE WHEN NOT right_side THEN alpha END) AS rd_estimate
      FROM fit"""),
    covers = Seq("CAUSAL-rdd"))

  // ------------------------------------------------- event study
  // Dynamic DiD: the treated-minus-control gap per quarter around
  // the 1998Q1 event, re-based to 1997Q4 — the coefficient series
  // whose flat pre-period IS the parallel-trends test. Quarterly
  // cell means are exact ratios; each coefficient is a fixed
  // four-term tree.
  private val q506 = QueryDef(
    "q506_event_study",
    (s, dir) => {
      val o = segJoin(s, dir)
        .select((col("segment") === "BUILDING").as("treated"),
          cents.as("y"),
          (year(to_date(col("o_orderdate"))) * 4 +
            quarter(to_date(col("o_orderdate"))) - 1).cast(LongType)
            .as("q"))
        .filter(col("q") >= 1997L * 4 && col("q") <= 1999L * 4 + 3)
      val cells = o.groupBy("q", "treated")
        .agg(sum("y").as("sy"), count(lit(1)).as("n"))
        .withColumn("mu",
          col("sy").cast("double") / col("n").cast("double"))
      val gaps = cells.groupBy("q")
        .agg(max(when(col("treated"), col("mu"))).as("mu_t"),
          max(when(!col("treated"), col("mu"))).as("mu_c"))
        .withColumn("gap", col("mu_t") - col("mu_c"))
        .localCheckpoint()
      val base = gaps.filter(col("q") === 1997L * 4 + 3)
        .select(col("gap").as("base_gap"))
      gaps.crossJoin(broadcast(base))
        .select(col("q").as("quarter_idx"),
          (col("q") - (1998L * 4)).as("rel_quarter"),
          col("gap"), (col("gap") - col("base_gap")).as("coef_cents"))
        .orderBy("quarter_idx")
    },
    Some("""WITH o AS (SELECT
          (c.c_mktsegment = 'BUILDING') AS treated,
          CAST(CAST(od.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS y,
          CAST(year(CAST(od.o_orderdate AS DATE)) * 4 +
            quarter(CAST(od.o_orderdate AS DATE)) - 1 AS BIGINT) AS q
        FROM orders od JOIN customer c ON c.c_custkey = od.o_custkey
        WHERE CAST(year(CAST(od.o_orderdate AS DATE)) * 4 +
            quarter(CAST(od.o_orderdate AS DATE)) - 1 AS BIGINT)
          BETWEEN 1997 * 4 AND 1999 * 4 + 3),
      cells AS (SELECT q, treated,
          CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu
        FROM o GROUP BY 1, 2),
      gaps AS (SELECT q,
          MAX(CASE WHEN treated THEN mu END) -
            MAX(CASE WHEN NOT treated THEN mu END) AS gap
        FROM cells GROUP BY q),
      base AS (SELECT gap AS base_gap FROM gaps
        WHERE q = 1997 * 4 + 3)
      SELECT g.q AS quarter_idx, g.q - 1998 * 4 AS rel_quarter,
        g.gap, g.gap - b.base_gap AS coef_cents
      FROM gaps g CROSS JOIN base b ORDER BY quarter_idx"""),
    covers = Seq("CAUSAL-event-study"))

  val all: Seq[QueryDef] = Seq(q502, q503, q504, q505, q506)
}
