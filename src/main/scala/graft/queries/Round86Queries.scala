package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}

import graft.Tables

/** Round-86 gate additions (q447–q451): corpus mixture water-filling,
  * a one-level decision stump, modal association (Goodman-Kruskal λ),
  * tail dependence, and weekly growth accounting. Exact integer
  * decisions everywhere — thresholds are found by cross-multiplied
  * comparisons, never by comparing computed floats.
  */
object Round86Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- water-filling
  // Token-budget mixture plan: cap every source at a common level t
  // so the kept corpus hits a 50% token budget — the water-filling
  // allocation behind "no source may dominate the mix". The
  // crossing source is found by the exact integer comparison
  // tok·(n−rn+1) > B − cum_before on the ascending-size order, so
  // the level t = (B − cum_before*)/(n − rn* + 1) is the only
  // division in the plan. Everything is |sources|-sized after one
  // token-count aggregate.
  private val q447 = QueryDef(
    "q447_token_budget_waterfill",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("source"), size(split(col("text"), " ")).as("ntok"))
        .groupBy("source").agg(sum(col("ntok").cast(LongType)).as("tok"))
      val w = Window.orderBy(col("tok"), col("source"))
      val ranked = tok
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("cum", sum("tok").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cum_before", col("cum") - col("tok"))
      val tot = tok.agg(sum("tok").as("total"), count(lit(1)).as("n"))
        .withColumn("budget", expr("total DIV 2"))
      val flagged = ranked.crossJoin(broadcast(tot))
        .withColumn("capped_here",
          col("tok") * (col("n") - col("rn") + 1L) >
            col("budget") - col("cum_before"))
      val star = flagged.filter(col("capped_here"))
        .agg(min("rn").as("rn_star"))
      val level = flagged.join(broadcast(star),
          col("rn") === col("rn_star"))
        .select(col("rn_star"),
          ((col("budget") - col("cum_before")).cast("double") /
            (col("n") - col("rn_star") + 1L).cast("double")).as("t_level"))
      flagged.crossJoin(broadcast(level))
        .withColumn("capped", col("rn") >= col("rn_star"))
        .select(col("source"), col("tok").as("tokens"), col("capped"),
          when(col("capped"), col("t_level"))
            .otherwise(col("tok").cast("double")).as("kept"),
          (when(col("capped"), col("t_level"))
            .otherwise(col("tok").cast("double")) /
            col("tok").cast("double")).as("kept_share"))
        .orderBy("source")
    },
    Some("""WITH tok AS (SELECT source,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok
        FROM documents GROUP BY source),
      ranked AS (SELECT source, tok,
          CAST(row_number() OVER (ORDER BY tok, source) AS BIGINT) AS rn,
          CAST(SUM(tok) OVER (ORDER BY tok, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum
        FROM tok),
      tot AS (SELECT CAST(SUM(tok) AS BIGINT) AS total,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(tok) // 2 AS BIGINT) AS budget
        FROM tok),
      flagged AS (SELECT r.source, r.tok, r.rn, r.cum - r.tok AS cum_before,
          t.n, t.budget,
          (r.tok * (t.n - r.rn + 1) > t.budget - (r.cum - r.tok))
            AS capped_here
        FROM ranked r CROSS JOIN tot t),
      star AS (SELECT MIN(rn) AS rn_star FROM flagged WHERE capped_here),
      lvl AS (SELECT s.rn_star,
          CAST(f.budget - f.cum_before AS DOUBLE) /
            CAST(f.n - s.rn_star + 1 AS DOUBLE) AS t_level
        FROM flagged f JOIN star s ON f.rn = s.rn_star)
      SELECT f.source, f.tok AS tokens, (f.rn >= l.rn_star) AS capped,
        CASE WHEN f.rn >= l.rn_star THEN l.t_level
          ELSE CAST(f.tok AS DOUBLE) END AS kept,
        CASE WHEN f.rn >= l.rn_star THEN l.t_level
          ELSE CAST(f.tok AS DOUBLE) END / CAST(f.tok AS DOUBLE)
          AS kept_share
      FROM flagged f CROSS JOIN lvl l ORDER BY f.source"""),
    covers = Seq("LLM-waterfill-budget"))

  // ------------------------------------------------- decision stump
  // Best single split of part size predicting an urgent order — the
  // one-level decision tree, scored by weighted Gini impurity. Split
  // candidates collapse to |distinct sizes| cumulative-count rows
  // (never per-row work after the first aggregate); each split's
  // impurity is the two-term sum 2kL(nL−kL)/nL + 2kR(nR−kR)/nR over
  // exact counts, identical trees both engines. Top-5 by (impurity,
  // size).
  private val q448 = QueryDef(
    "q448_decision_stump",
    (s, dir) => {
      val rows = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        .join(t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
          (col("o_orderpriority") === "1-URGENT").as("y")), Seq("l_orderkey"))
        .join(t(s, dir, "part").select(col("p_partkey").as("l_partkey"),
          col("p_size")), Seq("l_partkey"))
      val bySize = rows.groupBy("p_size")
        .agg(count(lit(1)).as("n_s"),
          sum(when(col("y"), 1L).otherwise(0L)).as("k_s"))
      val w = Window.orderBy("p_size")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = bySize.agg(sum("n_s").as("n"), sum("k_s").as("k"))
      val splits = bySize
        .withColumn("nl", sum("n_s").over(w))
        .withColumn("kl", sum("k_s").over(w))
        .crossJoin(broadcast(tot))
        .withColumn("nr", col("n") - col("nl"))
        .withColumn("kr", col("k") - col("kl"))
        .filter(col("nr") > 0)
        .withColumn("wgini",
          ((lit(2L) * col("kl") * (col("nl") - col("kl"))).cast("double") /
            col("nl").cast("double") +
          (lit(2L) * col("kr") * (col("nr") - col("kr"))).cast("double") /
            col("nr").cast("double")) / col("n").cast("double"))
        .withColumn("gain",
          (lit(2L) * col("k") * (col("n") - col("k"))).cast("double") /
            (col("n") * col("n")).cast("double") - col("wgini"))
      val wr = Window.orderBy(col("wgini"), col("p_size"))
      splits.withColumn("rnk", row_number().over(wr).cast(LongType))
        .filter(col("rnk") <= 5)
        .select(col("rnk"), col("p_size").cast(LongType).as("split_size"),
          col("nl"), col("kl"), col("nr"), col("kr"),
          col("wgini"), col("gain"))
        .orderBy("rnk")
    },
    Some("""WITH rows_ AS (SELECT p.p_size,
          (o.o_orderpriority = '1-URGENT') AS y
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey),
      by_size AS (SELECT p_size, CAST(COUNT(*) AS BIGINT) AS n_s,
          CAST(COUNT(*) FILTER (WHERE y) AS BIGINT) AS k_s
        FROM rows_ GROUP BY p_size),
      tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n,
          CAST(SUM(k_s) AS BIGINT) AS k FROM by_size),
      splits AS (SELECT b.p_size,
          CAST(SUM(n_s) OVER (ORDER BY p_size
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS nl,
          CAST(SUM(k_s) OVER (ORDER BY p_size
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS kl,
          t.n, t.k
        FROM by_size b CROSS JOIN tot t),
      scored AS (SELECT p_size, nl, kl, n - nl AS nr, k - kl AS kr, n, k,
          (CAST(2 * kl * (nl - kl) AS DOUBLE) / CAST(nl AS DOUBLE) +
           CAST(2 * (k - kl) * ((n - nl) - (k - kl)) AS DOUBLE) /
             CAST(n - nl AS DOUBLE)) / CAST(n AS DOUBLE) AS wgini
        FROM splits WHERE n - nl > 0),
      ranked AS (SELECT p_size, nl, kl, nr, kr, wgini,
          CAST(2 * k * (n - k) AS DOUBLE) / CAST(n * n AS DOUBLE)
            - wgini AS gain,
          CAST(row_number() OVER (ORDER BY wgini, p_size) AS BIGINT)
            AS rnk
        FROM scored)
      SELECT rnk, CAST(p_size AS BIGINT) AS split_size,
        nl, kl, nr, kr, wgini, gain
      FROM ranked WHERE rnk <= 5 ORDER BY rnk"""),
    covers = Seq("ML-decision-stump"))

  // ------------------------------------------------- Goodman-Kruskal λ
  // Modal association between segment and order priority, both
  // directions: how much does knowing one reduce the error of
  // guessing the other's mode? λ = (Σ conditional modes − marginal
  // mode)/(n − marginal mode) — pure counts, two divisions, no
  // distributional assumptions (the log-free cousin of mutual
  // information). Contingency cells are |segments|×|priorities|.
  private val q449 = QueryDef(
    "q449_goodman_kruskal_lambda",
    (s, dir) => {
      val ct = t(s, dir, "orders")
        .join(t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("seg")), Seq("o_custkey"))
        .groupBy(col("seg"), col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("c"))
      val rowMax = ct.groupBy("seg").agg(max("c").as("m"))
        .agg(sum("m").as("sum_rowmax"))
      val colMax = ct.groupBy("pri").agg(max("c").as("m"))
        .agg(sum("m").as("sum_colmax"))
      val rowTotMax = ct.groupBy("seg").agg(sum("c").as("rt"))
        .agg(max("rt").as("max_rowtot"))
      val colTotMax = ct.groupBy("pri").agg(sum("c").as("pt"))
        .agg(max("pt").as("max_coltot"))
      val n = ct.agg(sum("c").as("n"))
      n.crossJoin(broadcast(rowMax)).crossJoin(broadcast(colMax))
        .crossJoin(broadcast(rowTotMax)).crossJoin(broadcast(colTotMax))
        .select(col("n"), col("sum_rowmax"), col("max_coltot"),
          ((col("sum_rowmax") - col("max_coltot")).cast("double") /
            (col("n") - col("max_coltot")).cast("double"))
            .as("lambda_pri_given_seg"),
          col("sum_colmax"), col("max_rowtot"),
          ((col("sum_colmax") - col("max_rowtot")).cast("double") /
            (col("n") - col("max_rowtot")).cast("double"))
            .as("lambda_seg_given_pri"))
    },
    Some("""WITH ct AS (SELECT c.c_mktsegment AS seg,
          o.o_orderpriority AS pri, CAST(COUNT(*) AS BIGINT) AS c
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      rm AS (SELECT CAST(SUM(m) AS BIGINT) AS sum_rowmax FROM
        (SELECT seg, MAX(c) AS m FROM ct GROUP BY seg)),
      cm AS (SELECT CAST(SUM(m) AS BIGINT) AS sum_colmax FROM
        (SELECT pri, MAX(c) AS m FROM ct GROUP BY pri)),
      rt AS (SELECT CAST(MAX(s) AS BIGINT) AS max_rowtot FROM
        (SELECT seg, SUM(c) AS s FROM ct GROUP BY seg)),
      pt AS (SELECT CAST(MAX(s) AS BIGINT) AS max_coltot FROM
        (SELECT pri, SUM(c) AS s FROM ct GROUP BY pri)),
      nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM ct)
      SELECT nn.n, rm.sum_rowmax, pt.max_coltot,
        CAST(rm.sum_rowmax - pt.max_coltot AS DOUBLE) /
          CAST(nn.n - pt.max_coltot AS DOUBLE) AS lambda_pri_given_seg,
        cm.sum_colmax, rt.max_rowtot,
        CAST(cm.sum_colmax - rt.max_rowtot AS DOUBLE) /
          CAST(nn.n - rt.max_rowtot AS DOUBLE) AS lambda_seg_given_pri
      FROM nn, rm, cm, rt, pt"""),
    covers = Seq("STAT-goodman-kruskal-lambda"))

  // ------------------------------------------------- tail dependence
  // Do busy days and high-revenue days coincide in the extreme tail?
  // Upper-tail dependence of the (daily orders, daily revenue) pair:
  // exceedance of both P90 thresholds (percentile_disc — exact
  // integer picks), conditional probability and lift as the only
  // divisions. The copula-corner diagnostic that a correlation
  // coefficient averages away.
  private val q450 = QueryDef(
    "q450_tail_dependence",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("cnt"),
          sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType)).as("rev"))
      val cuts = daily.agg(
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY cnt)")
          .cast(LongType).as("cnt_p90"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY rev)")
          .cast(LongType).as("rev_p90"))
      daily.crossJoin(broadcast(cuts))
        .agg(count(lit(1)).as("n_days"),
          sum(when(col("cnt") >= col("cnt_p90"), 1L).otherwise(0L))
            .as("n_cnt_hi"),
          sum(when(col("rev") >= col("rev_p90"), 1L).otherwise(0L))
            .as("n_rev_hi"),
          sum(when(col("cnt") >= col("cnt_p90") &&
            col("rev") >= col("rev_p90"), 1L).otherwise(0L)).as("n_both"))
        .select(col("n_days"), col("n_cnt_hi"), col("n_rev_hi"),
          col("n_both"),
          (col("n_both").cast("double") / col("n_cnt_hi").cast("double"))
            .as("cond_prob"),
          ((col("n_both") * col("n_days")).cast("double") /
            (col("n_cnt_hi") * col("n_rev_hi")).cast("double")).as("lift"))
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS cnt,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS rev
        FROM orders GROUP BY 1),
      cuts AS (SELECT
          CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY cnt)
            AS BIGINT) AS cnt_p90,
          CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY rev)
            AS BIGINT) AS rev_p90
        FROM daily)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        CAST(COUNT(*) FILTER (WHERE cnt >= cnt_p90) AS BIGINT)
          AS n_cnt_hi,
        CAST(COUNT(*) FILTER (WHERE rev >= rev_p90) AS BIGINT)
          AS n_rev_hi,
        CAST(COUNT(*) FILTER (WHERE cnt >= cnt_p90 AND rev >= rev_p90)
          AS BIGINT) AS n_both,
        CAST(COUNT(*) FILTER (WHERE cnt >= cnt_p90 AND rev >= rev_p90)
          AS DOUBLE) /
          CAST(COUNT(*) FILTER (WHERE cnt >= cnt_p90) AS DOUBLE)
          AS cond_prob,
        CAST(COUNT(*) FILTER (WHERE cnt >= cnt_p90 AND rev >= rev_p90)
            * COUNT(*) AS DOUBLE) /
          CAST(COUNT(*) FILTER (WHERE cnt >= cnt_p90)
            * COUNT(*) FILTER (WHERE rev >= rev_p90) AS DOUBLE) AS lift
      FROM daily CROSS JOIN cuts"""),
    covers = Seq("STAT-tail-dependence"))

  // ------------------------------------------------- growth accounting
  // Weekly active-user growth accounting: every week's actives split
  // into new (first week ever), retained (also active last week),
  // and resurrected (returning after a gap); churned counts last
  // week's actives who went silent. The quick ratio
  // (new+resurrected)/churned is the one division. All sets are
  // exact distinct (user, week) memberships — two self-joins at
  // user-week grain.
  private val q451 = QueryDef(
    "q451_growth_accounting",
    (s, dir) => {
      val uw = t(s, dir, "events")
        .select(col("user_id"),
          floor(datediff(to_date(col("ts")),
            lit("2024-01-01").cast(DateType)) / lit(7.0))
            .cast(LongType).as("wk"))
        .distinct()
      val first = uw.groupBy("user_id").agg(min("wk").as("first_wk"))
      val prev = uw.select(col("user_id"), (col("wk") + 1L).as("wk"),
        lit(true).as("was_active"))
      val cur = uw.join(broadcast(first), Seq("user_id"))
        .join(prev, Seq("user_id", "wk"), "left")
        .withColumn("was_active", coalesce(col("was_active"), lit(false)))
      val flows = cur.groupBy("wk")
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("wk") === col("first_wk"), 1L).otherwise(0L))
            .as("n_new"),
          sum(when(col("wk") > col("first_wk") && col("was_active"), 1L)
            .otherwise(0L)).as("n_retained"),
          sum(when(col("wk") > col("first_wk") && !col("was_active"), 1L)
            .otherwise(0L)).as("n_resurrected"))
      val churn = uw.select(col("user_id"), (col("wk") + 1L).as("wk"))
        .join(uw, Seq("user_id", "wk"), "left_anti")
        .groupBy("wk").agg(count(lit(1)).as("n_churned"))
      flows.join(churn, Seq("wk"), "left")
        .withColumn("n_churned", coalesce(col("n_churned"), lit(0L)))
        .withColumn("quick_ratio",
          (col("n_new") + col("n_resurrected")).cast("double") /
            when(col("n_churned") === 0L, lit(null))
              .otherwise(col("n_churned")).cast("double"))
        .select(col("wk"), col("n_active"), col("n_new"),
          col("n_retained"), col("n_resurrected"), col("n_churned"),
          col("quick_ratio"))
        .orderBy("wk")
    },
    Some("""WITH uw AS (SELECT DISTINCT user_id,
          CAST(floor(date_diff('day', DATE '2024-01-01',
            CAST(ts AS DATE)) / 7.0) AS BIGINT) AS wk
        FROM events),
      fw AS (SELECT user_id, MIN(wk) AS first_wk FROM uw GROUP BY 1),
      cur AS (SELECT u.user_id, u.wk, f.first_wk,
          (p.user_id IS NOT NULL) AS was_active
        FROM uw u JOIN fw f ON f.user_id = u.user_id
        LEFT JOIN uw p ON p.user_id = u.user_id AND p.wk = u.wk - 1),
      flows AS (SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_active,
          CAST(COUNT(*) FILTER (WHERE wk = first_wk) AS BIGINT) AS n_new,
          CAST(COUNT(*) FILTER (WHERE wk > first_wk AND was_active)
            AS BIGINT) AS n_retained,
          CAST(COUNT(*) FILTER (WHERE wk > first_wk AND NOT was_active)
            AS BIGINT) AS n_resurrected
        FROM cur GROUP BY wk),
      churn AS (SELECT u.wk + 1 AS wk, CAST(COUNT(*) AS BIGINT)
            AS n_churned
        FROM uw u LEFT JOIN uw nxt
          ON nxt.user_id = u.user_id AND nxt.wk = u.wk + 1
        WHERE nxt.user_id IS NULL
        GROUP BY u.wk + 1)
      SELECT f.wk, f.n_active, f.n_new, f.n_retained, f.n_resurrected,
        COALESCE(c.n_churned, 0) AS n_churned,
        CAST(f.n_new + f.n_resurrected AS DOUBLE) /
          CAST(NULLIF(COALESCE(c.n_churned, 0), 0) AS DOUBLE)
          AS quick_ratio
      FROM flows f LEFT JOIN churn c ON c.wk = f.wk
      ORDER BY f.wk"""),
    covers = Seq("STREAM-growth-accounting"))

  val all: Seq[QueryDef] = Seq(q447, q448, q449, q450, q451)
}
