package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}

import graft.Tables

/** Round-83 gate additions (q432–q436): survival analysis, Palma
  * inequality, BM25 relevance, Hurst rescaled-range, and corpus
  * dispersion. Same determinism discipline as every round: exact
  * integer/DECIMAL arithmetic up to a final division or IEEE sqrt on
  * identical operand trees — no `ln`/`pow` whose last-ulp behavior
  * differs between engines.
  */
object Round83Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def cents: Column =
    (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)

  // ------------------------------------------------- Kaplan-Meier
  // Customer-lifetime risk table per segment: lifetime = first→last
  // order in 30-day units; "death" = last order before a fixed
  // cutoff, later actives are right-censored. At each event time:
  // n_risk (reverse-cumulative count, exact ints), deaths, censored,
  // and the hazard d/n as one deterministic IEEE division. The
  // survival curve itself needs a running product (ln/exp) — the
  // risk table is the engine-friendly, exactly-gateable half.
  private val q432 = QueryDef(
    "q432_kaplan_meier",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val life = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(min(to_date(col("o_orderdate"))).as("first_d"),
          max(to_date(col("o_orderdate"))).as("last_d"))
        .join(seg, Seq("o_custkey"))
        .select(col("segment"),
          floor(datediff(col("last_d"), col("first_d")) / lit(30.0))
            .cast(LongType).as("t"),
          (col("last_d") < lit("2001-02-01").cast(DateType)).as("event"))
      val grp = life.groupBy("segment", "t")
        .agg(sum(when(col("event"), 1L).otherwise(0L)).as("d"),
          sum(when(!col("event"), 1L).otherwise(0L)).as("c"))
      val wRisk = Window.partitionBy("segment").orderBy(col("t").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grp.withColumn("n_risk", sum(col("d") + col("c")).over(wRisk))
        .filter(col("d") > 0)
        .select(col("segment"), col("t"), col("n_risk"), col("d"), col("c"),
          (col("d").cast("double") / col("n_risk").cast("double"))
            .as("hazard"))
        .orderBy("segment", "t")
    },
    Some("""WITH life AS (SELECT c.c_mktsegment AS segment,
          CAST(floor(date_diff('day',
              MIN(CAST(o.o_orderdate AS DATE)),
              MAX(CAST(o.o_orderdate AS DATE))) / 30.0) AS BIGINT) AS t,
          (MAX(CAST(o.o_orderdate AS DATE)) < DATE '2001-02-01') AS event
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY o.o_custkey, c.c_mktsegment),
      grp AS (SELECT segment, t,
          CAST(COUNT(*) FILTER (WHERE event) AS BIGINT) AS d,
          CAST(COUNT(*) FILTER (WHERE NOT event) AS BIGINT) AS c
        FROM life GROUP BY 1, 2),
      km AS (SELECT segment, t, d, c,
          CAST(SUM(d + c) OVER (PARTITION BY segment ORDER BY t DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_risk
        FROM grp)
      SELECT segment, t, n_risk, d, c,
        CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard
      FROM km WHERE d > 0 ORDER BY segment, t"""),
    covers = Seq("STAT-kaplan-meier"))

  // ------------------------------------------------- Palma ratio
  // Spend inequality per segment as the Palma ratio: top-10% customer
  // spend over bottom-40% spend. Decile membership by exact
  // row_number against floor(n/10) / floor(4n/10) cutoffs (ties
  // broken by custkey), sums in exact cents, one final division —
  // the quantile-share inequality family next to the Gini/Lorenz
  // queries, robust to the middle of the distribution.
  private val q433 = QueryDef(
    "q433_palma_ratio",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val cs = t(s, dir, "orders")
        .groupBy("o_custkey").agg(sum(cents).as("spend"))
        .join(seg, Seq("o_custkey"))
      val w = Window.partitionBy("segment")
        .orderBy(col("spend").desc, col("o_custkey"))
      val sizes = cs.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum("spend").as("total_cents"))
      cs.withColumn("rn", row_number().over(w).cast(LongType))
        .join(broadcast(sizes), Seq("segment"))
        .withColumn("topn", floor(col("n") / lit(10.0)).cast(LongType))
        .withColumn("botn",
          floor(col("n") * lit(4L) / lit(10.0)).cast(LongType))
        .groupBy("segment", "n", "total_cents")
        .agg(sum(when(col("rn") <= col("topn"), col("spend"))).as("top_cents"),
          sum(when(col("rn") > col("n") - col("botn"), col("spend")))
            .as("bottom_cents"))
        .select(col("segment"), col("n").as("n_cust"), col("total_cents"),
          col("top_cents"), col("bottom_cents"),
          (col("top_cents").cast("double") /
            col("bottom_cents").cast("double")).as("palma"))
        .orderBy("segment")
    },
    Some("""WITH cs AS (SELECT o.o_custkey, c.c_mktsegment AS segment,
          CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS spend
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2),
      ranked AS (SELECT segment, spend,
          CAST(row_number() OVER (PARTITION BY segment
            ORDER BY spend DESC, o_custkey) AS BIGINT) AS rn
        FROM cs),
      sizes AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(spend) AS BIGINT) AS total_cents
        FROM cs GROUP BY segment),
      cut AS (SELECT r.segment, r.spend, r.rn, s.n, s.total_cents,
          CAST(floor(s.n / 10.0) AS BIGINT) AS topn,
          CAST(floor(s.n * 4 / 10.0) AS BIGINT) AS botn
        FROM ranked r JOIN sizes s ON s.segment = r.segment)
      SELECT segment, n AS n_cust, total_cents,
        CAST(SUM(spend) FILTER (WHERE rn <= topn) AS BIGINT) AS top_cents,
        CAST(SUM(spend) FILTER (WHERE rn > n - botn) AS BIGINT)
          AS bottom_cents,
        CAST(SUM(spend) FILTER (WHERE rn <= topn) AS DOUBLE) /
          CAST(SUM(spend) FILTER (WHERE rn > n - botn) AS DOUBLE) AS palma
      FROM cut GROUP BY segment, n, total_cents ORDER BY segment"""),
    covers = Seq("STAT-palma-ratio"))

  // ------------------------------------------------- BM25
  // Okapi BM25 top-3 terms per document (first 50 docs) with the
  // rational idf variant (N−df+0.5)/(df+0.5) — no ln, so the score
  // is a pure division/multiplication tree over exact corpus counts
  // and both engines produce bit-identical doubles. k1=1.2, b=0.75
  // folded to literal constants on both sides; df/avgdl computed
  // over the FULL corpus, scoring restricted to bound the output.
  private val q434 = QueryDef(
    "q434_bm25_topterms",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val corpus = dl.agg(sum("dl").as("total_tok"),
        count(lit(1)).as("n_docs"))
      val scored = tf.filter(col("doc_id") < 50)
        .join(dl, Seq("doc_id"))
        .join(dft, Seq("term"))
        .crossJoin(broadcast(corpus))
        .withColumn("score",
          (((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          ((col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
              lit(0.75) * (col("dl").cast("double") /
                (col("total_tok").cast("double") /
                  col("n_docs").cast("double")))))))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("score"))
        .orderBy("doc_id", "rk")
    },
    Some("""WITH tok AS (SELECT doc_id,
          unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        FROM tok GROUP BY 1),
      df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY 1),
      corpus AS (SELECT CAST(SUM(dl) AS BIGINT) AS total_tok,
          CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl),
      scored AS (SELECT t.doc_id, t.term,
          ((CAST(c.n_docs - f.df AS DOUBLE) + 0.5) /
            (CAST(f.df AS DOUBLE) + 0.5)) *
          ((CAST(t.tf AS DOUBLE) * 2.2) /
            (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 +
              0.75 * (CAST(d.dl AS DOUBLE) /
                (CAST(c.total_tok AS DOUBLE) /
                  CAST(c.n_docs AS DOUBLE)))))) AS score
        FROM tf t JOIN dl d USING (doc_id) JOIN df f USING (term)
        CROSS JOIN corpus c
        WHERE t.doc_id < 50),
      rk AS (SELECT doc_id, term, score,
          CAST(row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, term) AS BIGINT) AS rk
        FROM scored)
      SELECT doc_id, rk, term, score FROM rk
      WHERE rk <= 3 ORDER BY doc_id, rk"""),
    covers = Seq("TEXT-bm25"))

  // ------------------------------------------------- Hurst R/S
  // Rescaled-range statistic of the daily order-arrival series per
  // complete 28-day bucket (zero-filled calendar spine). The usual
  // formulation needs running sums of (x−μ) in floats; here the
  // cumulative deviation is kept as the exact integer
  // 28·prefix_k − k·S1, so R, S, and R/S each reduce to one
  // division / one IEEE sqrt over exact operands. No log-log slope
  // (pow-free) — the per-bucket R/S series IS the long-memory audit.
  private val q435 = QueryDef(
    "q435_hurst_rs",
    (s, dir) => {
      val di = t(s, dir, "orders")
        .select(datediff(to_date(col("o_orderdate")),
          lit("1995-01-01").cast(DateType)).cast(LongType).as("di"))
      val daily = di.groupBy("di").agg(count(lit(1)).as("cnt"))
      val spine = di.agg(max("di").as("max_di"))
        .select(explode(sequence(lit(0L), col("max_di"))).as("di"))
      val series = spine.join(daily, Seq("di"), "left")
        .withColumn("x", coalesce(col("cnt"), lit(0L)))
        .withColumn("bucket", floor(col("di") / lit(28.0)).cast(LongType))
        .withColumn("k", col("di") % 28 + 1)
      val wCum = Window.partitionBy("bucket").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("bucket")
      series
        .withColumn("prefix", sum(col("x")).over(wCum))
        .withColumn("s1", sum(col("x")).over(wAll))
        .withColumn("devnum",
          lit(28L) * col("prefix") - col("k") * col("s1"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("nd"), max("s1").as("s1"),
          sum(col("x") * col("x")).as("s2"),
          max("devnum").as("dmax"), min("devnum").as("dmin"))
        .filter(col("nd") === 28)
        .select(col("bucket"), col("s1").as("n_orders"),
          ((col("dmax") - col("dmin")).cast("double") / lit(28.0))
            .as("r_stat"),
          (sqrt((lit(28L) * col("s2") - col("s1") * col("s1"))
            .cast("double")) / lit(28.0)).as("s_stat"))
        .withColumn("rs", when(col("s_stat") === 0.0, lit(null))
          .otherwise(col("r_stat") / col("s_stat")))
        .orderBy("bucket")
    },
    Some("""WITH di AS (SELECT CAST(date_diff('day', DATE '1995-01-01',
            CAST(o_orderdate AS DATE)) AS BIGINT) AS di FROM orders),
      daily AS (SELECT di, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM di GROUP BY di),
      spine AS (SELECT unnest(range(0, (SELECT MAX(di) + 1 FROM di)))
          AS di),
      series AS (SELECT s.di, COALESCE(d.cnt, 0) AS x,
          CAST(floor(s.di / 28.0) AS BIGINT) AS bucket,
          s.di % 28 + 1 AS k
        FROM spine s LEFT JOIN daily d ON d.di = s.di),
      cum AS (SELECT bucket, k, x,
          CAST(SUM(x) OVER (PARTITION BY bucket ORDER BY k
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS prefix,
          CAST(SUM(x) OVER (PARTITION BY bucket) AS BIGINT) AS s1
        FROM series),
      dev AS (SELECT bucket, k, x, s1,
          28 * prefix - k * s1 AS devnum FROM cum),
      agg AS (SELECT bucket, COUNT(*) AS nd, MAX(s1) AS s1,
          CAST(SUM(x * x) AS BIGINT) AS s2,
          MAX(devnum) AS dmax, MIN(devnum) AS dmin
        FROM dev GROUP BY bucket)
      SELECT bucket, CAST(s1 AS BIGINT) AS n_orders,
        CAST(dmax - dmin AS DOUBLE) / 28.0 AS r_stat,
        sqrt(CAST(28 * s2 - s1 * s1 AS DOUBLE)) / 28.0 AS s_stat,
        CASE WHEN sqrt(CAST(28 * s2 - s1 * s1 AS DOUBLE)) / 28.0 = 0.0
          THEN NULL
          ELSE (CAST(dmax - dmin AS DOUBLE) / 28.0) /
            (sqrt(CAST(28 * s2 - s1 * s1 AS DOUBLE)) / 28.0) END AS rs
      FROM agg WHERE nd = 28 ORDER BY bucket"""),
    covers = Seq("STAT-hurst-rs"))

  // ------------------------------------------------- DP dispersion
  // Gries' "deviation of proportions" for the top-20 terms across
  // sources: DP = Σ|observed share − expected share| / 2, where the
  // expected share of source i is its share of all tokens. Each
  // |o_i − s_i| is kept as the exact integer |c_i·T − t_i·C| over
  // the common denominator C·T, so the sum is order-free and the
  // single final division is deterministic. DP≈0 ⇒ the term is
  // spread like the corpus; DP→1 ⇒ concentrated in one source.
  private val q436 = QueryDef(
    "q436_dp_dispersion",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
      val bySrc = tok.groupBy("source", "term").agg(count(lit(1)).as("c"))
      val srcTot = tok.groupBy("source").agg(count(lit(1)).as("t_i"))
      val glob = bySrc.groupBy("term").agg(sum("c").as("ctot"))
      val totals = srcTot.agg(sum("t_i").as("tt"))
      val top = glob.orderBy(col("ctot").desc, col("term")).limit(20)
      top.crossJoin(broadcast(srcTot))
        .join(bySrc, Seq("term", "source"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .crossJoin(broadcast(totals))
        .withColumn("num",
          abs(col("c") * col("tt") - col("t_i") * col("ctot")))
        .groupBy("term", "ctot", "tt")
        .agg(sum("num").as("sn"))
        .select(col("term"), col("ctot").as("n_total"),
          (col("sn").cast("double") /
            (lit(2L) * col("ctot") * col("tt")).cast("double")).as("dp"))
        .orderBy(col("dp").desc, col("term"))
    },
    Some("""WITH tok AS (SELECT source,
          unnest(string_split(text, ' ')) AS term FROM documents),
      by_src AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2),
      src_tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS t_i
        FROM tok GROUP BY 1),
      gt AS (SELECT term, CAST(SUM(c) AS BIGINT) AS ctot
        FROM by_src GROUP BY 1),
      totals AS (SELECT CAST(SUM(t_i) AS BIGINT) AS tt FROM src_tot),
      top AS (SELECT term, ctot FROM gt
        ORDER BY ctot DESC, term LIMIT 20),
      grid AS (SELECT tp.term, tp.ctot, st.source, st.t_i,
          COALESCE(bs.c, 0) AS c, tl.tt
        FROM top tp CROSS JOIN src_tot st
        LEFT JOIN by_src bs ON bs.term = tp.term AND bs.source = st.source
        CROSS JOIN totals tl),
      agg AS (SELECT term, ctot, tt,
          CAST(SUM(ABS(c * tt - t_i * ctot)) AS BIGINT) AS sn
        FROM grid GROUP BY 1, 2, 3)
      SELECT term, ctot AS n_total,
        CAST(sn AS DOUBLE) / CAST(2 * ctot * tt AS DOUBLE) AS dp
      FROM agg ORDER BY dp DESC, term"""),
    covers = Seq("TEXT-dp-dispersion"))

  val all: Seq[QueryDef] = Seq(q432, q433, q434, q435, q436)
}
