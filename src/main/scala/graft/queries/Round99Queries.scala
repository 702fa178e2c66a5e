package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}

import graft.Tables

/** Round-99 gate additions (q512–q516): evaluation-science closers —
  * kNN-graph homophily, recommender novelty, regression-to-the-mean,
  * split-half reliability (Spearman-Brown), and the Pareto knee by
  * exact chord-distance argmax.
  */
object Round99Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)


  // ------------------------------------------------- kNN homophily
  // Label homophily of the embedding kNN graph: among each query's 5
  // nearest neighbors (exact-lattice cosine, first 100 queries), the
  // same-label edge share — overall and per label. The
  // graph-structure twin of q487's MRR: high MRR with low homophily
  // means the first hit is lucky, not structural.
  private val q512 = QueryDef(
    "q512_knn_homophily",
    (s, dir) => {
      // identical quantization (Q), query set, and ranking to
      // q487/q488 — consume the session-cached shared frame
      val knn = Round94Queries.ranked(s, dir).filter(col("rnk") <= 5)
      knn.groupBy("lq")
        .agg(count(lit(1)).as("n_edges"),
          sum(when(col("lq") === col("lb"), 1L).otherwise(0L))
            .as("n_same"))
        .select(col("lq").as("label"), col("n_edges"), col("n_same"),
          (col("n_same").cast("double") / col("n_edges").cast("double"))
            .as("homophily"))
        .orderBy("label")
    },
    Some("""WITH vd AS MATERIALIZED (SELECT vec_id,
          CAST(label AS BIGINT) AS label, dd.i - 1 AS d,
          CAST(floor(CAST(embedding[dd.i] AS DOUBLE) * 1048576.0)
            AS BIGINT) AS q
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) dd),
      norms AS MATERIALIZED (SELECT vec_id,
          CAST(SUM(q * q) AS BIGINT) AS n2 FROM vd GROUP BY 1),
      dots AS MATERIALIZED (SELECT a.vec_id AS qa, a.label AS lq,
          b.vec_id AS vb, b.label AS lb,
          CAST(SUM(a.q * b.q) AS BIGINT) AS dot
        FROM vd a JOIN vd b ON b.d = a.d AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 100 GROUP BY 1, 2, 3, 4),
      knn AS (SELECT qa, lq, lb FROM (SELECT d.qa, d.lq, d.lb,
          row_number() OVER (PARTITION BY d.qa ORDER BY
            CAST(d.dot AS DOUBLE) /
              (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
            DESC, d.vb) AS rnk
        FROM dots d JOIN norms na ON na.vec_id = d.qa
        JOIN norms nb ON nb.vec_id = d.vb) WHERE rnk <= 5)
      SELECT lq AS label, CAST(COUNT(*) AS BIGINT) AS n_edges,
        CAST(COUNT(*) FILTER (WHERE lq = lb) AS BIGINT) AS n_same,
        CAST(COUNT(*) FILTER (WHERE lq = lb) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS homophily
      FROM knn GROUP BY lq ORDER BY label"""),
    covers = Seq("SIM-knn-homophily"))

  // ------------------------------------------------- rec novelty
  // Novelty profile of the q463 recommender: where do its
  // recommendations sit on the popularity curve? Popularity ranks
  // from train-period demand (ties → part key), mean rank percentile
  // of recommended slots, and the share of recs from the catalog's
  // long tail (bottom 80%) — the metric that separates "useful" from
  // "recommends bestsellers at everyone".
  private val q513 = QueryDef(
    "q513_rec_novelty",
    (s, dir) => {
      val pop = t(s, dir, "lineitem")
        .join(t(s, dir, "orders").select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("od")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("od") < lit("1999-01-01").cast(DateType))
        .groupBy(col("l_partkey").as("rec"))
        .agg(count(lit(1)).as("hits"))
      val w = Window.orderBy(col("hits").desc, col("rec"))
      val ranked = pop.withColumn("prank", row_number().over(w)
        .cast(LongType))
      val nParts = ranked.agg(max("prank").as("np"))
      Round89Queries.recs(s, dir)
        .join(ranked, Seq("rec"))
        .crossJoin(broadcast(nParts))
        .agg(count(lit(1)).as("n_recs"), sum("prank").as("sum_rank"),
          max("np").as("np"),
          sum(when(lit(5L) * col("prank") > col("np"), 1L).otherwise(0L))
            .as("n_tail"))
        .select(col("n_recs"),
          (col("sum_rank").cast("double") /
            (col("n_recs") * col("np")).cast("double"))
            .as("mean_rank_pct"),
          (col("n_tail").cast("double") / col("n_recs").cast("double"))
            .as("tail_share"))
    },
    Some(s"""WITH ${Round89Queries.recsSql},
      pop AS (SELECT l.l_partkey AS rec, CAST(COUNT(*) AS BIGINT)
          AS hits
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE CAST(o.o_orderdate AS DATE) < DATE '1999-01-01'
        GROUP BY 1),
      ranked AS (SELECT rec, CAST(row_number() OVER (
          ORDER BY hits DESC, rec) AS BIGINT) AS prank FROM pop),
      np AS (SELECT CAST(MAX(prank) AS BIGINT) AS np FROM ranked)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_recs,
        CAST(SUM(r.prank) AS DOUBLE) /
          CAST(COUNT(*) * MAX(np.np) AS DOUBLE) AS mean_rank_pct,
        CAST(COUNT(*) FILTER (WHERE 5 * r.prank > np.np) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS tail_share
      FROM recs rc JOIN ranked r ON r.rec = rc.rec
      CROSS JOIN np"""),
    covers = Seq("ML-rec-novelty"))

  // ------------------------------------------------- mean reversion
  // Regression to the mean in part demand: 1997's top-decile parts
  // (exact rank cutoffs) tracked into 1998 — their mean new
  // percentile and top-decile survival share, with the bottom
  // decile's upward drift as the mirror. The winner's-curse audit
  // behind every "double down on last year's bestsellers" plan.
  private val q514 = QueryDef(
    "q514_mean_reversion",
    (s, dir) => {
      def yearRank(yr: Int): DataFrame = {
        val d = t(s, dir, "lineitem")
          .filter(year(to_date(col("l_shipdate"))) === yr)
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2))
            .cast(LongType)).as("d"))
        val w = Window.orderBy(col("d").desc, col("l_partkey"))
        d.withColumn("rnk", row_number().over(w).cast(LongType))
      }
      val r97 = yearRank(1997).localCheckpoint()
      val r98 = yearRank(1998).localCheckpoint()
      val n97 = r97.agg(max("rnk").as("n1"))
      val n98 = r98.agg(max("rnk").as("n2"))
      val joined = r97.select(col("l_partkey"), col("rnk").as("rnk1"))
        .join(r98.select(col("l_partkey"), col("rnk").as("rnk2")),
          Seq("l_partkey"))
        .crossJoin(broadcast(n97)).crossJoin(broadcast(n98))
      val bands = joined
        .withColumn("band",
          when(lit(10L) * col("rnk1") <= col("n1"), "1_top_decile")
            .when(lit(10L) * col("rnk1") > lit(9L) * col("n1"),
              "3_bottom_decile")
            .otherwise("2_middle"))
      bands.groupBy("band")
        .agg(count(lit(1)).as("n_parts"), sum("rnk2").as("sr2"),
          max("n2").as("n2"),
          sum(when(lit(10L) * col("rnk2") <= col("n2"), 1L)
            .otherwise(0L)).as("still_top"))
        .select(col("band"), col("n_parts"),
          (col("sr2").cast("double") /
            (col("n_parts") * col("n2")).cast("double"))
            .as("mean_next_pct"),
          (col("still_top").cast("double") / col("n_parts").cast("double"))
            .as("top_decile_rate"))
        .orderBy("band")
    },
    Some("""WITH d97 AS (SELECT l_partkey,
          CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
            AS BIGINT) AS d
        FROM lineitem WHERE year(CAST(l_shipdate AS DATE)) = 1997
        GROUP BY 1),
      r97 AS (SELECT l_partkey, CAST(row_number() OVER (
          ORDER BY d DESC, l_partkey) AS BIGINT) AS rnk1 FROM d97),
      d98 AS (SELECT l_partkey,
          CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT))
            AS BIGINT) AS d
        FROM lineitem WHERE year(CAST(l_shipdate AS DATE)) = 1998
        GROUP BY 1),
      r98 AS (SELECT l_partkey, CAST(row_number() OVER (
          ORDER BY d DESC, l_partkey) AS BIGINT) AS rnk2 FROM d98),
      n1 AS (SELECT CAST(MAX(rnk1) AS BIGINT) AS n1 FROM r97),
      n2 AS (SELECT CAST(MAX(rnk2) AS BIGINT) AS n2 FROM r98),
      j AS (SELECT a.l_partkey, a.rnk1, b.rnk2, n1.n1, n2.n2
        FROM r97 a JOIN r98 b ON b.l_partkey = a.l_partkey
        CROSS JOIN n1 CROSS JOIN n2),
      bands AS (SELECT *,
          CASE WHEN 10 * rnk1 <= n1 THEN '1_top_decile'
            WHEN 10 * rnk1 > 9 * n1 THEN '3_bottom_decile'
            ELSE '2_middle' END AS band
        FROM j)
      SELECT band, CAST(COUNT(*) AS BIGINT) AS n_parts,
        CAST(SUM(rnk2) AS DOUBLE) /
          CAST(COUNT(*) * MAX(n2) AS DOUBLE) AS mean_next_pct,
        CAST(COUNT(*) FILTER (WHERE 10 * rnk2 <= n2) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE) AS top_decile_rate
      FROM bands GROUP BY band ORDER BY band"""),
    covers = Seq("STAT-mean-reversion"))

  // ------------------------------------------------- reliability
  // Split-half reliability of part demand: odd-week vs even-week
  // quantities per part, Pearson r from exact HUGEINT bilinears,
  // stepped up by Spearman-Brown 2r/(1+r) — is one year of demand
  // data enough signal to rank SKUs, or mostly noise?
  private val q515 = QueryDef(
    "q515_split_half_reliability",
    (s, dir) => {
      def d38(c: Column): Column = c.cast(DecimalType(38, 0))
      val halves = t(s, dir, "lineitem")
        .select(col("l_partkey"),
          (floor(datediff(to_date(col("l_shipdate")),
            lit("1995-01-01").cast(DateType)) / lit(7.0))
            .cast(LongType) % 2 === 0).as("even_wk"),
          col("l_quantity").cast(DecimalType(18, 2)).cast(LongType)
            .as("qty"))
        .groupBy("l_partkey")
        .agg(sum(when(col("even_wk"), col("qty")).otherwise(0L)).as("x"),
          sum(when(!col("even_wk"), col("qty")).otherwise(0L)).as("y"))
      val m = halves.agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(d38(col("x")) * d38(col("x"))).as("sxx"),
        sum(d38(col("y")) * d38(col("y"))).as("syy"),
        sum(d38(col("x")) * d38(col("y"))).as("sxy"))
      m.select(col("n"),
          ((d38(col("n")) * col("sxy") - d38(col("sx")) * d38(col("sy")))
            .cast("double") /
            (sqrt((d38(col("n")) * col("sxx") -
              d38(col("sx")) * d38(col("sx"))).cast("double")) *
             sqrt((d38(col("n")) * col("syy") -
              d38(col("sy")) * d38(col("sy"))).cast("double"))))
            .as("r_half"))
        .withColumn("spearman_brown",
          lit(2.0) * col("r_half") / (lit(1.0) + col("r_half")))
    },
    Some("""WITH halves AS (SELECT l_partkey,
          CAST(SUM(CASE WHEN CAST(floor(date_diff('day',
              DATE '1995-01-01', CAST(l_shipdate AS DATE)) / 7.0)
              AS BIGINT) % 2 = 0
            THEN CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS x,
          CAST(SUM(CASE WHEN CAST(floor(date_diff('day',
              DATE '1995-01-01', CAST(l_shipdate AS DATE)) / 7.0)
              AS BIGINT) % 2 <> 0
            THEN CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT)
            ELSE 0 END) AS BIGINT) AS y
        FROM lineitem GROUP BY 1),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          SUM(CAST(x AS HUGEINT) * x) AS sxx,
          SUM(CAST(y AS HUGEINT) * y) AS syy,
          SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM halves),
      r AS (SELECT n,
          CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
            AS DOUBLE) /
          (sqrt(CAST(CAST(n AS HUGEINT) * sxx -
            CAST(sx AS HUGEINT) * sx AS DOUBLE)) *
           sqrt(CAST(CAST(n AS HUGEINT) * syy -
            CAST(sy AS HUGEINT) * sy AS DOUBLE))) AS r_half
        FROM m)
      SELECT n, r_half, 2.0 * r_half / (1.0 + r_half)
        AS spearman_brown
      FROM r"""),
    covers = Seq("STAT-split-half"))

  // ------------------------------------------------- Pareto knee
  // The knee of the revenue concentration curve: rank parts by
  // revenue, find the rank maximizing distance to the (0,0)–(N,R)
  // chord — the argmax of the exact integer |i·R − C_i·N|, ties →
  // rank. Where "the head" objectively ends, without eyeballing a
  // plot.
  private val q516 = QueryDef(
    "q516_pareto_knee",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(4, 2)) -
            col("l_discount").cast(DecimalType(4, 2)))) * 10000)
          .cast(LongType)).as("r"))
      val w = Window.orderBy(col("r").desc, col("l_partkey"))
      val ranked = rev
        .withColumn("i", row_number().over(w).cast(LongType))
        .withColumn("c", sum("r").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = ranked.agg(max("i").as("np"), max("c").as("rt"))
      val knee = ranked.crossJoin(broadcast(tot))
        .withColumn("dist_num",
          abs(col("i") * col("rt") - col("c") * col("np")))
      val wk = Window.orderBy(col("dist_num").desc, col("i"))
      knee.withColumn("rk", row_number().over(wk))
        .filter(col("rk") === 1)
        .select(col("i").as("knee_rank"), col("np").as("n_parts"),
          (col("i").cast("double") / col("np").cast("double"))
            .as("rank_share"),
          (col("c").cast("double") / col("rt").cast("double"))
            .as("revenue_share_at_knee"))
    },
    Some("""WITH rev AS (SELECT l_partkey,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
            * 10000 AS BIGINT)) AS BIGINT) AS r
        FROM lineitem GROUP BY 1),
      ranked AS (SELECT l_partkey, r,
          CAST(row_number() OVER (ORDER BY r DESC, l_partkey)
            AS BIGINT) AS i,
          CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS c
        FROM rev),
      tot AS (SELECT CAST(MAX(i) AS BIGINT) AS np,
          CAST(MAX(c) AS BIGINT) AS rt FROM ranked),
      knee AS (SELECT i, c, np, rt,
          ABS(i * rt - c * np) AS dist_num,
          row_number() OVER (ORDER BY ABS(i * rt - c * np) DESC, i)
            AS rk
        FROM ranked CROSS JOIN tot)
      SELECT i AS knee_rank, np AS n_parts,
        CAST(i AS DOUBLE) / CAST(np AS DOUBLE) AS rank_share,
        CAST(c AS DOUBLE) / CAST(rt AS DOUBLE)
          AS revenue_share_at_knee
      FROM knee WHERE rk = 1"""),
    covers = Seq("STAT-pareto-knee"))

  val all: Seq[QueryDef] = Seq(q512, q513, q514, q515, q516)
}
