package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-32 gate additions (q259+): exact apportionment, rank
  * statistics, customer segmentation, and nearest-neighbor label
  * assignment.
  */
object Round32Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ------------------------------------------------- proration
  // Largest-remainder apportionment: split a fixed integer budget
  // (1,000,000 micro-units per order) across the order's lineitems
  // proportional to extended price, so the per-order allocations SUM
  // EXACTLY to the budget — the allocation primitive behind cost
  // attribution and pro-rated discounts, where naive rounding leaks
  // units. Pure integer arithmetic end to end: truncating `div` for
  // the floor shares (operands non-negative, so div ≡ floor — the
  // q248-pinned semantics), the exact integer remainder ranks which
  // rows get the +1 top-up (ties broken by linenumber), and the
  // window re-sum proves the invariant in-band (order_total is
  // constant 1,000,000). Per-order windows partition by l_orderkey —
  // at 100 TB this is one hash shuffle of the (filtered) fact, no
  // driver involvement, no doubles anywhere.
  private val q259 = QueryDef(
    "q259_proration",
    (s, dir) => {
      val budget = lit(1000000L)
      val li = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 97 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          (dec(col("l_extendedprice")) * 100).cast("long").as("cents"))
      val wOrd = Window.partitionBy("l_orderkey")
      val based = li
        .withColumn("tot", sum(col("cents")).over(wOrd))
        .withColumn("base", expr("(1000000 * cents) div tot"))
        .withColumn("rem", budget * col("cents") - col("base") * col("tot"))
      val wRem = Window.partitionBy("l_orderkey")
        .orderBy(desc("rem"), asc("l_linenumber"))
      based
        .withColumn("deficit", budget - sum(col("base")).over(wOrd))
        .withColumn("rn", row_number().over(wRem))
        .withColumn("alloc",
          col("base") + when(col("rn") <= col("deficit"), 1L).otherwise(0L))
        .withColumn("order_total", sum(col("alloc")).over(wOrd))
        .select(col("l_orderkey"), col("l_linenumber"), col("cents"),
          col("alloc"), col("order_total"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""WITH li AS (SELECT l_orderkey, l_linenumber,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM lineitem WHERE l_orderkey % 97 = 0),
      w1 AS (SELECT *, CAST(SUM(cents) OVER (PARTITION BY l_orderkey) AS BIGINT) AS tot
             FROM li),
      w2 AS (SELECT *, (1000000 * cents) // tot AS base,
                    1000000 * cents - ((1000000 * cents) // tot) * tot AS rem
             FROM w1),
      w3 AS (SELECT *,
          1000000 - CAST(SUM(base) OVER (PARTITION BY l_orderkey) AS BIGINT) AS deficit,
          ROW_NUMBER() OVER (PARTITION BY l_orderkey
                             ORDER BY rem DESC, l_linenumber) AS rn
        FROM w2),
      w4 AS (SELECT l_orderkey, l_linenumber, cents,
          base + CASE WHEN rn <= deficit THEN 1 ELSE 0 END AS alloc
        FROM w3)
      SELECT l_orderkey, l_linenumber, cents, alloc,
        CAST(SUM(alloc) OVER (PARTITION BY l_orderkey) AS BIGINT) AS order_total
      FROM w4 ORDER BY l_orderkey, l_linenumber"""),
    covers = Seq("A-apportionment"))

  // ------------------------------------------------- Spearman rank corr
  // Spearman rank correlation between daily order volume and daily
  // revenue, per year — the outlier-robust companion to Pearson
  // (q51/q241): correlate the RANKS, not the values. Ties get the
  // standard average rank, kept EXACT as twice-the-average-rank
  // (2·avg = 2·rank + tie_count − 1, an integer; Pearson is scale
  // invariant so the ×2 cancels). From there the q241 discipline:
  // all five moments are exact LONG sums of small integers (ranks ≤
  // 2·366), and the correlation emerges from ONE shared IEEE tree
  // over exactly-representable integers. The windows rank WITHIN a
  // year over the pre-aggregated daily grain (≤366 rows per
  // partition at any data scale).
  private val q260 = QueryDef(
    "q260_spearman",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("x"), sum(dec(col("o_totalprice"))).as("y"))
        .withColumn("yr", year(col("d")).cast("long"))
      val rx = rank().over(Window.partitionBy("yr").orderBy("x")).cast("long")
      val cx = count(lit(1)).over(Window.partitionBy("yr", "x"))
      val ry = rank().over(Window.partitionBy("yr").orderBy("y")).cast("long")
      val cy = count(lit(1)).over(Window.partitionBy("yr", "y"))
      val ranked = daily
        .withColumn("rx2", lit(2L) * rx + cx - 1L)
        .withColumn("ry2", lit(2L) * ry + cy - 1L)
      val g = ranked.groupBy("yr").agg(
        count(lit(1)).as("n"),
        sum(col("rx2")).as("sx"), sum(col("ry2")).as("sy"),
        sum(col("rx2") * col("rx2")).as("sxx"),
        sum(col("ry2") * col("ry2")).as("syy"),
        sum(col("rx2") * col("ry2")).as("sxy"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val den1 = col("n") * col("sxx") - col("sx") * col("sx")
      val den2 = col("n") * col("syy") - col("sy") * col("sy")
      g.filter(den1 > 0 && den2 > 0)
        .select(col("yr"), col("n").as("n_days"),
          (num.cast("double") /
            (sqrt(den1.cast("double")) * sqrt(den2.cast("double"))))
            .as("spearman"))
        .orderBy("yr")
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        FROM orders GROUP BY 1),
      yearly AS (SELECT *, CAST(EXTRACT(year FROM d) AS BIGINT) AS yr FROM daily),
      ranked AS (SELECT yr,
          2 * CAST(RANK() OVER (PARTITION BY yr ORDER BY x) AS BIGINT)
            + CAST(COUNT(*) OVER (PARTITION BY yr, x) AS BIGINT) - 1 AS rx2,
          2 * CAST(RANK() OVER (PARTITION BY yr ORDER BY y) AS BIGINT)
            + CAST(COUNT(*) OVER (PARTITION BY yr, y) AS BIGINT) - 1 AS ry2
        FROM yearly),
      g AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(rx2) AS BIGINT) AS sx, CAST(SUM(ry2) AS BIGINT) AS sy,
          CAST(SUM(rx2 * rx2) AS BIGINT) AS sxx,
          CAST(SUM(ry2 * ry2) AS BIGINT) AS syy,
          CAST(SUM(rx2 * ry2) AS BIGINT) AS sxy
        FROM ranked GROUP BY yr)
      SELECT yr, n AS n_days,
        CAST(n * sxy - sx * sy AS DOUBLE) /
          (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
           sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS spearman
      FROM g
      WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      ORDER BY yr"""),
    covers = Seq("STAT-spearman"))

  // ------------------------------------------------- RFM segmentation
  // Recency/Frequency/Monetary quintile segmentation — the classic
  // customer-value grid, and a stand-in for any score-quantile
  // bucketing of entities. Each axis is an NTILE(5) over a TOTAL
  // order (metric, then custkey as tiebreak) so bucket assignment is
  // engine independent; the three digits concatenate into one
  // segment code. Per-segment rollup keeps money exact (DECIMAL sum,
  // ONE cast to double at the end) and derives averages from exact
  // long/decimal sums. The un-partitioned NTILE windows run over the
  // per-customer AGGREGATE (|customers| rows, not |orders|) — at
  // 100 TB the per-customer grain still fits a single task's sort,
  // and the heavy orders scan underneath is a hash aggregate.
  private val q261 = QueryDef(
    "q261_rfm_segments",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val maxd = o.agg(max(to_date(col("o_orderdate"))).as("maxd"))
      val cust = o.groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("lastd"),
          count(lit(1)).as("f"),
          sum(dec(col("o_totalprice"))).as("m"))
        .crossJoin(broadcast(maxd))
        .withColumn("r_days", datediff(col("maxd"), col("lastd")).cast("long"))
      val rq = ntile(5).over(Window.orderBy(asc("r_days"), asc("o_custkey")))
      val fq = ntile(5).over(Window.orderBy(desc("f"), asc("o_custkey")))
      val mq = ntile(5).over(Window.orderBy(desc("m"), asc("o_custkey")))
      cust
        .withColumn("segment",
          (rq * 100 + fq * 10 + mq).cast("long"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("f")).as("orders_total"),
          sum(col("m")).as("m_sum"),
          sum(col("r_days")).as("r_sum"))
        .select(col("segment"), col("n_customers"), col("orders_total"),
          col("m_sum").cast("double").as("monetary_total"),
          (col("r_sum").cast("double") / col("n_customers").cast("double"))
            .as("avg_recency_days"))
        .orderBy("segment")
    },
    Some("""WITH maxd AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
      cust AS (SELECT o_custkey,
          MAX(CAST(o_orderdate AS DATE)) AS lastd,
          CAST(COUNT(*) AS BIGINT) AS f,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        FROM orders GROUP BY o_custkey),
      scored AS (SELECT c.*,
          CAST(DATE_DIFF('day', lastd, maxd) AS BIGINT) AS r_days
        FROM cust c, maxd),
      tiled AS (SELECT *,
          NTILE(5) OVER (ORDER BY r_days ASC, o_custkey ASC) AS rq,
          NTILE(5) OVER (ORDER BY f DESC, o_custkey ASC) AS fq,
          NTILE(5) OVER (ORDER BY m DESC, o_custkey ASC) AS mq
        FROM scored)
      SELECT CAST(rq * 100 + fq * 10 + mq AS BIGINT) AS segment,
        CAST(COUNT(*) AS BIGINT) AS n_customers,
        CAST(SUM(f) AS BIGINT) AS orders_total,
        CAST(SUM(m) AS DOUBLE) AS monetary_total,
        CAST(SUM(r_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_recency_days
      FROM tiled GROUP BY 1 ORDER BY segment"""),
    covers = Seq("A-rfm"))

  // ------------------------------------------------- k-NN classification
  // Majority-vote label assignment: hold out vec_id % 10 = 0 as the
  // "unlabeled" query set, find each query's 7 nearest labeled
  // vectors by cosine (brute force, q29's proven-portable scoring),
  // and assign the modal neighbor label (ties: most votes, then
  // smallest label — a total order). This is label propagation for
  // training-data curation: extend a seed labeling to new documents
  // by embedding proximity. The candidate side streams (broadcast
  // queries, no shuffle of the big side); the vote is a tiny
  // per-query aggregate over k rows. At 100 TB the same plan holds
  // with the IVF/LSH variants (q30/q45) swapped in as the k-NN
  // source.
  private val q262 = QueryDef(
    "q262_knn_classify",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
      val q = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"))
      val c = e.filter(col("vec_id") % 10 =!= 0)
        .select(col("vec_id").as("n_id"), col("label").as("n_label"),
          col("embedding").as("n_emb"))
      graft.similarity.KnnVote.classify(s, q, c, 7)
        .withColumnRenamed("q_label", "true_label")
        .orderBy("q_id")
    },
    Some("""WITH q AS (SELECT vec_id AS q_id, label AS true_label, embedding AS q_emb
               FROM embeddings WHERE vec_id % 10 = 0),
      c AS (SELECT vec_id AS n_id, label AS n_label, embedding AS n_emb
            FROM embeddings WHERE vec_id % 10 <> 0),
      scored AS (
        SELECT q_id, true_label, n_id, n_label,
          list_sum(list_transform(list_zip(q_emb, n_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
          (sqrt(list_sum(list_transform(list_zip(q_emb, q_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) *
           sqrt(list_sum(list_transform(list_zip(n_emb, n_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))) AS cos
        FROM c, q),
      ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY cos DESC, n_id) AS rk FROM scored),
      votes AS (SELECT q_id, true_label, n_label,
                  CAST(COUNT(*) AS BIGINT) AS votes
                FROM ranked WHERE rk <= 7 GROUP BY 1, 2, 3),
      winner AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY votes DESC, n_label) AS vr FROM votes)
      SELECT q_id, true_label, n_label AS predicted, votes,
        n_label = true_label AS correct
      FROM winner WHERE vr = 1 ORDER BY q_id"""),
    covers = Seq("SIM-knn-classify"))

  val all: Seq[QueryDef] =
    Seq(q259, q260, q261, q262)
}
