package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}

import graft.Tables

/** Round-84 gate additions (q437–q441): distribution distance
  * (1-D Wasserstein), forecast calibration (Brier with a closed-form
  * exact decomposition), paired nonparametrics (Wilcoxon signed-rank,
  * McNemar), and product-analytics stickiness (DAU/MAU). All exact
  * integer bilinears up to one final division / IEEE sqrt.
  */
object Round84Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def cents: Column =
    (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)

  // ------------------------------------------------- Wasserstein-1D
  // Earth-mover distance between segment order-value distributions
  // in $5,000 buckets: W1 = Σ_k |F_a(k) − F_b(k)| over the dense
  // bucket grid, with each ECDF term kept as the exact integer
  // C_a·n_b − C_b·n_a over the common denominator n_a·n_b — the sum
  // is order-free, the single division deterministic. The
  // distribution-shape companion to the mean/quantile gap queries:
  // how much probability mass must MOVE, and how far.
  private val q437 = QueryDef(
    "q437_wasserstein_1d",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val ov = t(s, dir, "orders")
        .join(seg, Seq("o_custkey"))
        .select(col("segment"),
          floor(cents / lit(500000.0)).cast(LongType).as("bucket"))
      val counts = ov.groupBy("segment", "bucket").agg(count(lit(1)).as("c"))
      val maxB = ov.agg(max("bucket").as("mb"))
      val grid = maxB
        .select(explode(sequence(lit(0L), col("mb"))).as("bucket"))
        .crossJoin(broadcast(ov.select("segment").distinct()))
        .join(counts, Seq("segment", "bucket"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val wCum = Window.partitionBy("segment").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ecdf = grid.withColumn("cum", sum(col("c")).over(wCum))
      val tot = ov.groupBy("segment").agg(count(lit(1)).as("n"))
      val a = ecdf.select(col("segment").as("seg_a"), col("bucket"),
        col("cum").as("cum_a"))
      val b = ecdf.select(col("segment").as("seg_b"), col("bucket"),
        col("cum").as("cum_b"))
      a.join(b, Seq("bucket")).filter(col("seg_a") < col("seg_b"))
        .join(broadcast(tot.select(col("segment").as("seg_a"),
          col("n").as("n_a"))), Seq("seg_a"))
        .join(broadcast(tot.select(col("segment").as("seg_b"),
          col("n").as("n_b"))), Seq("seg_b"))
        .groupBy("seg_a", "seg_b", "n_a", "n_b")
        .agg(sum(abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
          .as("wnum"))
        .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
          (col("wnum").cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("w1_buckets"))
        .orderBy("seg_a", "seg_b")
    },
    Some("""WITH ov AS (SELECT c.c_mktsegment AS segment,
          CAST(floor(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT) / 500000.0) AS BIGINT) AS bucket
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      counts AS (SELECT segment, bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM ov GROUP BY 1, 2),
      grid AS (SELECT s.segment, g.bucket, COALESCE(ct.c, 0) AS c
        FROM (SELECT DISTINCT segment FROM ov) s
        CROSS JOIN (SELECT unnest(range(0,
          (SELECT MAX(bucket) + 1 FROM ov))) AS bucket) g
        LEFT JOIN counts ct ON ct.segment = s.segment
          AND ct.bucket = g.bucket),
      ecdf AS (SELECT segment, bucket,
          CAST(SUM(c) OVER (PARTITION BY segment ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum
        FROM grid),
      tot AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n
        FROM ov GROUP BY 1)
      SELECT a.segment AS seg_a, b.segment AS seg_b,
        ta.n AS n_a, tb.n AS n_b,
        CAST(SUM(ABS(a.cum * tb.n - b.cum * ta.n)) AS DOUBLE) /
          CAST(ta.n * tb.n AS DOUBLE) AS w1_buckets
      FROM ecdf a JOIN ecdf b
        ON a.bucket = b.bucket AND a.segment < b.segment
      JOIN tot ta ON ta.segment = a.segment
      JOIN tot tb ON tb.segment = b.segment
      GROUP BY 1, 2, 3, 4 ORDER BY seg_a, seg_b"""),
    covers = Seq("STAT-wasserstein-1d"))

  // ------------------------------------------------- Brier score
  // Forecast calibration without a model: the train-period urgent
  // rate per segment (orders before 1999) is the "forecast" for the
  // test period; Brier = mean (p̂−y)² folds to the closed form
  // (a²n − 2abk + b²k)/(b²n) over exact counts, so no per-row float
  // sum exists at all. The skill score compares against the global
  // climatology forecast the same way.
  private val q438 = QueryDef(
    "q438_brier_score",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val o = t(s, dir, "orders").join(seg, Seq("o_custkey"))
        .select(col("segment"),
          (col("o_orderpriority") === "1-URGENT").as("y"),
          (to_date(col("o_orderdate")) < lit("1999-01-01").cast(DateType))
            .as("is_train"))
      val train = o.filter(col("is_train")).groupBy("segment")
        .agg(sum(when(col("y"), 1L).otherwise(0L)).as("a"),
          count(lit(1)).as("b"))
      val glob = o.filter(col("is_train"))
        .agg(sum(when(col("y"), 1L).otherwise(0L)).as("a0"),
          count(lit(1)).as("b0"))
      val test = o.filter(!col("is_train")).groupBy("segment")
        .agg(sum(when(col("y"), 1L).otherwise(0L)).as("k"),
          count(lit(1)).as("n"))
      test.join(broadcast(train), Seq("segment"))
        .crossJoin(broadcast(glob))
        .select(col("segment"), col("n"), col("k"),
          (col("a").cast("double") / col("b").cast("double")).as("p_hat"),
          (col("k").cast("double") / col("n").cast("double")).as("rate"),
          ((col("a") * col("a") * col("n")
            - lit(2L) * col("a") * col("b") * col("k")
            + col("b") * col("b") * col("k")).cast("double") /
            (col("b") * col("b") * col("n")).cast("double")).as("brier"),
          ((col("a0") * col("a0") * col("n")
            - lit(2L) * col("a0") * col("b0") * col("k")
            + col("b0") * col("b0") * col("k")).cast("double") /
            (col("b0") * col("b0") * col("n")).cast("double"))
            .as("brier_clim"))
        .withColumn("skill",
          lit(1.0) - col("brier") / col("brier_clim"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT c.c_mktsegment AS segment,
          (o.o_orderpriority = '1-URGENT') AS y,
          (CAST(o.o_orderdate AS DATE) < DATE '1999-01-01') AS is_train
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      train AS (SELECT segment,
          CAST(COUNT(*) FILTER (WHERE y) AS BIGINT) AS a,
          CAST(COUNT(*) AS BIGINT) AS b
        FROM o WHERE is_train GROUP BY 1),
      gl AS (SELECT CAST(COUNT(*) FILTER (WHERE y) AS BIGINT) AS a0,
          CAST(COUNT(*) AS BIGINT) AS b0
        FROM o WHERE is_train),
      test AS (SELECT segment,
          CAST(COUNT(*) FILTER (WHERE y) AS BIGINT) AS k,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM o WHERE NOT is_train GROUP BY 1)
      SELECT t.segment, t.n, t.k,
        CAST(tr.a AS DOUBLE) / CAST(tr.b AS DOUBLE) AS p_hat,
        CAST(t.k AS DOUBLE) / CAST(t.n AS DOUBLE) AS rate,
        CAST(tr.a * tr.a * t.n - 2 * tr.a * tr.b * t.k
            + tr.b * tr.b * t.k AS DOUBLE) /
          CAST(tr.b * tr.b * t.n AS DOUBLE) AS brier,
        CAST(g.a0 * g.a0 * t.n - 2 * g.a0 * g.b0 * t.k
            + g.b0 * g.b0 * t.k AS DOUBLE) /
          CAST(g.b0 * g.b0 * t.n AS DOUBLE) AS brier_clim,
        1.0 - (CAST(tr.a * tr.a * t.n - 2 * tr.a * tr.b * t.k
            + tr.b * tr.b * t.k AS DOUBLE) /
          CAST(tr.b * tr.b * t.n AS DOUBLE)) /
          (CAST(g.a0 * g.a0 * t.n - 2 * g.a0 * g.b0 * t.k
            + g.b0 * g.b0 * t.k AS DOUBLE) /
          CAST(g.b0 * g.b0 * t.n AS DOUBLE)) AS skill
      FROM test t JOIN train tr ON tr.segment = t.segment
      CROSS JOIN gl g ORDER BY t.segment"""),
    covers = Seq("STAT-brier-score"))

  // ------------------------------------------------- Wilcoxon
  // Signed-rank test on paired first-vs-second order value per
  // customer: did the second purchase get bigger? Midranks are kept
  // exact by working in doubled units (2·midrank = 2·rank + ties −
  // 1, an integer), the tie-corrected variance is one exact integer
  // bilinear, and z is a single division over an IEEE sqrt.
  private val q439 = QueryDef(
    "q439_wilcoxon_signed_rank",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val wOrd = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val firstTwo = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          cents.as("v"),
          row_number().over(wOrd).as("rn"))
        .filter(col("rn") <= 2)
        .groupBy("o_custkey")
        .agg(max(when(col("rn") === 1, col("v"))).as("v1"),
          max(when(col("rn") === 2, col("v"))).as("v2"))
        .filter(col("v2").isNotNull)
        .join(seg, Seq("o_custkey"))
        .select(col("segment"), (col("v2") - col("v1")).as("d"))
        .filter(col("d") =!= 0)
        .withColumn("absd", abs(col("d")))
      val wRank = Window.partitionBy("segment").orderBy("absd")
      val wTie = Window.partitionBy("segment", "absd")
      val ranked = firstTwo
        .withColumn("rnk", rank().over(wRank).cast(LongType))
        .withColumn("tcnt", count(lit(1)).over(wTie))
        .withColumn("r2", lit(2L) * col("rnk") + col("tcnt") - 1L)
      val ties = firstTwo.groupBy("segment", "absd")
        .agg(count(lit(1)).as("tc"))
        .groupBy("segment")
        .agg(sum(col("tc") * col("tc") * col("tc") - col("tc")).as("tt"))
      ranked.groupBy("segment")
        .agg(count(lit(1)).as("n"),
          sum(when(col("d") > 0, col("r2")).otherwise(0L)).as("w2_plus"))
        .join(broadcast(ties), Seq("segment"))
        .select(col("segment"), col("n"), col("w2_plus"), col("tt"),
          ((col("w2_plus") - expr("n * (n + 1) DIV 2")).cast("double") /
            sqrt((lit(2L) * col("n") * (col("n") + 1L) *
              (lit(2L) * col("n") + 1L) - col("tt")).cast("double") /
              lit(12.0))).as("z"))
        .orderBy("segment")
    },
    Some("""WITH ft AS (SELECT o_custkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders),
      pairs AS (SELECT f.o_custkey,
          MAX(CASE WHEN rn = 1 THEN v END) AS v1,
          MAX(CASE WHEN rn = 2 THEN v END) AS v2
        FROM ft f WHERE rn <= 2 GROUP BY 1),
      d AS (SELECT c.c_mktsegment AS segment,
          p.v2 - p.v1 AS d, ABS(p.v2 - p.v1) AS absd
        FROM pairs p JOIN customer c ON c.c_custkey = p.o_custkey
        WHERE p.v2 IS NOT NULL AND p.v2 - p.v1 <> 0),
      ranked AS (SELECT segment, d, absd,
          CAST(rank() OVER (PARTITION BY segment ORDER BY absd)
            AS BIGINT) AS rnk,
          CAST(COUNT(*) OVER (PARTITION BY segment, absd)
            AS BIGINT) AS tcnt
        FROM d),
      ties AS (SELECT segment,
          CAST(SUM(tc * tc * tc - tc) AS BIGINT) AS tt
        FROM (SELECT segment, absd, CAST(COUNT(*) AS BIGINT) AS tc
          FROM d GROUP BY 1, 2) GROUP BY segment),
      agg AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN d > 0 THEN 2 * rnk + tcnt - 1
            ELSE 0 END) AS BIGINT) AS w2_plus
        FROM ranked GROUP BY segment)
      SELECT a.segment, a.n, a.w2_plus, t.tt,
        CAST(a.w2_plus - a.n * (a.n + 1) // 2 AS DOUBLE) /
          sqrt(CAST(2 * a.n * (a.n + 1) * (2 * a.n + 1) - t.tt
            AS DOUBLE) / 12.0) AS z
      FROM agg a JOIN ties t ON t.segment = a.segment
      ORDER BY a.segment"""),
    covers = Seq("STAT-wilcoxon-signed-rank"))

  // ------------------------------------------------- McNemar
  // Paired binary flip test: is a customer's LAST order more likely
  // urgent than their FIRST? Only the discordant cells matter —
  // χ² = (b−c)²/(b+c), plus the Edwards continuity-corrected
  // variant — each one exact-integer division.
  private val q440 = QueryDef(
    "q440_mcnemar",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val wAsc = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wDesc = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val fl = t(s, dir, "orders")
        .select(col("o_custkey"),
          (col("o_orderpriority") === "1-URGENT").as("y"),
          row_number().over(wAsc).as("ra"),
          row_number().over(wDesc).as("rd"))
        .filter(col("ra") === 1 || col("rd") === 1)
        .groupBy("o_custkey")
        .agg(max(when(col("ra") === 1, col("y"))).as("y_first"),
          max(when(col("rd") === 1, col("y"))).as("y_last"),
          count(lit(1)).as("cnt"))
        .filter(col("cnt") === 2)
        .join(seg, Seq("o_custkey"))
      fl.groupBy("segment")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("y_first") && !col("y_last"), 1L).otherwise(0L))
            .as("b"),
          sum(when(!col("y_first") && col("y_last"), 1L).otherwise(0L))
            .as("c"))
        .select(col("segment"), col("n_pairs"), col("b"), col("c"),
          (((col("b") - col("c")) * (col("b") - col("c"))).cast("double") /
            (col("b") + col("c")).cast("double")).as("chi2"),
          (((abs(col("b") - col("c")) - 1L) *
            (abs(col("b") - col("c")) - 1L)).cast("double") /
            (col("b") + col("c")).cast("double")).as("chi2_cc"))
        .orderBy("segment")
    },
    Some("""WITH fo AS (SELECT o_custkey,
          (o_orderpriority = '1-URGENT') AS y,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS ra,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rd
        FROM orders),
      fl AS (SELECT o_custkey,
          MAX(CASE WHEN ra = 1 THEN y END) AS y_first,
          MAX(CASE WHEN rd = 1 THEN y END) AS y_last,
          COUNT(*) AS cnt
        FROM fo WHERE ra = 1 OR rd = 1 GROUP BY 1),
      d AS (SELECT c.c_mktsegment AS segment, f.y_first, f.y_last
        FROM fl f JOIN customer c ON c.c_custkey = f.o_custkey
        WHERE f.cnt = 2),
      agg AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(COUNT(*) FILTER (WHERE y_first AND NOT y_last)
            AS BIGINT) AS b,
          CAST(COUNT(*) FILTER (WHERE NOT y_first AND y_last)
            AS BIGINT) AS c
        FROM d GROUP BY segment)
      SELECT segment, n_pairs, b, c,
        CAST((b - c) * (b - c) AS DOUBLE) /
          CAST(b + c AS DOUBLE) AS chi2,
        CAST((ABS(b - c) - 1) * (ABS(b - c) - 1) AS DOUBLE) /
          CAST(b + c AS DOUBLE) AS chi2_cc
      FROM agg ORDER BY segment"""),
    covers = Seq("STAT-mcnemar"))

  // ------------------------------------------------- DAU/MAU
  // Product-analytics stickiness: per day, distinct active users
  // (DAU) over distinct users active in the trailing 28 days (MAU),
  // one exact division. The MAU window is materialized by fanning
  // each user-day out to the 28 days it keeps the user "monthly
  // active" — exact at gate scale; the sketch path at 100 TB is the
  // same query with the KMV aggregate replacing count_distinct.
  private val q441 = QueryDef(
    "q441_dau_mau_stickiness",
    (s, dir) => {
      val ud = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
      val mau = ud
        .select(col("user_id"),
          explode(sequence(col("day"),
            date_add(col("day"), 27))).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("mau"))
      dau.join(mau, Seq("day"))
        .select(col("day"), col("dau"), col("mau"),
          (col("dau").cast("double") / col("mau").cast("double"))
            .as("stickiness"))
        .orderBy("day")
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
          CAST(ts AS DATE) AS day FROM events),
      dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
        FROM ud GROUP BY day),
      fan AS (SELECT DISTINCT user_id, day + CAST(off AS INTEGER) AS day
        FROM ud, (SELECT unnest(range(0, 28)) AS off)),
      mau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS mau
        FROM fan GROUP BY day)
      SELECT d.day, d.dau, m.mau,
        CAST(d.dau AS DOUBLE) / CAST(m.mau AS DOUBLE) AS stickiness
      FROM dau d JOIN mau m ON m.day = d.day
      ORDER BY d.day"""),
    covers = Seq("STREAM-dau-mau"))

  val all: Seq[QueryDef] = Seq(q437, q438, q439, q440, q441)
}
