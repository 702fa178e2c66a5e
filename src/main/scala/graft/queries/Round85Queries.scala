package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-85 gate additions (q442–q446): embedding cluster quality
  * (centroid silhouette + between/within variance decomposition),
  * catalog churn (top-k turnover), purchase-rhythm quantiles, and
  * the decile gains table. Embedding geometry runs on the q307
  * fixed-point lattice (floor(x·2²⁰)) so every squared distance is
  * an exact integer bilinear — DECIMAL(38,0)/HUGEINT where products
  * exceed 2⁶³ — and only the final distance takes an IEEE sqrt.
  */
object Round85Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Q = 1048576L // 2^20 fixed-point scale (matches q307)

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  // ------------------------------------------------- silhouette
  // Centroid silhouette per label: a = distance to own centroid,
  // b = nearest other centroid, s = (b−a)/max(a,b). Each squared
  // centroid distance is the exact integer Σ_d(n_m·q_d − S_md)² over
  // the common denominator n_m², so distances are one sqrt each and
  // the bin census (s>0.25 / 0≤s≤0.25 / s<0) is exact. The per-label
  // compactness avg_d2_own = Σnum/(n_l³·Q²) is a single division.
  // O(vectors · dims · labels) rows — embarrassingly parallel, no
  // pairwise n² silhouette at 100 TB.
  private val q442 = QueryDef(
    "q442_silhouette",
    (s, dir) => {
      val vd = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast(LongType).as("label"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("vec_id"), col("label"), (col("pos") + 1).as("dim"),
          floor(col("x").cast("double") * lit(Q.toDouble))
            .cast(LongType).as("q"))
      val cent = vd.groupBy(col("label").as("m"), col("dim"))
        .agg(sum("q").as("sq"), count(lit(1)).as("n_m"))
      val num = vd.join(cent, Seq("dim"))
        .withColumn("term",
          dec38(col("n_m") * col("q") - col("sq")) *
            dec38(col("n_m") * col("q") - col("sq")))
        .groupBy("vec_id", "label", "m", "n_m")
        .agg(sum("term").as("num"))
        .withColumn("dist",
          sqrt(col("num").cast("double")) / col("n_m").cast("double"))
      val own = num.filter(col("m") === col("label"))
        .select(col("vec_id"), col("label"), col("dist").as("a"),
          col("num").as("num_own"), col("n_m").as("n_l"))
      val other = num.filter(col("m") =!= col("label"))
        .groupBy("vec_id").agg(min("dist").as("b"))
      val sil = own.join(other, Seq("vec_id"))
        .withColumn("sil",
          (col("b") - col("a")) / greatest(col("a"), col("b")))
      sil.groupBy("label")
        .agg(count(lit(1)).as("n"), max("n_l").as("n_l"),
          sum(when(col("sil") > 0.25, 1L).otherwise(0L)).as("n_strong"),
          sum(when(col("sil") >= 0.0 && col("sil") <= 0.25, 1L)
            .otherwise(0L)).as("n_mid"),
          sum(when(col("sil") < 0.0, 1L).otherwise(0L)).as("n_neg"),
          sum("num_own").as("snum"))
        .select(col("label"), col("n"), col("n_strong"), col("n_mid"),
          col("n_neg"),
          (col("snum").cast("double") /
            ((col("n_l") * col("n_l") * col("n_l")).cast("double") *
              lit((Q * Q).toDouble))).as("avg_d2_own"))
        .orderBy("label")
    },
    Some("""WITH vd AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          i.i AS dim,
          CAST(floor(CAST(embedding[i.i] AS DOUBLE) * 1048576.0)
            AS BIGINT) AS q
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i),
      cent AS (SELECT label AS m, dim, CAST(SUM(q) AS BIGINT) AS sq,
          CAST(COUNT(*) AS BIGINT) AS n_m
        FROM vd GROUP BY 1, 2),
      num AS (SELECT v.vec_id, v.label, c.m, c.n_m,
          SUM(CAST(c.n_m * v.q - c.sq AS HUGEINT) *
              CAST(c.n_m * v.q - c.sq AS HUGEINT)) AS num
        FROM vd v JOIN cent c ON c.dim = v.dim
        GROUP BY 1, 2, 3, 4),
      dist AS (SELECT vec_id, label, m, n_m, num,
          sqrt(CAST(num AS DOUBLE)) / CAST(n_m AS DOUBLE) AS dist
        FROM num),
      own AS (SELECT vec_id, label, dist AS a, num AS num_own,
          n_m AS n_l FROM dist WHERE m = label),
      oth AS (SELECT vec_id, MIN(dist) AS b FROM dist
        WHERE m <> label GROUP BY vec_id),
      sil AS (SELECT o.vec_id, o.label, o.num_own, o.n_l,
          (t.b - o.a) / greatest(o.a, t.b) AS sil
        FROM own o JOIN oth t ON t.vec_id = o.vec_id)
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(*) FILTER (WHERE sil > 0.25) AS BIGINT) AS n_strong,
        CAST(COUNT(*) FILTER (WHERE sil >= 0.0 AND sil <= 0.25)
          AS BIGINT) AS n_mid,
        CAST(COUNT(*) FILTER (WHERE sil < 0.0) AS BIGINT) AS n_neg,
        CAST(SUM(num_own) AS DOUBLE) /
          (CAST(MAX(n_l) * MAX(n_l) * MAX(n_l) AS DOUBLE) *
            CAST(1048576 AS DOUBLE) * CAST(1048576 AS DOUBLE))
          AS avg_d2_own
      FROM sil GROUP BY label ORDER BY label"""),
    covers = Seq("SIM-silhouette"))

  // ------------------------------------------------- cluster ANOVA
  // Between/within variance decomposition of the embedding space by
  // label — the Calinski-Harabasz ingredients, per label: within
  // ssw_num = Σ_d(n_l·Σq² − S²) and between ssb_num =
  // Σ_d(n·S_ld − n_l·S_d)², both exact DECIMAL(38,0)/HUGEINT
  // bilinears, scaled to doubles by their exact denominators. The
  // separation/compactness ratio per cluster without a single
  // float accumulation.
  private val q443 = QueryDef(
    "q443_cluster_anova",
    (s, dir) => {
      val vd = t(s, dir, "embeddings")
        .select(col("label").cast(LongType).as("label"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(col("label"), (col("pos") + 1).as("dim"),
          floor(col("x").cast("double") * lit(Q.toDouble))
            .cast(LongType).as("q"))
      val byLab = vd.groupBy("label", "dim")
        .agg(sum("q").as("sl"), sum(col("q") * col("q")).as("sq2"),
          count(lit(1)).as("n_l"))
      val glob = vd.groupBy("dim")
        .agg(sum("q").as("sg"), count(lit(1)).as("n"))
      byLab.join(glob, Seq("dim"))
        .withColumn("ssw_term",
          dec38(col("n_l")) * dec38(col("sq2")) -
            dec38(col("sl")) * dec38(col("sl")))
        .withColumn("ssb_term",
          (dec38(col("n") * col("sl")) - dec38(col("n_l")) * dec38(col("sg"))) *
          (dec38(col("n") * col("sl")) - dec38(col("n_l")) * dec38(col("sg"))))
        .groupBy("label")
        .agg(max("n_l").as("n_l"), max("n").as("n"),
          sum("ssw_term").as("ssw_num"), sum("ssb_term").as("ssb_num"))
        .select(col("label"), col("n_l"),
          (col("ssw_num").cast("double") /
            ((col("n_l").cast("double") * col("n_l").cast("double")) *
              lit((Q * Q).toDouble))).as("ssw"),
          (col("ssb_num").cast("double") /
            ((col("n_l").cast("double") *
              (col("n").cast("double") * col("n").cast("double"))) *
              lit((Q * Q).toDouble))).as("ssb"))
        .withColumn("separation", col("ssb") / col("ssw"))
        .orderBy("label")
    },
    Some("""WITH vd AS (SELECT CAST(label AS BIGINT) AS label,
          i.i AS dim,
          CAST(floor(CAST(embedding[i.i] AS DOUBLE) * 1048576.0)
            AS BIGINT) AS q
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i),
      by_lab AS (SELECT label, dim, CAST(SUM(q) AS BIGINT) AS sl,
          CAST(SUM(q * q) AS BIGINT) AS sq2,
          CAST(COUNT(*) AS BIGINT) AS n_l
        FROM vd GROUP BY 1, 2),
      gl AS (SELECT dim, CAST(SUM(q) AS BIGINT) AS sg,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM vd GROUP BY 1),
      terms AS (SELECT b.label, b.n_l, g.n,
          CAST(b.n_l AS HUGEINT) * CAST(b.sq2 AS HUGEINT) -
            CAST(b.sl AS HUGEINT) * CAST(b.sl AS HUGEINT) AS ssw_term,
          (CAST(g.n * b.sl AS HUGEINT) -
            CAST(b.n_l AS HUGEINT) * CAST(g.sg AS HUGEINT)) *
          (CAST(g.n * b.sl AS HUGEINT) -
            CAST(b.n_l AS HUGEINT) * CAST(g.sg AS HUGEINT)) AS ssb_term
        FROM by_lab b JOIN gl g ON g.dim = b.dim),
      agg AS (SELECT label, MAX(n_l) AS n_l, MAX(n) AS n,
          SUM(ssw_term) AS ssw_num, SUM(ssb_term) AS ssb_num
        FROM terms GROUP BY label)
      SELECT label, n_l,
        CAST(ssw_num AS DOUBLE) /
          ((CAST(n_l AS DOUBLE) * CAST(n_l AS DOUBLE)) *
            CAST(1099511627776 AS DOUBLE)) AS ssw,
        CAST(ssb_num AS DOUBLE) /
          ((CAST(n_l AS DOUBLE) *
            (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) *
            CAST(1099511627776 AS DOUBLE)) AS ssb,
        (CAST(ssb_num AS DOUBLE) /
          ((CAST(n_l AS DOUBLE) *
            (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) *
            CAST(1099511627776 AS DOUBLE))) /
        (CAST(ssw_num AS DOUBLE) /
          ((CAST(n_l AS DOUBLE) * CAST(n_l AS DOUBLE)) *
            CAST(1099511627776 AS DOUBLE))) AS separation
      FROM agg ORDER BY label"""),
    covers = Seq("SIM-cluster-anova"))

  // ------------------------------------------------- top-k turnover
  // Month-over-month churn of the revenue top-20 parts: Jaccard of
  // adjacent months' top sets (net revenue exact at scale 4, ties →
  // partkey). A stable catalog holds J near 1; merchandising shocks
  // show as dips. Top sets are 20 rows per month — the adjacency
  // join is trivially broadcastable at any scale.
  private val q444 = QueryDef(
    "q444_topk_turnover",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"),
          (year(to_date(col("l_shipdate"))) * 12 +
            month(to_date(col("l_shipdate")))).cast(LongType).as("mk"),
          ((col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(4, 2)) -
              col("l_discount").cast(DecimalType(4, 2)))) * 10000)
            .cast(LongType).as("rev4"))
      val pm = li.groupBy("mk", "l_partkey").agg(sum("rev4").as("rev"))
      // the engine's TopKPerKey operator instead of a row_number window:
      // bounded pre-shuffle heaps cap map output at k rows per (month,
      // partition) where the window would sort every (month, part) row
      // after the exchange — rank semantics identical (total order via
      // the partkey tiebreak)
      val top = graft.plans.TopKPerKey.perKey(
          pm, Seq("mk"), Seq(col("rev").desc, col("l_partkey")), 20)
        .select(col("mk"), col("l_partkey"))
      val sizes = top.groupBy("mk").agg(count(lit(1)).as("sz"))
      val nxt = top.select((col("mk") - 1L).as("mk"),
        col("l_partkey"))
      val common = top.join(nxt, Seq("mk", "l_partkey"))
        .groupBy("mk").agg(count(lit(1)).as("n_common"))
      sizes.as("s1")
        .join(sizes.as("s2").select((col("mk") - 1L).as("mk"),
          col("sz").as("sz_next")), Seq("mk"))
        .join(common, Seq("mk"), "left")
        .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
        .select(col("mk"), col("sz"), col("sz_next"), col("n_common"),
          (col("n_common").cast("double") /
            (col("sz") + col("sz_next") - col("n_common")).cast("double"))
            .as("jaccard"))
        .orderBy("mk")
    },
    Some("""WITH li AS (SELECT l_partkey,
          CAST(year(CAST(l_shipdate AS DATE)) * 12 +
            month(CAST(l_shipdate AS DATE)) AS BIGINT) AS mk,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
            * 10000 AS BIGINT) AS rev4
        FROM lineitem),
      pm AS (SELECT mk, l_partkey, CAST(SUM(rev4) AS BIGINT) AS rev
        FROM li GROUP BY 1, 2),
      top AS (SELECT mk, l_partkey FROM (SELECT mk, l_partkey,
          row_number() OVER (PARTITION BY mk
            ORDER BY rev DESC, l_partkey) AS rn FROM pm)
        WHERE rn <= 20),
      sizes AS (SELECT mk, CAST(COUNT(*) AS BIGINT) AS sz
        FROM top GROUP BY mk),
      common AS (SELECT a.mk, CAST(COUNT(*) AS BIGINT) AS n_common
        FROM top a JOIN top b
          ON b.l_partkey = a.l_partkey AND b.mk = a.mk + 1
        GROUP BY a.mk)
      SELECT s1.mk, s1.sz, s2.sz AS sz_next,
        COALESCE(c.n_common, 0) AS n_common,
        CAST(COALESCE(c.n_common, 0) AS DOUBLE) /
          CAST(s1.sz + s2.sz - COALESCE(c.n_common, 0) AS DOUBLE)
          AS jaccard
      FROM sizes s1 JOIN sizes s2 ON s2.mk = s1.mk + 1
      LEFT JOIN common c ON c.mk = s1.mk
      ORDER BY s1.mk"""),
    covers = Seq("REL-topk-turnover"))

  // ------------------------------------------------- repurchase gaps
  // Purchase-rhythm quantiles: days between consecutive orders per
  // customer, P25/P50/P75/P90 per segment by percentile_disc — exact
  // integer order-statistic picks, no interpolation to diverge on.
  // The replenishment-cycle profile behind inventory planning.
  private val q445 = QueryDef(
    "q445_repurchase_quantiles",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("o_custkey"),
          datediff(to_date(col("o_orderdate")), to_date(col("prev")))
            .cast(LongType).as("gap"))
        .join(seg, Seq("o_custkey"))
      gaps.groupBy("segment")
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY gap)")
            .cast(LongType).as("p25"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap)")
            .cast(LongType).as("p50"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY gap)")
            .cast(LongType).as("p75"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap)")
            .cast(LongType).as("p90"))
        .orderBy("segment")
    },
    Some("""WITH gaps AS (SELECT o_custkey,
          CAST(date_diff('day',
            lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate, o_orderkey),
            CAST(o_orderdate AS DATE)) AS BIGINT) AS gap
        FROM orders),
      g AS (SELECT c.c_mktsegment AS segment, gaps.gap
        FROM gaps JOIN customer c ON c.c_custkey = gaps.o_custkey
        WHERE gaps.gap IS NOT NULL)
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY gap)
          AS BIGINT) AS p25,
        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap)
          AS BIGINT) AS p50,
        CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY gap)
          AS BIGINT) AS p75,
        CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap)
          AS BIGINT) AS p90
      FROM g GROUP BY segment ORDER BY segment"""),
    covers = Seq("STAT-repurchase-quantiles"))

  // ------------------------------------------------- gains table
  // Decile gains chart: rank customers by 1995–97 spend (the
  // "score"), report each decile's share of 1998+ spend (the
  // "response") plus cumulative capture — the model-eval table that
  // turns q420's correlation into business language. Deciles by
  // ntile over a unique total order; shares are exact-cents
  // divisions.
  private val q446 = QueryDef(
    "q446_gains_table",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_custkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("cents"),
          year(to_date(col("o_orderdate"))).as("yr"))
      val cust = o.groupBy("o_custkey")
        .agg(sum(when(col("yr") <= 1997, col("cents")).otherwise(0L))
          .as("score"),
          sum(when(col("yr") >= 1998, col("cents")).otherwise(0L))
            .as("future"))
      val w = Window.orderBy(col("score").desc, col("o_custkey"))
      val dec = cust.withColumn("decile", ntile(10).over(w).cast(LongType))
      val tot = dec.agg(sum("future").as("tf"))
      val byDec = dec.groupBy("decile")
        .agg(count(lit(1)).as("n_cust"), sum("score").as("score_cents"),
          sum("future").as("future_cents"))
      val wc = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDec.crossJoin(broadcast(tot))
        .withColumn("cum_future", sum(col("future_cents")).over(wc))
        .select(col("decile"), col("n_cust"), col("score_cents"),
          col("future_cents"),
          (col("future_cents").cast("double") / col("tf").cast("double"))
            .as("capture"),
          (col("cum_future").cast("double") / col("tf").cast("double"))
            .as("cum_capture"))
        .orderBy("decile")
    },
    Some("""WITH o AS (SELECT o_custkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS cents,
          year(CAST(o_orderdate AS DATE)) AS yr
        FROM orders),
      cust AS (SELECT o_custkey,
          CAST(SUM(CASE WHEN yr <= 1997 THEN cents ELSE 0 END)
            AS BIGINT) AS score,
          CAST(SUM(CASE WHEN yr >= 1998 THEN cents ELSE 0 END)
            AS BIGINT) AS future
        FROM o GROUP BY 1),
      dec AS (SELECT score, future,
          CAST(ntile(10) OVER (ORDER BY score DESC, o_custkey)
            AS BIGINT) AS decile
        FROM cust),
      by_dec AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_cust,
          CAST(SUM(score) AS BIGINT) AS score_cents,
          CAST(SUM(future) AS BIGINT) AS future_cents
        FROM dec GROUP BY decile),
      tot AS (SELECT CAST(SUM(future) AS BIGINT) AS tf FROM dec)
      SELECT d.decile, d.n_cust, d.score_cents, d.future_cents,
        CAST(d.future_cents AS DOUBLE) / CAST(t.tf AS DOUBLE) AS capture,
        CAST(SUM(d.future_cents) OVER (ORDER BY d.decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
          CAST(t.tf AS DOUBLE) AS cum_capture
      FROM by_dec d CROSS JOIN tot t ORDER BY d.decile"""),
    covers = Seq("STAT-gains-table"))

  val all: Seq[QueryDef] = Seq(q442, q443, q444, q445, q446)
}
