package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-79 gate additions (q414–q418): two-proportion z-tests,
  * leave-one-out influence, serial correlation, duplicate locality,
  * and charm-pricing census. Exact-arithmetic discipline throughout.
  */
object Round79Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  private def cents: Column =
    (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast(LongType)

  // ------------------------------------------------- two-proportion z
  // Is a segment's urgent-order share different from the REST of the
  // book? Classic two-proportion z with pooled variance, one row per
  // segment vs its complement. Counts are exact; the z closes in a
  // fixed double expression (sqrt is IEEE-exact).
  private val q414 = QueryDef(
    "q414_two_proportion_z",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("o_orderpriority").startsWith("1").cast(LongType).as("urgent"))
      val g = o.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("urgent")).as("k"))
      val tot = g.agg(sum(col("n")).as("nn"), sum(col("k")).as("kk"))
      g.crossJoin(broadcast(tot))
        .withColumn("p_seg", col("k").cast("double") / col("n").cast("double"))
        .withColumn("p_rest", (col("kk") - col("k")).cast("double")
          / (col("nn") - col("n")).cast("double"))
        .withColumn("p_pool", col("kk").cast("double") / col("nn").cast("double"))
        .withColumn("z_stat", (col("p_seg") - col("p_rest"))
          / sqrt(col("p_pool") * (lit(1.0d) - col("p_pool"))
            * (lit(1.0d) / col("n").cast("double")
              + lit(1.0d) / (col("nn") - col("n")).cast("double"))))
        .select(col("segment"), col("n").as("n_orders"), col("k").as("n_urgent"),
          col("p_seg"), col("p_rest"), col("z_stat"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT c_mktsegment AS segment,
          CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS urgent
        FROM orders JOIN customer ON o_custkey = c_custkey),
      g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(urgent) AS BIGINT) AS k
        FROM o GROUP BY segment),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
          CAST(SUM(k) AS BIGINT) AS kk FROM g),
      f AS (SELECT segment, n, k, nn, kk,
          CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p_seg,
          CAST(kk - k AS DOUBLE) / CAST(nn - n AS DOUBLE) AS p_rest,
          CAST(kk AS DOUBLE) / CAST(nn AS DOUBLE) AS p_pool
        FROM g, tot)
      SELECT segment, n AS n_orders, k AS n_urgent, p_seg, p_rest,
        (p_seg - p_rest) / sqrt(p_pool * (1.0 - p_pool)
          * (1.0 / CAST(n AS DOUBLE) + 1.0 / CAST(nn - n AS DOUBLE)))
          AS z_stat
      FROM f ORDER BY segment"""),
    covers = Seq("STAT-two-proportion"))

  // ------------------------------------------------- max influence
  // Leave-one-out sensitivity: how far does each segment's mean move
  // when its single largest order is removed — the influence audit
  // that tells whether q404's outlier actually matters. Everything is
  // a ratio of exact sums; the two means subtract in one fixed
  // expression.
  private val q415 = QueryDef(
    "q415_max_influence",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), cents.as("c"))
      o.groupBy("segment")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
          max(col("c")).as("max_c"))
        .filter(col("n") >= 2)
        .withColumn("mean_all",
          col("sx").cast("double") / col("n").cast("double"))
        .withColumn("mean_loo", (col("sx") - col("max_c")).cast("double")
          / (col("n") - 1L).cast("double"))
        .select(col("segment"), col("n").as("n_orders"), col("max_c"),
          col("mean_all"), col("mean_loo"),
          (col("mean_all") - col("mean_loo")).as("influence_cents"),
          ((col("mean_all") - col("mean_loo")) / col("mean_all"))
            .as("influence_rel"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT c_mktsegment AS segment,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders JOIN customer ON o_custkey = c_custkey),
      g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(c) AS HUGEINT) AS sx, MAX(c) AS max_c
        FROM o GROUP BY segment HAVING COUNT(*) >= 2),
      m AS (SELECT segment, n, max_c,
          CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_all,
          CAST(sx - max_c AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS mean_loo
        FROM g)
      SELECT segment, n AS n_orders, max_c, mean_all, mean_loo,
        mean_all - mean_loo AS influence_cents,
        (mean_all - mean_loo) / mean_all AS influence_rel
      FROM m ORDER BY segment"""),
    covers = Seq("STAT-influence"))

  // ------------------------------------------------- order-size memory
  // Within-customer serial correlation: does a big order predict the
  // NEXT order's size? Lag-1 (previous, current) value pairs per
  // customer via one partitioned window, pooled Pearson r per segment
  // from exact integer moments — the behavioral-memory statistic.
  private val q416 = QueryDef(
    "q416_order_size_memory",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
          col("o_orderkey"), cents.as("c"))
        .withColumn("prev", lag(col("c"), 1).over(w))
        .filter(col("prev").isNotNull)
      val seg = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val g = o.join(broadcast(seg), col("o_custkey") === col("c_custkey"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("prev")).as("sx"), sum(col("c")).as("sy"),
          sum(dec38(col("prev")) * dec38(col("c"))).as("sxy"),
          sum(dec38(col("prev")) * dec38(col("prev"))).as("sxx"),
          sum(dec38(col("c")) * dec38(col("c"))).as("syy"))
      val num = dec38(col("n_pairs")) * col("sxy") - dec38(col("sx")) * dec38(col("sy"))
      val den1 = dec38(col("n_pairs")) * col("sxx") - dec38(col("sx")) * dec38(col("sx"))
      val den2 = dec38(col("n_pairs")) * col("syy") - dec38(col("sy")) * dec38(col("sy"))
      g.withColumn("num", num).withColumn("den1", den1).withColumn("den2", den2)
        .filter(col("den1") > 0 && col("den2") > 0)
        .select(col("segment"), col("n_pairs"),
          (col("num").cast("double") /
            (sqrt(col("den1").cast("double")) * sqrt(col("den2").cast("double"))))
            .as("lag1_corr"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
          o_orderkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM orders),
      l AS (SELECT o_custkey, c,
          lag(c) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev
        FROM o),
      p AS (SELECT c_mktsegment AS segment, prev, c
        FROM l JOIN customer ON o_custkey = c_custkey
        WHERE prev IS NOT NULL),
      g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(SUM(prev) AS HUGEINT) AS sx, CAST(SUM(c) AS HUGEINT) AS sy,
          CAST(SUM(CAST(prev AS HUGEINT) * c) AS HUGEINT) AS sxy,
          CAST(SUM(CAST(prev AS HUGEINT) * prev) AS HUGEINT) AS sxx,
          CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS syy
        FROM p GROUP BY segment),
      f AS (SELECT segment, n_pairs,
          CAST(n_pairs AS HUGEINT) * sxy - sx * sy AS num,
          CAST(n_pairs AS HUGEINT) * sxx - sx * sx AS den1,
          CAST(n_pairs AS HUGEINT) * syy - sy * sy AS den2
        FROM g)
      SELECT segment, n_pairs,
        CAST(num AS DOUBLE) / (sqrt(CAST(den1 AS DOUBLE))
          * sqrt(CAST(den2 AS DOUBLE))) AS lag1_corr
      FROM f WHERE den1 > 0 AND den2 > 0
      ORDER BY segment"""),
    covers = Seq("STAT-serial-corr"))

  // ------------------------------------------------- duplicate locality
  // Are near-duplicates ingestion-neighbors or corpus-wide? q22's
  // verified pairs bucketed by doc-id distance, with micro-averaged
  // Jaccard per bucket as Σcommon/Σunion — exact integer sums, never
  // a mean of per-pair doubles. Shard-local dedup only works if the
  // mass sits in the near buckets; this query measures that.
  private val q417 = QueryDef(
    "q417_dup_locality",
    (s, dir) => {
      // session-cached copy of q22's verified-pairs pipeline (the
      // oracle re-derives it independently from documents)
      val pairs = GraphGateSource.cached(s, "q22-pairs:" + dir)(
        graft.SparkEntry.queries("q22_ngram_jaccard")(s, dir))
      val b = pairs
        .withColumn("dist", col("doc_b") - col("doc_a"))
        .withColumn("bucket",
          when(col("dist") <= 1L, "1_adjacent")
            .when(col("dist") <= 10L, "2_near")
            .when(col("dist") <= 100L, "3_mid")
            .otherwise("4_far"))
      // total pairs via a window over the 4-bucket aggregate — a
      // second b.agg() pass would re-run the whole shingle join
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      b.groupBy("bucket")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("common")).as("s_common"),
          sum(col("na") + col("nb") - col("common")).as("s_union"))
        .withColumn("np", sum(col("n_pairs")).over(wAll))
        .select(col("bucket"), col("n_pairs"),
          (col("n_pairs").cast("double") / col("np").cast("double"))
            .as("pair_share"),
          (col("s_common").cast("double") / col("s_union").cast("double"))
            .as("micro_jaccard"))
        .orderBy("bucket")
    },
    Some("""WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk
          FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
             FROM toksrc WHERE len(tk) >= 3),
      sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM sh GROUP BY 1),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(COUNT(*) AS BIGINT) AS common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b, common, sa.n AS na, sb.n AS nb
        FROM p0
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.4),
      b AS (SELECT CASE WHEN doc_b - doc_a <= 1 THEN '1_adjacent'
               WHEN doc_b - doc_a <= 10 THEN '2_near'
               WHEN doc_b - doc_a <= 100 THEN '3_mid'
               ELSE '4_far' END AS bucket, common, na, nb
        FROM pairs),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM b)
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(COUNT(*) AS DOUBLE) / CAST(MIN(np) AS DOUBLE) AS pair_share,
        CAST(SUM(common) AS DOUBLE)
          / CAST(SUM(na + nb - common) AS DOUBLE) AS micro_jaccard
      FROM b, tot GROUP BY bucket ORDER BY bucket"""),
    covers = Seq("DEDUP-locality"))

  // ------------------------------------------------- charm pricing
  // Price-ending census over the catalog: .99 / .00 / .50 endings vs
  // everything else, with each ending's catalog share and exact mean
  // price — the "psychological pricing" audit that complements
  // q407's per-brand ladder. Pure modular arithmetic.
  private val q418 = QueryDef(
    "q418_charm_pricing",
    (s, dir) => {
      val p = t(s, dir, "part")
        .select((col("p_retailprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("c"))
        .withColumn("ending",
          when(col("c") % 100L === 99L, "charm_99")
            .when(col("c") % 100L === 0L, "round_00")
            .when(col("c") % 100L === 50L, "half_50")
            .otherwise("other"))
      val tot = p.agg(count(lit(1)).as("np"))
      p.groupBy("ending")
        .agg(count(lit(1)).as("n_parts"), sum(col("c")).as("sc"),
          min(col("c")).as("min_cents"), max(col("c")).as("max_cents"))
        .crossJoin(broadcast(tot))
        .select(col("ending"), col("n_parts"),
          (col("n_parts").cast("double") / col("np").cast("double"))
            .as("catalog_share"),
          (col("sc").cast("double") / col("n_parts").cast("double"))
            .as("mean_cents"),
          col("min_cents"), col("max_cents"))
        .orderBy("ending")
    },
    Some("""WITH p AS (SELECT
          CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        FROM part),
      e AS (SELECT c, CASE WHEN c % 100 = 99 THEN 'charm_99'
               WHEN c % 100 = 0 THEN 'round_00'
               WHEN c % 100 = 50 THEN 'half_50'
               ELSE 'other' END AS ending
        FROM p),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM e)
      SELECT ending, CAST(COUNT(*) AS BIGINT) AS n_parts,
        CAST(COUNT(*) AS DOUBLE) / CAST(MIN(np) AS DOUBLE) AS catalog_share,
        CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_cents,
        MIN(c) AS min_cents, MAX(c) AS max_cents
      FROM e, tot GROUP BY ending ORDER BY ending"""),
    covers = Seq("A-charm-pricing"))

  val all: Seq[QueryDef] =
    Seq(q414, q415, q416, q417, q418)
}
