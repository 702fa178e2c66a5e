package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.functions.Kmv

/** Round-82 gate additions (q427–q431): sketch difference algebra and
  * accuracy curves, dup-graph transitivity, customer band migration,
  * and basket variety.
  */
object Round82Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- KMV difference
  // Exclusive audience per event-type pair, |A\B| and |B\A| by theta
  // algebra on the q424 sketches — "how many users does type A have
  // that B never sees". Deterministic like the rest of the KMV
  // surface; exact set differences ride along for calibration.
  private val q427 = QueryDef(
    "q427_kmv_difference",
    (s, dir) => {
      val K = 64
      val e = t(s, dir, "events")
      val sk = e.groupBy("event_type")
        .agg(Kmv.sketch(s, Kmv.hash60(col("user_id")), K).as("sk"))
      val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"))
      val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"))
      val tu = e.select(col("event_type"), col("user_id")).distinct()
      val cnt = tu.groupBy("event_type").agg(count(lit(1)).as("n"))
      val shared = tu.select(col("event_type").as("type_a"), col("user_id"))
        .join(tu.select(col("event_type").as("type_b"), col("user_id")),
          Seq("user_id"))
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n_shared"))
      a.join(b, col("type_a") < col("type_b"))
        .join(broadcast(cnt.select(col("event_type").as("type_a"),
          col("n").as("na"))), Seq("type_a"))
        .join(broadcast(cnt.select(col("event_type").as("type_b"),
          col("n").as("nb"))), Seq("type_b"))
        .join(broadcast(shared), Seq("type_a", "type_b"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        .select(col("type_a"), col("type_b"),
          (col("na") - col("n_shared")).as("a_only_exact"),
          (col("nb") - col("n_shared")).as("b_only_exact"),
          Kmv.differenceEstimate(col("ska"), col("skb"), K)
            .as("a_only_est"),
          Kmv.differenceEstimate(col("skb"), col("ska"), K)
            .as("b_only_est"))
        .orderBy("type_a", "type_b")
    },
    Some("""WITH h AS (SELECT DISTINCT event_type,
          CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
            AS BIGINT) AS hv
        FROM events),
      r AS (SELECT event_type, hv,
          row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        FROM h),
      sk AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m,
          MAX(CASE WHEN rn = 64 THEN hv END) AS hk
        FROM r WHERE rn <= 64 GROUP BY event_type),
      mins AS (SELECT event_type, hv FROM r WHERE rn <= 64),
      th AS (SELECT event_type,
          CASE WHEN m < 64 THEN CAST(1152921504606846976 AS DOUBLE)
               ELSE CAST(hk AS DOUBLE) END AS theta
        FROM sk),
      tu AS (SELECT DISTINCT event_type, user_id FROM events),
      cnt AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM tu GROUP BY event_type),
      shared AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM tu a JOIN tu b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2),
      pairs AS (SELECT ta.event_type AS type_a, tb.event_type AS type_b,
          LEAST(ta.theta, tb.theta) AS theta
        FROM th ta JOIN th tb ON ta.event_type < tb.event_type),
      aonly AS (SELECT p.type_a, p.type_b,
          CAST(COUNT(ma.hv) FILTER (WHERE mb.hv IS NULL
            AND CAST(ma.hv AS DOUBLE) < p.theta) AS BIGINT) AS n_a
        FROM pairs p
        JOIN mins ma ON ma.event_type = p.type_a
        LEFT JOIN mins mb ON mb.event_type = p.type_b AND mb.hv = ma.hv
        GROUP BY 1, 2),
      bonly AS (SELECT p.type_a, p.type_b,
          CAST(COUNT(mb.hv) FILTER (WHERE ma.hv IS NULL
            AND CAST(mb.hv AS DOUBLE) < p.theta) AS BIGINT) AS n_b
        FROM pairs p
        JOIN mins mb ON mb.event_type = p.type_b
        LEFT JOIN mins ma ON ma.event_type = p.type_a AND ma.hv = mb.hv
        GROUP BY 1, 2)
      SELECT p.type_a, p.type_b,
        ca.n - COALESCE(s.n_shared, 0) AS a_only_exact,
        cb.n - COALESCE(s.n_shared, 0) AS b_only_exact,
        CAST(ao.n_a AS DOUBLE) * 1152921504606846976 / p.theta
          AS a_only_est,
        CAST(bo.n_b AS DOUBLE) * 1152921504606846976 / p.theta
          AS b_only_est
      FROM pairs p
      JOIN cnt ca ON ca.event_type = p.type_a
      JOIN cnt cb ON cb.event_type = p.type_b
      LEFT JOIN shared s ON s.type_a = p.type_a AND s.type_b = p.type_b
      JOIN aonly ao ON ao.type_a = p.type_a AND ao.type_b = p.type_b
      JOIN bonly bo ON bo.type_a = p.type_a AND bo.type_b = p.type_b
      ORDER BY p.type_a, p.type_b"""),
    covers = Seq("SKETCH-kmv-difference"))

  // ------------------------------------------------- dup transitivity
  // Is near-duplication transitive at the q22 threshold? For every
  // wedge (a~b, b~c) in the verified pair graph, does (a~c) also
  // hold — the closure rate that decides whether cluster-level dedup
  // (q71) over-merges. Pure joins over the (small) verified pair set.
  private val q428 = QueryDef(
    "q428_dup_transitivity",
    (s, dir) => {
      // the pair set appears THREE times in the plan (both wedge
      // sides + the closing probe) — materialize the expensive
      // shingle-join output once
      // session-cached copy of q22's verified-pairs pipeline (the
      // oracle re-derives it independently from documents)
      val pairs = GraphGateSource.cached(s, "q22-pairs:" + dir)(
        graft.SparkEntry.queries("q22_ngram_jaccard")(s, dir))
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
      val und = pairs
        .unionByName(pairs.select(col("doc_b").as("doc_a"),
          col("doc_a").as("doc_b")))
      val wedge = und.as("e1").join(und.as("e2"),
          col("e1.doc_b") === col("e2.doc_a"))
        .filter(col("e1.doc_a") < col("e2.doc_b"))
        .select(col("e1.doc_a").as("a"), col("e1.doc_b").as("b"),
          col("e2.doc_b").as("c"))
      val closed = wedge.join(pairs,
          col("a") === col("doc_a") && col("c") === col("doc_b"),
          "left")
        .select(col("a"), col("b"), col("c"),
          col("doc_a").isNotNull.cast(LongType).as("is_closed"))
      closed.agg(count(lit(1)).as("n_wedges"),
          sum(col("is_closed")).as("n_closed"))
        .select(col("n_wedges"), col("n_closed"),
          (col("n_closed").cast("double") / col("n_wedges").cast("double"))
            .as("closure_rate"))
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
      pairs AS (SELECT doc_a, doc_b FROM p0
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.4),
      und AS (SELECT doc_a, doc_b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
      wedge AS (SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
        FROM und e1 JOIN und e2 ON e1.doc_b = e2.doc_a
        WHERE e1.doc_a < e2.doc_b),
      closed AS (SELECT w.a, w.b, w.c,
          CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_closed
        FROM wedge w LEFT JOIN pairs p
          ON w.a = p.doc_a AND w.c = p.doc_b)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_wedges,
        CAST(SUM(is_closed) AS BIGINT) AS n_closed,
        CAST(SUM(is_closed) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS closure_rate
      FROM closed"""),
    covers = Seq("DEDUP-transitivity"))

  // ------------------------------------------------- band migration
  // Customer value-band Markov matrix: each customer's spend quintile
  // this year vs next year (unique (spend, custkey) ntile order), the
  // full 5×5 migration census behind "do mid-tier customers move up
  // or churn". q396 classified first-vs-last direction; this is the
  // complete transition structure.
  private val q429 = QueryDef(
    "q429_value_band_migration",
    (s, dir) => {
      val cy = t(s, dir, "orders")
        .groupBy(col("o_custkey"),
          year(to_date(col("o_orderdate"))).cast(LongType).as("yr"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType)).as("spend"))
      val w = Window.partitionBy("yr").orderBy("spend", "o_custkey")
      val banded = cy.withColumn("band", ntile(5).over(w).cast(LongType))
      val nxt = banded.select(col("o_custkey"),
        (col("yr") - 1L).as("yr"), col("band").as("band_next"))
      banded.join(nxt, Seq("o_custkey", "yr"))
        .groupBy("band", "band_next")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("band", "band_next")
    },
    Some("""WITH cy AS (SELECT o_custkey,
          CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS spend
        FROM orders GROUP BY 1, 2),
      banded AS (SELECT o_custkey, yr,
          CAST(ntile(5) OVER (PARTITION BY yr ORDER BY spend, o_custkey)
            AS BIGINT) AS band
        FROM cy)
      SELECT a.band, b.band AS band_next,
        CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM banded a JOIN banded b
        ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
      GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("A-band-migration"))

  // ------------------------------------------------- KMV accuracy curve
  // The sketch's memory-accuracy dial, measured: distinct-user
  // estimates at k = 16/32/64/128 against the exact count — the
  // tuning table an operator reads before spending 8·k bytes per
  // group at 100 TB. One sketch at the largest k serves every
  // smaller k (its prefix IS the smaller sketch).
  private val q430 = QueryDef(
    "q430_kmv_accuracy_curve",
    (s, dir) => {
      val e = t(s, dir, "events")
      val sk = e.agg(
        Kmv.sketch(s, Kmv.hash60(col("user_id")), 128).as("sk"),
        countDistinct(col("user_id")).as("n_exact"))
      val ks = Seq(16, 32, 64, 128)
      val rows = ks.map(k => struct(lit(k.toLong).as("k"),
        Kmv.estimate(slice(col("sk"), 1, k), k).as("n_est")))
      sk.select(col("n_exact"), explode(array(rows: _*)).as("p"))
        .select(col("p.k"), col("n_exact"), col("p.n_est"))
        .withColumn("rel_err",
          abs(col("n_est") - col("n_exact").cast("double"))
            / col("n_exact").cast("double"))
        .orderBy("k")
    },
    Some("""WITH h AS (SELECT DISTINCT
          CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
            AS BIGINT) AS hv
        FROM events),
      r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM h),
      ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events),
      ks AS (SELECT CAST(unnest([16, 32, 64, 128]) AS BIGINT) AS k),
      sk AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS m,
          MAX(CASE WHEN rn = k THEN hv END) AS hk
        FROM r, ks WHERE rn <= k GROUP BY k),
      est AS (SELECT k, n_exact,
          CASE WHEN m < k THEN CAST(m AS DOUBLE)
               ELSE CAST(k - 1 AS DOUBLE) * 1152921504606846976
                 / CAST(hk AS DOUBLE) END AS n_est
        FROM sk, ex)
      SELECT k, n_exact, n_est,
        abs(n_est - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)
          AS rel_err
      FROM est ORDER BY k"""),
    covers = Seq("SKETCH-kmv-tuning"))

  // ------------------------------------------------- basket variety
  // Joint census of basket SIZE vs basket VARIETY: order line count ×
  // distinct brand count, with mean order value per cell — separates
  // "7 lines of one brand" from "7 brands" (q345 only measured
  // depth). Exact DECIMAL value sums; cells bounded by 7×7.
  private val q431 = QueryDef(
    "q431_basket_variety",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
      // pre-aggregate per (order, brand): the distinct-brand count
      // becomes a plain count and the Expand that duplicated every
      // fact row disappears — measured one decade up (same-JVM A/B,
      // sf1: 3.22 s vs 1.50 s; sf0.1 already a small win)
      val perOrder = li.groupBy("l_orderkey", "p_brand")
        .agg(count(lit(1)).as("nl"),
          sum((col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType)).as("v"))
        .groupBy("l_orderkey")
        .agg(sum(col("nl")).as("n_lines"),
          count(lit(1)).as("n_brands"),
          sum(col("v")).as("val_c"))
      perOrder.groupBy("n_lines", "n_brands")
        .agg(count(lit(1)).as("n_orders"), sum(col("val_c")).as("sv"))
        .select(col("n_lines"), col("n_brands"), col("n_orders"),
          (col("sv").cast("double") / col("n_orders").cast("double"))
            .as("mean_order_cents"))
        .orderBy("n_lines", "n_brands")
    },
    Some("""WITH po AS (SELECT l_orderkey,
          CAST(COUNT(*) AS BIGINT) AS n_lines,
          CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
            AS BIGINT)) AS BIGINT) AS val_c
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY l_orderkey)
      SELECT n_lines, n_brands, CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(SUM(val_c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS mean_order_cents
      FROM po GROUP BY 1, 2 ORDER BY n_lines, n_brands"""),
    covers = Seq("A-basket-variety"))

  val all: Seq[QueryDef] =
    Seq(q427, q428, q429, q430, q431)
}
