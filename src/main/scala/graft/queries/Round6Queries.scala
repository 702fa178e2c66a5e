package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-5 gate additions (q153+): classic multi-way analytical join
  * shapes (the TPC-H Q3/Q5/Q18 patterns — the plans a 100 TB star
  * schema lives or dies on), corpus boilerplate removal and
  * duplicated-span diagnostics (the n-gram side of exact-substring
  * dedup), exact lexical-diversity scoring, and per-group equi-depth
  * histograms.
  *
  * Determinism rules as everywhere (QueryDef scaladoc): money math in
  * DECIMAL(18,2) so partial-agg order cannot change a bit, doubles
  * only from ONE shared IEEE tree, BIGINT casts on the DuckDB side,
  * total ORDER BY.
  */
object Round6Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact 2-decimal view of a money/quantity double (lossless: the
    * generator emits 2-decimal values).
    */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Distinct word-3-gram postings (doc_id, s) via the native
    * [[graft.functions.WordShingles]] expression.
    */
  private def shingles3(s: SparkSession, d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        explode(graft.functions.WordShingles(s, col("text"), 3)).as("s"))
      .distinct()

  private def shingles5(s: SparkSession, d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        explode(graft.functions.WordShingles(s, col("text"), 5)).as("s"))
      .distinct()

  /** DuckDB twins of the shingle postings as CTE bodies. */
  private val sh3Sql =
    """toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
              FROM toksrc WHERE len(tk) >= 3)"""
  private val sh5Sql =
    """toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, greatest(len(tk) - 3, 1)),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
                            tk[i+3] || ' ' || tk[i+4])) AS s
              FROM toksrc WHERE len(tk) >= 5)"""

  // --------------------------------------------------- TPC-H Q3 shape
  // Shipping-priority: selective dim filter (customer segment,
  // broadcast), two date range filters pushed into the fact scans,
  // one fact⋈fact equi-join (orders⋈lineitem on orderkey), top-10 by
  // revenue. THE canonical "filter early, broadcast the dim, shuffle
  // only the fact join" plan: at 100 TB the only wide exchange is
  // lineitem⋈orders on the join key, and both scans carry their date
  // predicate as a pushed parquet filter. Revenue sums are exact
  // DECIMAL(18,2)·(1−disc) products (scale 4), so partial aggregation
  // order cannot change a bit.
  private val q153 = QueryDef(
    "q153_tpch_q3",
    (s, dir) => {
      val cutoff = lit("1998-06-15").cast("timestamp")
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderdate,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-15'
        AND l_shipdate  > TIMESTAMP '1998-06-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""),
    covers = Seq("J1", "A4"))

  // --------------------------------------------------- TPC-H Q5 shape
  // Local-supplier volume: a 6-table snowflake join where region →
  // nation → {customer, supplier} are all broadcast dims and the only
  // shuffles are the fact-side equi-joins, plus the non-key predicate
  // c_nationkey = s_nationkey that makes the join "local". The shape
  // that proves multi-way join planning: every dim is broadcast, the
  // date filter is pushed into the orders scan, and the final group-by
  // is 25 nations wide.
  private val q154 = QueryDef(
    "q154_tpch_q5",
    (s, dir) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1998-01-01").cast("timestamp")
      val region = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      val nation = t(s, dir, "nation")
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val customer = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supplier = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val orders = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select("o_orderkey", "o_custkey")
      val lineitem = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },
    Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""),
    covers = Seq("J1", "A4"))

  // -------------------------------------------------- TPC-H Q18 shape
  // Large-volume customers: HAVING-filtered aggregate over the fact
  // (orders whose lineitems sum past a quantity threshold) joined back
  // to the order/customer detail. The aggregate-then-join pattern:
  // the group-by collapses lineitem to one row per order BEFORE any
  // join, so the join input is already small — at 100 TB the
  // alternative (join first, aggregate later) is strictly worse.
  private val q155 = QueryDef(
    "q155_tpch_q18",
    (s, dir) => {
      val l = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val big = l.groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 300)
      val o = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val c = t(s, dir, "customer").select("c_custkey", "c_name")
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM (SELECT l_orderkey,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300) big
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100"""),
    covers = Seq("A4", "SUBQ-having"))

  // --------------------------------------- boilerplate n-gram removal
  // CCNet-style boilerplate filtering at n-gram granularity: a word
  // 3-gram present in ≥5 distinct documents is boilerplate (nav bars,
  // cookie banners, license headers in a real crawl); each document
  // reports how much of it survives. The boilerplate set is tiny
  // relative to the corpus (151 of 16k shingles here), so the
  // membership join broadcasts — at 100 TB the corpus-wide frequency
  // pass is the only shuffle.
  private val q156 = QueryDef(
    "q156_boilerplate_rm",
    (s, dir) => {
      val sh = shingles3(s, t(s, dir, "documents"))
      val boiler = sh.groupBy("s").agg(count(lit(1)).as("nd"))
        .filter(col("nd") >= 5)
        .select(col("s"), lit(1).as("b"))
      sh.join(broadcast(boiler), Seq("s"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(coalesce(col("b"), lit(0))).as("n_boiler"))
        .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
          ((col("n_shingles") - col("n_boiler")).cast("double") / col("n_shingles"))
            .as("kept_frac"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $sh3Sql,
      boiler AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 5)
      SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_shingles,
        CAST(SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        CAST(COUNT(*) - SUM(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*) AS kept_frac
      FROM sh LEFT JOIN boiler b USING (s)
      GROUP BY doc_id ORDER BY doc_id"""),
    covers = Seq("TXT-boilerplate"))

  // ------------------------------------------- duplicated-span fraction
  // Exact-substring-dedup diagnostic (the Lee et al. "deduplicating
  // training data" signal at 5-gram granularity): per document, the
  // fraction of its distinct word 5-grams that also occur in some
  // OTHER document. Docs with a high shared-span fraction are copies
  // or templates; the fraction is exactly the integer ratio of two
  // distinct-counts, so the gate is hash-exact.
  private val q157 = QueryDef(
    "q157_dup_spans",
    (s, dir) => {
      val sh = shingles5(s, t(s, dir, "documents"))
      // a shingle is shared if its posting list has ≥2 docs; count per
      // doc how many of ITS shingles are shared. One aggregate over
      // the postings (carrying each shingle's doc count back to its
      // postings via a window avoids a second shuffle of the big side).
      val w = Window.partitionBy("s")
      sh.withColumn("nd", count(lit(1)).over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n5"),
          sum(when(col("nd") >= 2, 1).otherwise(0)).as("n_shared"))
        .select(col("doc_id"), col("n5"), col("n_shared"),
          (col("n_shared").cast("double") / col("n5")).as("dup_frac"))
        .orderBy("doc_id")
    },
    Some(s"""WITH $sh5Sql,
      counted AS (SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS nd FROM sh)
      SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n5,
        CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_frac
      FROM counted GROUP BY doc_id ORDER BY doc_id"""),
    covers = Seq("DEDUP-substring"))

  // --------------------------------------------- lexical diversity (exact)
  // Quality scoring without floats-in-aggregation: Simpson diversity
  // 1 − Σc²/n² and type-token ratio from exact integer token counts.
  // (Shannon entropy is the textbook form, but log2 differs by 1 ulp
  // between libm implementations — Simpson is the same signal as a
  // rational number, so the gate stays hash-exact. q97 covers the
  // repetition ratios; this is the distribution-concentration view.)
  private val q158 = QueryDef(
    "q158_lexical_diversity",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      tok.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") * col("c")).as("sum_c2"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          (lit(1.0) - col("sum_c2").cast("double") / (col("n_tokens") * col("n_tokens")))
            .as("simpson"),
          (col("n_distinct").cast("double") / col("n_tokens")).as("ttr"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      cnt AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2)
      SELECT doc_id,
        CAST(SUM(c) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) AS BIGINT) AS n_distinct,
        1.0 - CAST(SUM(c*c) AS DOUBLE) / (SUM(c) * SUM(c)) AS simpson,
        CAST(COUNT(*) AS DOUBLE) / SUM(c) AS ttr
      FROM cnt GROUP BY doc_id ORDER BY doc_id"""),
    covers = Seq("TXT-diversity"))

  // --------------------------------------------- equi-depth histogram
  // Per-group equi-depth (equal-count) buckets via partitioned ntile:
  // bucket boundaries adapt to the distribution (where equi-WIDTH q73
  // wastes bins on empty ranges). Partitioned by priority so every
  // window fits one executor's partition — the global-sort variant
  // would single-thread at scale (cf. SCALING.md); per-key histograms
  // are what a stats collector actually stores.
  private val q159 = QueryDef(
    "q159_equidepth_hist",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"),
          ntile(8).over(w).cast("long").as("bucket"))
        .groupBy("o_orderpriority", "bucket")
        .agg(count(lit(1)).as("n"),
          min(dec(col("o_totalprice"))).cast("double").as("lo"),
          max(dec(col("o_totalprice"))).cast("double").as("hi"))
        .orderBy("o_orderpriority", "bucket")
    },
    Some("""SELECT o_orderpriority, bucket,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS lo,
        CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS hi
      FROM (SELECT o_orderpriority, o_totalprice,
              ntile(8) OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice, o_orderkey) AS bucket
            FROM orders)
      GROUP BY o_orderpriority, bucket
      ORDER BY o_orderpriority, bucket"""),
    covers = Seq("A-histogram", "W-distribution"))

  // --------------------------------------- count-min heavy hitters
  // The frequency member of the engine's mergeable-sketch family
  // (Bloom: membership, HLL: distinct, MinHash: similarity — CMS:
  // counts): ONE pass builds the sketch (partials merge associatively
  // across partitions, so the build is shuffle-free until the final
  // combine), then the candidate terms probe it via the native
  // [[graft.functions.CmsEstimate]] expression. At 100 TB the exact
  // per-term count requires a full groupBy shuffle; the sketch answers
  // "how often does THIS term occur" from kilobytes of state. Exact
  // counts ride along so the gate enforces the estimate-vs-exact
  // contract IN the oracle: CMS never undercounts (cms_n ≥ exact_n,
  // structural) and overcounts by at most eps·N with the sketch's
  // confidence (N = total token count — exact, both engines compute
  // it). The sketch binary itself can't hash-match DuckDB, but these
  // two flags can, and the seed makes them deterministic; the
  // estimate column is replaced by the bound flags the oracle pins
  // to 1 (the raw estimate remains covered by CmsSketchSpec).
  private val q160 = QueryDef(
    "q160_cms_heavy_hitters",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
      val sketch = tok.agg(expr("count_min_sketch(w, 0.0001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("n_total"))
      val top = tok.groupBy("w").agg(count(lit(1)).as("exact_n"))
        .orderBy(desc("exact_n"), col("w")).limit(20)
      top.crossJoin(broadcast(sketch))
        .select(col("w"), col("exact_n"),
          graft.functions.CmsEstimate(s, col("sk"), col("w")).as("cms_n"),
          col("n_total"))
        .select(col("w"), col("exact_n"),
          (col("cms_n") >= col("exact_n")).cast("long").as("cms_ge_exact"),
          (col("cms_n").cast("double") <=
            col("exact_n") + col("n_total").cast("double") * 0.0001)
            .cast("long").as("cms_within_eps"))
        .orderBy(desc("exact_n"), col("w"))
    },
    Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
          FROM documents),
      top AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM tok GROUP BY w ORDER BY exact_n DESC, w LIMIT 20)
      SELECT w, exact_n,
        CAST(1 AS BIGINT) AS cms_ge_exact,
        CAST(1 AS BIGINT) AS cms_within_eps
      FROM top ORDER BY exact_n DESC, w"""),
    covers = Seq("SKETCH-cms"))

  // ------------------------------------------------- triangle counting
  // Triangle count over the part co-purchase graph (parts are adjacent
  // when some order contains both), using the degree-ordered
  // orientation: direct every undirected edge from the lower-degree
  // endpoint to the higher (ties by id), so each triangle is counted
  // EXACTLY once and — the scale insight — no wedge is ever generated
  // at a high-degree hub's out-side. Orientation caps out-degree at
  // O(√m), turning the naive Σdeg² wedge explosion (quadratic at a
  // celebrity node) into the optimal O(m^1.5) — the difference between
  // a web-scale graph finishing and one reducer dying. Two equi-joins
  // (wedge build + closing-edge check), everything else is integer
  // counts.
  private val q161 = QueryDef(
    "q161_triangle_count",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_partkey"))
      val e0 = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      val und = e0.unionAll(e0.select(col("v").as("u"), col("u").as("v")))
      // the shared degree-ordered orientation — the O(√m) out-degree
      // bound lives (and is spec-pinned) in DegreeOrientation
      val orient = graft.operators.DegreeOrientation.orient(und)
        .persist() // wedge build + closing-edge probe both read it
      val wedges = orient.as("a").join(orient.as("b"), col("a.v") === col("b.u"))
        .select(col("a.u").as("x"), col("a.v").as("y"), col("b.v").as("z"))
      val triangles = wedges.join(orient.as("c"),
        col("x") === col("c.u") && col("z") === col("c.v"))
      orient.agg(count(lit(1)).as("n_edges")).crossJoin(
          wedges.agg(count(lit(1)).as("n_wedges")))
        .crossJoin(triangles.agg(count(lit(1)).as("n_triangles")))
        .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
          (col("n_triangles").cast("double") / col("n_wedges")).as("closure_rate"))
    },
    Some("""WITH li AS (
        SELECT l_orderkey, l_partkey FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1999-01-01'
          AND l_shipdate <  TIMESTAMP '2000-01-01'),
      e0 AS (SELECT DISTINCT a.l_partkey u, b.l_partkey v
             FROM li a JOIN li b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      und AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
      orient AS (
        SELECT und.u, und.v FROM und
        JOIN deg du ON und.u = du.u
        JOIN deg dv ON und.v = dv.u
        WHERE du.d < dv.d OR (du.d = dv.d AND und.u < und.v)),
      wedges AS (
        SELECT a.u AS x, a.v AS y, b.v AS z
        FROM orient a JOIN orient b ON a.v = b.u),
      tri AS (
        SELECT 1 FROM wedges JOIN orient c ON x = c.u AND z = c.v)
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orient) AS n_edges,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles,
        CAST((SELECT COUNT(*) FROM tri) AS DOUBLE)
          / (SELECT COUNT(*) FROM wedges) AS closure_rate"""),
    covers = Seq("GRAPH-triangles"))

  val all: Seq[QueryDef] =
    Seq(q153, q154, q155, q156, q157, q158, q159, q160, q161)
}
