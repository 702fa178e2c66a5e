package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-72 gate additions (q379–q383): graph centrality, threshold
  * tuning, growth series, quality funnels, and gap spectra.
  */
object Round72Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- harmonic centrality
  // 2-hop-truncated harmonic centrality h(v) = n₁(v) + n₂(v)/2 on the
  // co-purchase graph, for a DETERMINISTIC 2% probe set (partkey % 50
  // = 0). Both bounds are load-bearing at scale: a dense co-purchase
  // graph reaches nearly every node within 3 hops, so an unrestricted
  // deeper frontier degenerates to all-pairs (measured 400+ s at
  // sf0.1); probing from a fixed slice keeps every frontier join
  // probe×degree-sized while the edge set stays complete. Top-20
  // probe hubs.
  private val q379 = QueryDef(
    "q379_harmonic_centrality",
    (s, dir) => {
      // the DIRECTED distinct co-purchase edges (u ≠ v) are both
      // orientations of the shared undirected (u < v) cache — the
      // orientations are disjoint, so the union stays distinct; the
      // cache's checkpoint is the materialize-once the 2-hop join and
      // the except both need
      val cw = GraphGateSource.copurchaseW(s, dir)
      val e = cw.select(col("u"), col("v"))
        .unionAll(cw.select(col("v").as("u"), col("u").as("v")))
      val h1 = e.filter(col("u") % 50 === 0)
      // EXCEPT h1 ≡ left_anti on (u, v) here (both sides already
      // distinct), and h1 is probe-bounded → broadcast the anti side
      // instead of shuffling the full 2-hop set through a set-op
      val h2 = h1.as("x").join(e.as("y"), col("x.v") === col("y.u"))
        .select(col("x.u").as("u"), col("y.v").as("v"))
        .filter(col("u") =!= col("v")).distinct()
        .join(broadcast(h1), Seq("u", "v"), "left_anti")
      val c1 = h1.groupBy("u").agg(count(lit(1)).as("n1"))
      val c2 = h2.groupBy("u").agg(count(lit(1)).as("n2"))
      c1.join(c2, Seq("u"), "left")
        .withColumn("n2", coalesce(col("n2"), lit(0L)))
        .select(col("u").as("part"), col("n1"), col("n2"),
          (col("n1").cast("double") +
            col("n2").cast("double") / lit(2.0d)).as("harmonic"))
        .orderBy(desc("harmonic"), asc("part")).limit(20)
    },
    Some("""WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
          FROM lineitem),
      e AS (SELECT DISTINCT a.p AS u, b.p AS v
            FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p),
      h1 AS (SELECT u, v FROM e WHERE u % 50 = 0),
      h2 AS (SELECT DISTINCT x.u, y.v FROM h1 x JOIN e y ON x.v = y.u
             WHERE x.u <> y.v
             EXCEPT SELECT u, v FROM h1),
      c1 AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS n1 FROM h1 GROUP BY u),
      c2 AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS n2 FROM h2 GROUP BY u)
      SELECT c1.u AS part, n1, COALESCE(n2, 0) AS n2,
        CAST(n1 AS DOUBLE) + CAST(COALESCE(n2, 0) AS DOUBLE)
          / CAST(2 AS DOUBLE) AS harmonic
      FROM c1 LEFT JOIN c2 ON c1.u = c2.u
      ORDER BY harmonic DESC, part LIMIT 20"""),
    covers = Seq("GRAPH-harmonic"))

  // ------------------------------------------------- jaccard histogram
  // Threshold-tuning curve for the q22 dedup join: ALL shingle-
  // sharing candidate pairs bucketed by Jaccard decile — how many
  // pairs each threshold choice would admit. The exact-integer bucket
  // is (10·common) DIV union, so no double ever decides a boundary.
  private val q380 = QueryDef(
    "q380_jaccard_histogram",
    (s, dir) => {
      // session-cached distinct (doc_id, shingle) postings — q105's
      // containment scan shares the same frame; q22/q23 still build
      // their own (their bench timings stay honest)
      val sh = GraphGateSource.cached(s, "shingle-distinct:" + dir)(
        t(s, dir, "documents").select(col("doc_id"),
          explode(graft.functions.WordShingles(s, col("text"), 3))
            .as("s")).distinct())
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val common = sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("common"))
      // SHUFFLE_HASH pins the hash build to the O(docs) sizes side —
      // the co-shingle pair frame's cardinality is join-output (badly
      // estimated); a misestimated broadcast of the PAIR side is the
      // q105 sf1 driver-collect abort class (round-9 audit)
      common
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na"))
          .hint("shuffle_hash"), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb"))
          .hint("shuffle_hash"), Seq("doc_b"))
        .withColumn("bucket",
          expr("(10 * common) DIV (na + nb - common)"))
        .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
        .orderBy("bucket")
    },
    Some("""WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk
          FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
             FROM toksrc WHERE len(tk) >= 3),
      sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh
                GROUP BY doc_id),
      common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS common
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2)
      SELECT (10 * common) // (sa.n + sb.n - common) AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM common
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      GROUP BY bucket
      ORDER BY bucket"""),
    covers = Seq("DD-threshold-curve"))

  // ------------------------------------------------- MoM growth
  // Month-over-month revenue growth: exact DECIMAL monthly revenue,
  // growth = (m − prev)/prev only when the previous CALENDAR month
  // exists (a lag over a gappy series would silently compare across
  // holes). One window over the month order.
  private val q381 = QueryDef(
    "q381_mom_growth",
    (s, dir) => {
      val monthly = t(s, dir, "orders")
        .groupBy(date_trunc("month", to_date(col("o_orderdate")))
          .cast("date").as("month"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DecimalType(38, 2)).as("rev"),
          count(lit(1)).as("n_orders"))
      val w = Window.orderBy("month")
      monthly
        .withColumn("prev_rev", lag(col("rev"), 1).over(w))
        .withColumn("prev_m", lag(col("month"), 1).over(w))
        .select(col("month"), col("n_orders"),
          col("rev").cast("double").as("revenue"),
          when(col("prev_m") === add_months(col("month"), -1),
            (col("rev") - col("prev_rev")).cast("double") /
              col("prev_rev").cast("double"))
            .otherwise(lit(null)).as("mom_growth"))
        .orderBy("month")
    },
    Some("""WITH monthly AS (SELECT
          CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
            AS month,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS rev,
          CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY month),
      l AS (SELECT month, n_orders, rev,
          lag(rev) OVER (ORDER BY month) AS prev_rev,
          lag(month) OVER (ORDER BY month) AS prev_m
        FROM monthly)
      SELECT month, n_orders, CAST(rev AS DOUBLE) AS revenue,
        CASE WHEN prev_m = month - INTERVAL 1 MONTH
          THEN CAST(rev - prev_rev AS DOUBLE) / CAST(prev_rev AS DOUBLE)
        END AS mom_growth
      FROM l ORDER BY month"""),
    covers = Seq("TS-mom-growth"))

  // ------------------------------------------------- quality funnel
  // The quality-filter funnel as a 2³ census: short (<100 chars),
  // high digit density (>10% of chars), low lexical diversity
  // (distinct tokens ≤ half of tokens) — every flag combination with
  // its doc count. Digit counts come from length-difference after
  // regexp_replace; all exact integers.
  private val q382 = QueryDef(
    "q382_quality_flag_funnel",
    (s, dir) => {
      val toks = split(col("text"), " ")
      val d = t(s, dir, "documents").select(
        (col("n_chars") < 100).as("too_short"),
        ((length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", "")))
          * 10 > length(col("text"))).as("digit_heavy"),
        (size(array_distinct(toks)) * 2 <= size(toks)).as("low_diversity"))
      val tot = d.count()
      d.groupBy("too_short", "digit_heavy", "low_diversity")
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("share",
          col("n_docs").cast("double") / lit(tot.toDouble))
        .orderBy("too_short", "digit_heavy", "low_diversity")
    },
    Some("""WITH d AS (SELECT
          n_chars < 100 AS too_short,
          (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
            * 10 > length(text) AS digit_heavy,
          len(list_distinct(string_split(text, ' '))) * 2
            <= len(string_split(text, ' ')) AS low_diversity
        FROM documents),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM d)
      SELECT too_short, digit_heavy, low_diversity,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(COUNT(*) AS DOUBLE) / CAST(MIN(t) AS DOUBLE) AS share
      FROM d, tot
      GROUP BY too_short, digit_heavy, low_diversity
      ORDER BY too_short, digit_heavy, low_diversity"""),
    covers = Seq("TXT-quality-funnel"))

  // ------------------------------------------------- reorder gap spectrum
  // The spectrum of customer reorder gaps in weekly buckets (gap DIV
  // 7): how much reordering is same-week vs monthly vs dormant —
  // q320's cadence means, spread into the full distribution.
  private val q383 = QueryDef(
    "q383_reorder_gap_spectrum",
    (s, dir) => {
      val o = t(s, dir, "orders").select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"), col("o_orderkey"))
      val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
      val gaps = o.withColumn("gap",
        datediff(col("d"), lag(col("d"), 1).over(w)).cast(LongType))
        .filter(col("gap").isNotNull)
        .withColumn("week_bucket", expr("gap DIV 7"))
      val tot = gaps.count()
      gaps.groupBy("week_bucket")
        .agg(count(lit(1)).as("n_gaps"))
        .withColumn("share", col("n_gaps").cast("double") / lit(tot.toDouble))
        .orderBy("week_bucket")
    },
    Some("""WITH g AS (SELECT
          CAST(CAST(o_orderdate AS DATE)
            - lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS BIGINT)
            AS gap
        FROM orders),
      f AS (SELECT gap // 7 AS week_bucket FROM g WHERE gap IS NOT NULL),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM f)
      SELECT week_bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        CAST(COUNT(*) AS DOUBLE) / CAST(MIN(t) AS DOUBLE) AS share
      FROM f, tot
      GROUP BY week_bucket
      ORDER BY week_bucket"""),
    covers = Seq("W-gap-spectrum"))

  val all: Seq[QueryDef] =
    Seq(q379, q380, q381, q382, q383)
}
