package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.dedup.PrefixFilterJoin

/** Round-4 gate additions (q140+): distribution window functions,
  * prefix-filtered exact similarity join, deterministic stratified
  * splits, key-skew diagnostics.
  *
  * Determinism rules as everywhere (QueryDef scaladoc): doubles from
  * exact integer counts through ONE shared IEEE tree, BIGINT casts on
  * the DuckDB side, total ORDER BY.
  */
object Round5Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Session-cached DISTINCT customer→supplier edge frame — q151
    * PageRank and q152 BFS share it. Node ids are parity-tagged
    * LONGS (customer k → 2k, supplier k → 2k+1), not the oracle's
    * 'c…'/'s…' strings: every iteration joins and shuffles on the
    * node key, and long keys hash/compare without per-row string
    * traffic. PageRank is integer fixed-point (order-independent),
    * so the encoding is bit-neutral — the gates decode back to the
    * exact oracle strings at output ([[decodeNode]]).
    */
  private def custSuppEdges(s: SparkSession, dir: String): DataFrame =
    GraphGateSource.cached(s, "cust-supp:" + dir)(
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct())

  /** Long node id → the oracle's string id ('c<k>' / 's<k>'). */
  private def decodeNode(node: Column): Column =
    when(node % 2 === 0, concat(lit("c"), (node / 2).cast(LongType)))
      .otherwise(concat(lit("s"), ((node - 1) / 2).cast(LongType)))

  // ---------------------------------------- distribution window functions
  // ntile / percent_rank / cume_dist — the distribution tail of the
  // window surface (q61 gates the navigation tail). The window is
  // computed over the FULL partition and only the output is
  // decimated, so the gate exercises real partition-wide state.
  // percent_rank = (rank-1)/(n-1) and cume_dist = peers/n are single
  // int/int double divisions — bit-identical across engines; ntile is
  // INT in Spark, BIGINT in DuckDB → cast Spark side.
  private val q140 = QueryDef(
    "q140_dist_windows",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .filter(col("o_orderkey") % 50 === 0)
        .orderBy("o_orderpriority", "o_orderkey")
    },
    Some("""SELECT * FROM (
        SELECT o_orderpriority, o_orderkey,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          percent_rank() OVER w AS pr,
          cume_dist() OVER w AS cd
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey))
      WHERE o_orderkey % 50 = 0
      ORDER BY o_orderpriority, o_orderkey"""),
    covers = Seq("W-distribution"))

  // ------------------------------------- prefix-filtered similarity join
  // Exact shingle-Jaccard ≥ 0.8 self-join through
  // dedup/PrefixFilterJoin: candidates come only from short
  // rare-shingle prefixes (the PPJoin pruning), then exact
  // verification. The oracle is the O(n²) brute-force join —
  // hash-equality proves the pruning loses NO pairs while indexing
  // ~1/5 of the shingles (at sf0.1: 119k candidate pairs where the
  // full posting join touches 1.13M). Trigram shingles, not words:
  // this corpus has a 31-word vocabulary, so word sets carry no
  // rarity signal, while the shingle vocabulary is combinatorial.
  private val q141 = QueryDef(
    "q141_prefix_filter_join",
    (s, dir) =>
      PrefixFilterJoin
        .shingleSelfJoin(t(s, dir, "documents"), "doc_id", "text", 3, 4, 5)
        .orderBy("a_id", "b_id"),
    Some("""WITH tok AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(len(string_split(text,' ')) - 1, 1)),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
               || ' ' || string_split(text,' ')[i+2]))) AS tk
        FROM documents),
      sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) n FROM tok GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id a_id, b.doc_id b_id, CAST(count(*) AS BIGINT) shared
        FROM tok a JOIN tok b ON a.tk = b.tk AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT a_id, b_id, shared,
        CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
      FROM pairs JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
      WHERE shared * 18 >= (sa.n + sb.n) * 8
      ORDER BY a_id, b_id"""),
    covers = Seq("T-dedup-prefix", "J2"))

  // ------------------------------------------- deterministic stratified split
  // Hash-stratified train/val/test split (~80/10/10 on the first md5
  // byte) — the reproducible split every training pipeline needs:
  // membership depends only on the key, so re-runs, late data, and
  // distributed execution all land rows in the same bucket. Gate
  // checks per-(class, split) counts and mass.
  private val q142 = QueryDef(
    "q142_stratified_split",
    (s, dir) => {
      val h = substring(md5(col("o_orderkey").cast("string")), 1, 2)
      t(s, dir, "orders")
        .withColumn("split",
          when(h < "cc", "train").when(h < "e6", "val").otherwise("test"))
        .groupBy("o_orderpriority", "split")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("mass"))
        .orderBy("o_orderpriority", "split")
    },
    Some("""WITH s AS (
        SELECT o_orderpriority, o_totalprice, CASE
          WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
          WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
          ELSE 'test' END AS split
        FROM orders)
      SELECT o_orderpriority, split, CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS mass
      FROM s GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("SAMPLE-stratified"))

  // ------------------------------------------------- key-skew diagnostics
  // Hot-key detector — per-key cardinality, share of total, and skew
  // factor (share × #keys; 1.0 = perfectly uniform). This is the
  // measurement step that decides WHEN operators/SkewJoin's salting
  // is worth its extra shuffle: at 100 TB you profile key skew on a
  // sample before picking the join strategy, not after the straggler
  // task appears. Shares are single divisions of exact counts.
  private val q143 = QueryDef(
    "q143_skew_stats",
    (s, dir) => {
      val k = t(s, dir, "lineitem").groupBy("l_suppkey").agg(count(lit(1)).as("c"))
      val tot = k.agg(sum("c").as("t"), count(lit(1)).as("nk"))
      k.crossJoin(broadcast(tot))
        .select(col("l_suppkey"), col("c"),
          (col("c").cast("double") / col("t")).as("share"),
          (col("c").cast("double") * col("nk") / col("t")).as("skew_factor"))
        .orderBy(col("c").desc, col("l_suppkey"))
        .limit(10)
    },
    Some("""WITH k AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) c FROM lineitem GROUP BY 1),
      tot AS (SELECT CAST(sum(c) AS BIGINT) t, CAST(count(*) AS BIGINT) nk FROM k)
      SELECT l_suppkey, c,
        CAST(c AS DOUBLE) / t AS share,
        CAST(c AS DOUBLE) * nk / t AS skew_factor
      FROM k, tot
      ORDER BY c DESC, l_suppkey LIMIT 10"""),
    covers = Seq("QA-skew"))

  // Shared scaffold for the robust-statistics gates: per-priority
  // value rank (unique tiebreak) + partition size + exact DECIMAL
  // value, one window pass.
  private def ranked(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy(col("o_totalprice"), col("o_orderkey"))
    val wp = Window.partitionBy("o_orderpriority")
    t(s, dir, "orders").select(
      col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
      col("o_totalprice").cast("decimal(18,2)").as("x"),
      row_number().over(w).as("i"),
      count(lit(1)).over(wp).as("n"),
      sum(col("o_totalprice").cast("decimal(18,2)")).over(w).as("cum"),
      sum(col("o_totalprice").cast("decimal(18,2)")).over(wp).as("tot"))
  }

  // ------------------------------------------------------ weighted median
  // Mass-weighted median: the smallest value whose cumulative DECIMAL
  // mass reaches half the stratum total (2·cum ≥ tot — exact decimal
  // comparison, no float midpoint). The robust location statistic a
  // quality pipeline uses where outliers make the mean useless; one
  // window pass + one aggregate.
  private val q144 = QueryDef(
    "q144_weighted_median",
    (s, dir) =>
      ranked(s, dir)
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy("o_orderpriority")
        .agg(min(col("o_totalprice")).as("weighted_median"))
        .orderBy("o_orderpriority"),
    Some("""WITH w AS (
        SELECT o_orderpriority, o_totalprice,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) cum,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_orderpriority) tot
        FROM orders)
      SELECT o_orderpriority, min(o_totalprice) AS weighted_median
      FROM w WHERE 2 * cum >= tot GROUP BY 1 ORDER BY 1"""),
    covers = Seq("A-robust"))

  // ---------------------------------------------------- Gini concentration
  // Gini coefficient per stratum from the sorted-rank identity
  // Σ(2i−n−1)·xᵢ / (n·Σxᵢ): the numerator is an exact DECIMAL sum
  // (rank weights are integers), so the single final division is the
  // only float op — bit-identical across engines. The inequality
  // measure behind "is this source dominated by a few giant
  // documents" curation checks (q69/q143 measure the count side;
  // this measures mass concentration).
  private val q145 = QueryDef(
    "q145_gini",
    (s, dir) =>
      ranked(s, dir)
        .groupBy("o_orderpriority", "n")
        .agg((sum((col("i") * 2 - col("n") - 1) * col("x")).cast("double") /
          (col("n") * sum(col("x")).cast("double"))).as("gini"))
        .select("o_orderpriority", "gini")
        .orderBy("o_orderpriority"),
    Some("""WITH r AS (
        SELECT o_orderpriority,
          CAST(o_totalprice AS DECIMAL(18,2)) x,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) i,
          count(*) OVER (PARTITION BY o_orderpriority) n
        FROM orders)
      SELECT o_orderpriority,
        CAST(SUM((2*i - n - 1) * x) AS DOUBLE) / (CAST(n AS BIGINT) * CAST(SUM(x) AS DOUBLE)) AS gini
      FROM r GROUP BY o_orderpriority, n ORDER BY 1"""),
    covers = Seq("A-robust"))

  // -------------------------------------------------------- winsorization
  // Outlier clipping at exact P1/P99 order statistics — k = ceil(p·n)
  // in integer arithmetic (interpolating percentiles are only
  // cross-engine-exact at dyadic fractions, order statistics always
  // are). Reports the clip bounds, how many rows hit each side, and
  // the winsorized mass; the standard tail-taming step before
  // training on heavy-tailed quality scores.
  private val q146 = QueryDef(
    "q146_winsorize",
    (s, dir) => {
      val r = ranked(s, dir)
      val b = r.groupBy(col("o_orderpriority").as("p"))
        .agg(
          max(when(col("i") === expr("(n + 99) DIV 100"), col("x"))).as("lo"),
          max(when(col("i") === expr("(99 * n + 99) DIV 100"), col("x"))).as("hi"))
      r.join(broadcast(b), col("o_orderpriority") === col("p"))
        .groupBy("o_orderpriority")
        .agg(
          max(col("lo")).cast("double").as("lo"),
          max(col("hi")).cast("double").as("hi"),
          sum(when(col("x") < col("lo"), 1).otherwise(0)).as("n_lo"),
          sum(when(col("x") > col("hi"), 1).otherwise(0)).as("n_hi"),
          sum(greatest(col("lo"), least(col("hi"), col("x")))).cast("double").as("winsorized_mass"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH r AS (
        SELECT o_orderpriority,
          CAST(o_totalprice AS DECIMAL(18,2)) x,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) i,
          count(*) OVER (PARTITION BY o_orderpriority) n
        FROM orders),
      b AS (
        SELECT o_orderpriority,
          MAX(CASE WHEN i = (n + 99) // 100 THEN x END) lo,
          MAX(CASE WHEN i = (99*n + 99) // 100 THEN x END) hi
        FROM r GROUP BY 1)
      SELECT r.o_orderpriority,
        CAST(MAX(lo) AS DOUBLE) lo, CAST(MAX(hi) AS DOUBLE) hi,
        CAST(SUM(CASE WHEN x < lo THEN 1 ELSE 0 END) AS BIGINT) n_lo,
        CAST(SUM(CASE WHEN x > hi THEN 1 ELSE 0 END) AS BIGINT) n_hi,
        -- DuckDB GREATEST/LEAST promote DECIMAL to DOUBLE; the cast
        -- back to DECIMAL(18,2) restores the exact clamped value so
        -- the sum stays exact like Spark's decimal sum
        CAST(SUM(CAST(GREATEST(lo, LEAST(hi, x)) AS DECIMAL(18,2))) AS DOUBLE) winsorized_mass
      FROM r JOIN b USING (o_orderpriority)
      GROUP BY 1 ORDER BY 1"""),
    covers = Seq("A-robust", "P10"))

  // ---------------------------------------------------------- phrase search
  // Positional phrase matching — the retrieval primitive shingle
  // membership can't provide (it finds docs, not positions): 1-based
  // token positions via posexplode, adjacency checked against the
  // carried array. Occurrence counts and first hit position per doc.
  private val q147 = QueryDef(
    "q147_phrase_search",
    (s, dir) => {
      val d = t(s, dir, "documents").select(col("doc_id"), split(col("text"), " ").as("tk"))
      d.select(col("doc_id"), col("tk"), posexplode(col("tk")))
        .withColumn("p", col("pos") + 1)
        .filter(col("p") <= size(col("tk")) - 2 &&
          concat_ws(" ", col("col"),
            element_at(col("tk"), col("p") + 1),
            element_at(col("tk"), col("p") + 2)) === "slow hash batch")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"), min(col("p")).cast(LongType).as("first_pos"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (SELECT doc_id, string_split(text,' ') tk FROM documents),
      pos AS (SELECT doc_id, unnest(range(1, greatest(len(tk)-1, 1))) AS p, tk FROM tok),
      hits AS (
        SELECT doc_id, p FROM pos
        WHERE tk[p]||' '||tk[p+1]||' '||tk[p+2] = 'slow hash batch')
      SELECT doc_id, CAST(count(*) AS BIGINT) n_hits, CAST(min(p) AS BIGINT) first_pos
      FROM hits GROUP BY 1 ORDER BY 1"""),
    covers = Seq("TXT-phrase"))

  // ------------------------------------------------ quantized tf-idf retrieval
  // Multi-term document retrieval ranked by integer-QUANTIZED tf·idf
  // (idf as (N·10⁶) DIV df): float idf sums are order-dependent
  // across partitions, integer scores are exact under any execution —
  // the quantization trick reproducible search engines actually use.
  // Query terms join before df (broadcast both tiny sides), so the
  // corpus-wide term table is touched once.
  private val q148 = QueryDef(
    "q148_retrieval",
    (s, dir) => {
      val tf = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val n = t(s, dir, "documents").agg(count(lit(1)).as("n"))
      val q = s.createDataFrame(Seq(Tuple1("hash"), Tuple1("batch"), Tuple1("sort")))
        .toDF("w")
      tf.join(broadcast(q), "w").join(df, "w").crossJoin(broadcast(n))
        .groupBy("doc_id")
        .agg(sum(col("tf") * expr("(n * 1000000) DIV df")).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) w FROM documents),
      tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) tf FROM tok GROUP BY 1,2),
      df AS (SELECT w, CAST(count(*) AS BIGINT) df FROM tf GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) n FROM documents),
      q AS (SELECT unnest(['hash','batch','sort']) w)
      SELECT tf.doc_id, CAST(SUM(tf.tf * ((n.n * 1000000) // df.df)) AS BIGINT) score
      FROM tf JOIN q USING (w) JOIN df USING (w) CROSS JOIN n
      GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 10"""),
    covers = Seq("TXT-retrieval"))

  // ------------------------------------------------------- interval merge
  // Union of overlapping intervals (30-min activity windows per
  // user): the classic coverage question — how many distinct
  // episodes, how much wall-clock covered — solved with the
  // cumulative-max island trick in exact microsecond integers. One
  // shuffle on the partition key; no self-join.
  private val q149 = QueryDef(
    "q149_interval_merge",
    (s, dir) => {
      val wOrd = Window.partitionBy("user_id").orderBy("st", "en")
      val iv = t(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("st"),
        (unix_micros(col("ts")) + 1800L * 1000000L).as("en"))
      iv.withColumn("new_island",
          when(col("st") > max(col("en")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, -1)), 1).otherwise(0))
        .withColumn("island", sum(col("new_island")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "island")
        .agg(min(col("st")).as("s"), max(col("en")).as("e"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_episodes"), sum(col("e") - col("s")).as("tot_us"))
        .select(col("user_id"), col("n_episodes"),
          expr("tot_us DIV 1000000").as("covered_s"))
        .orderBy("user_id")
    },
    Some("""WITH iv AS (
        SELECT user_id, epoch_us(ts) s, epoch_us(ts) + 1800 * 1000000 e FROM events),
      m AS (
        SELECT user_id, s, e,
          CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) THEN 1 ELSE 0 END AS new_island
        FROM iv),
      g AS (
        SELECT user_id, s, e,
          SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM m),
      isl AS (SELECT user_id, island, min(s) st, max(e) en FROM g GROUP BY 1, 2)
      SELECT user_id, CAST(count(*) AS BIGINT) n_episodes,
        CAST(SUM(en - st) // 1000000 AS BIGINT) covered_s
      FROM isl GROUP BY 1 ORDER BY 1"""),
    covers = Seq("W-islands", "P6"))

  // -------------------------------------------------- median absolute deviation
  // MAD — the robust scale companion to q144/q146: lower-median order
  // statistic (k = ceil(n/2), integer arith — interpolation-free) of
  // x, then the same order statistic of |x − med|. Two window passes,
  // both decimal-exact; doubles only at the final projection.
  private val q150 = QueryDef(
    "q150_mad",
    (s, dir) => {
      val r = ranked(s, dir)
      val med = r.groupBy(col("o_orderpriority").as("p"))
        .agg(max(when(col("i") === expr("(n + 1) DIV 2"), col("x"))).as("med"))
      val wDev = Window.partitionBy("o_orderpriority").orderBy(abs(col("x") - col("med")), col("i"))
      r.join(broadcast(med), col("o_orderpriority") === col("p"))
        .withColumn("j", row_number().over(wDev))
        .groupBy("o_orderpriority")
        .agg(max(col("med")).cast("double").as("med"),
          max(when(col("j") === expr("(n + 1) DIV 2"),
            abs(col("x") - col("med")))).cast("double").as("mad"))
        .orderBy("o_orderpriority")
    },
    Some("""WITH r AS (
        SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) x,
          row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) i,
          count(*) OVER (PARTITION BY o_orderpriority) n
        FROM orders),
      med AS (SELECT o_orderpriority, MAX(CASE WHEN i = (n+1)//2 THEN x END) med
              FROM r GROUP BY 1),
      d AS (
        SELECT r.o_orderpriority, ABS(x - med) dev, med, n,
          row_number() OVER (PARTITION BY r.o_orderpriority ORDER BY ABS(x - med), i) j
        FROM r JOIN med USING (o_orderpriority))
      SELECT o_orderpriority,
        CAST(MAX(med) AS DOUBLE) med,
        CAST(MAX(CASE WHEN j = (n+1)//2 THEN dev END) AS DOUBLE) mad
      FROM d GROUP BY 1 ORDER BY 1"""),
    covers = Seq("A-robust"))

  // ------------------------------------------------------------- PageRank
  // Two fixed-point PageRank iterations over the bidirected
  // customer↔supplier trade graph (operators/PageRank): integer
  // fixed-point arithmetic makes iterative link analysis exact under
  // any partitioning — the oracle re-implements both iterations as
  // chained CTEs and must hash-match bit for bit. Per iteration: one
  // edges⋈ranks equi-join + one aggregation, the formulation that
  // scales with |E|.
  private val q151 = QueryDef(
    "q151_pagerank",
    (s, dir) => {
      // session-scoped shared customer-supplier edge cache: both
      // unionAll branches, PageRank's iterations, q152's BFS, and all
      // bench executions read the ONE checkpointed distinct build
      val e0 = custSuppEdges(s, dir)
      val edges = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.PageRank.ranks(edges, iters = 2)
        .select(decodeNode(col("node")).as("node"), col("r").as("rank_fp"))
        .orderBy(col("rank_fp").desc, col("node"))
        .limit(20)
    },
    Some("""WITH e0 AS (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) src,
                        's' || CAST(l_suppkey AS VARCHAR) dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      nodes AS (SELECT DISTINCT src AS node FROM (
        SELECT src FROM edges UNION ALL SELECT dst FROM edges)),
      deg AS (SELECT src, CAST(count(*) AS BIGINT) outdeg FROM edges GROUP BY 1),
      n AS (SELECT CAST(count(*) AS BIGINT) n FROM nodes),
      i1 AS (
        SELECT nodes.node,
          ((15 * (1000000000000 // n.n)) // 100)
          + (85 * COALESCE(c.contrib, 0)) // 100 AS r
        FROM nodes CROSS JOIN n
        LEFT JOIN (
          SELECT e.dst AS node, CAST(SUM((1000000000000 // n.n) // d.outdeg) AS BIGINT) contrib
          FROM edges e JOIN deg d ON e.src = d.src CROSS JOIN n
          GROUP BY 1) c ON nodes.node = c.node),
      i2 AS (
        SELECT nodes.node,
          ((15 * (1000000000000 // n.n)) // 100)
          + (85 * COALESCE(c.contrib, 0)) // 100 AS r
        FROM nodes CROSS JOIN n
        LEFT JOIN (
          SELECT e.dst AS node, CAST(SUM(i1.r // d.outdeg) AS BIGINT) contrib
          FROM edges e JOIN i1 ON e.src = i1.node JOIN deg d ON e.src = d.src
          GROUP BY 1) c ON nodes.node = c.node)
      SELECT node, CAST(r AS BIGINT) rank_fp FROM i2
      ORDER BY r DESC, node LIMIT 20"""),
    covers = Seq("G-pagerank"))

  // ------------------------------------------------------------ bounded BFS
  // Two-hop breadth-first reach from seed customers over the same
  // trade graph (operators/Bfs): per hop one edges⋈distances join +
  // min-agg, distances exact integers. Output is the reach histogram
  // (how many nodes first reached at each hop).
  private val q152 = QueryDef(
    "q152_bfs_reach",
    (s, dir) => {
      val e0 = custSuppEdges(s, dir)
      val edges = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, dir, "orders").filter(col("o_custkey") % 100 === 0)
        .select((col("o_custkey") * 2).as("node"))
      graft.operators.Bfs.distances(edges, seeds, maxHops = 2)
        .groupBy("dist").agg(count(lit(1)).as("n_nodes"))
        .orderBy("dist")
    },
    Some("""WITH e0 AS (
        SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) src,
                        's' || CAST(l_suppkey AS VARCHAR) dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      d0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) node, 0 AS dist
             FROM orders WHERE o_custkey % 100 = 0),
      d1 AS (
        SELECT node, CAST(min(dist) AS BIGINT) dist FROM (
          SELECT node, dist FROM d0
          UNION ALL
          SELECT e.dst AS node, d0.dist + 1 FROM edges e JOIN d0 ON e.src = d0.node)
        GROUP BY 1),
      d2 AS (
        SELECT node, CAST(min(dist) AS BIGINT) dist FROM (
          SELECT node, dist FROM d1
          UNION ALL
          SELECT e.dst AS node, d1.dist + 1 FROM edges e JOIN d1 ON e.src = d1.node)
        GROUP BY 1)
      SELECT dist, CAST(count(*) AS BIGINT) n_nodes FROM d2
      GROUP BY 1 ORDER BY 1"""),
    covers = Seq("G-bfs"))

  def all: Seq[QueryDef] =
    Seq(q140, q141, q142, q143, q144, q145, q146, q147, q148, q149, q150, q151, q152)
}
