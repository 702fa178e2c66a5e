package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-90 gate additions (q467–q471): classical ML inside the
  * engine, every step exactly gated — Lloyd k-means (2 unrolled
  * iterations, integer-lattice distances), multinomial naive Bayes
  * (likelihood products folded in pinned token order), the Markov
  * stationary distribution (8 power steps, ordered folds), embedding
  * anisotropy (λ₁/trace), and two-feature OLS by Cramer determinants
  * over exact moments. The recurring trick: floats only ever come
  * from identical expression trees or identically-ordered folds, so
  * iterative ML hash-matches a SQL oracle.
  */
object Round90Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Q = 1048576L

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  private def vdOf(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d"),
        floor(col("x").cast("double") * lit(Q.toDouble))
          .cast(LongType).as("q"))

  private val vdSql: String =
    """vd AS MATERIALIZED (SELECT vec_id, dd.i - 1 AS d,
        CAST(floor(CAST(embedding[dd.i] AS DOUBLE) * 1048576.0)
          AS BIGINT) AS q
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) dd)"""

  // ------------------------------------------------- k-means Lloyd
  // Two Lloyd iterations from deterministic seeds (vectors 0–3):
  // round 1 assigns on exact integer lattice distances; the updated
  // centroids stay RATIONAL (S_md, n_m), so round-2 distances are
  // the exact numerators Σ(n·q−S)² over n² — compared as identical
  // doubles. Per-cluster inertia keeps a common denominator, so it
  // is one division despite summing member distances. Assignment is
  // map-side against broadcast centroids; the update is one groupBy
  // — the textbook distributed k-means shape.
  private val q467 = QueryDef(
    "q467_kmeans_lloyd",
    (s, dir) => {
      val vd = vdOf(s, dir).localCheckpoint()
      val c0 = vd.filter(col("vec_id") < 4)
        .select(col("vec_id").as("m"), col("d"), col("q").as("c"))
      val d1 = vd.join(broadcast(c0), Seq("d"))
        .groupBy("vec_id", "m")
        .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("d2"))
      val w1 = Window.partitionBy("vec_id").orderBy(col("d2"), col("m"))
      val a1 = d1.withColumn("rn", row_number().over(w1))
        .filter(col("rn") === 1).select("vec_id", "m")
      val cent1 = vd.join(a1, Seq("vec_id"))
        .groupBy("m", "d")
        .agg(sum("q").as("sm"), count(lit(1)).as("nm"))
        .localCheckpoint()
      val d2 = vd.join(broadcast(cent1), Seq("d"))
        .withColumn("term",
          dec38(col("nm") * col("q") - col("sm")) *
            dec38(col("nm") * col("q") - col("sm")))
        .groupBy("vec_id", "m", "nm")
        .agg(sum("term").as("num"))
        .withColumn("dist2",
          col("num").cast("double") /
            (col("nm") * col("nm")).cast("double"))
      val w2 = Window.partitionBy("vec_id").orderBy(col("dist2"), col("m"))
      val a2 = d2.withColumn("rn", row_number().over(w2))
        .filter(col("rn") === 1)
      val shift = cent1.join(broadcast(c0), Seq("m", "d"))
        .withColumn("sterm",
          dec38(col("sm") - col("nm") * col("c")) *
            dec38(col("sm") - col("nm") * col("c")))
        .groupBy("m")
        .agg(sum("sterm").as("snum"), max("nm").as("nm0"))
        .select(col("m"),
          (sqrt(col("snum").cast("double")) /
            (col("nm0").cast("double") * lit(Q.toDouble))).as("shift"))
      a2.groupBy("m", "nm")
        .agg(count(lit(1)).as("n_members"), sum("num").as("inum"))
        .join(shift, Seq("m"))
        .select(col("m").cast(LongType).as("cluster"), col("n_members"),
          (col("inum").cast("double") /
            ((col("nm") * col("nm")).cast("double") *
              lit((Q * Q).toDouble))).as("inertia"),
          col("shift"))
        .orderBy("cluster")
    },
    Some(s"""WITH $vdSql,
      c0 AS MATERIALIZED (SELECT vec_id AS m, d, q AS c FROM vd
        WHERE vec_id < 4),
      d1 AS MATERIALIZED (SELECT v.vec_id, c.m,
          CAST(SUM((v.q - c.c) * (v.q - c.c)) AS BIGINT) AS d2
        FROM vd v JOIN c0 c ON c.d = v.d GROUP BY 1, 2),
      a1 AS MATERIALIZED (SELECT vec_id, m FROM (SELECT vec_id, m,
          row_number() OVER (PARTITION BY vec_id ORDER BY d2, m) AS rn
        FROM d1) WHERE rn = 1),
      cent1 AS MATERIALIZED (SELECT a.m, v.d,
          CAST(SUM(v.q) AS BIGINT) AS sm,
          CAST(COUNT(*) AS BIGINT) AS nm
        FROM vd v JOIN a1 a ON a.vec_id = v.vec_id GROUP BY 1, 2),
      d2x AS MATERIALIZED (SELECT v.vec_id, c.m, c.nm,
          SUM(CAST(c.nm * v.q - c.sm AS HUGEINT) *
              CAST(c.nm * v.q - c.sm AS HUGEINT)) AS num
        FROM vd v JOIN cent1 c ON c.d = v.d GROUP BY 1, 2, 3),
      d2d AS (SELECT vec_id, m, nm, num,
          CAST(num AS DOUBLE) / CAST(nm * nm AS DOUBLE) AS dist2
        FROM d2x),
      a2 AS MATERIALIZED (SELECT vec_id, m, nm, num FROM (SELECT
          vec_id, m, nm, num,
          row_number() OVER (PARTITION BY vec_id ORDER BY dist2, m)
            AS rn
        FROM d2d) WHERE rn = 1),
      shift AS (SELECT c.m,
          sqrt(CAST(SUM(CAST(c.sm - c.nm * z.c AS HUGEINT) *
            CAST(c.sm - c.nm * z.c AS HUGEINT)) AS DOUBLE)) /
          (CAST(MAX(c.nm) AS DOUBLE) * 1048576.0) AS shift
        FROM cent1 c JOIN c0 z ON z.m = c.m AND z.d = c.d
        GROUP BY c.m)
      SELECT CAST(a.m AS BIGINT) AS cluster,
        CAST(COUNT(*) AS BIGINT) AS n_members,
        CAST(SUM(a.num) AS DOUBLE) /
          (CAST(a.nm * a.nm AS DOUBLE) *
            (1048576.0 * 1048576.0)) AS inertia,
        MAX(s.shift) AS shift
      FROM a2 a JOIN shift s ON s.m = a.m
      GROUP BY a.m, a.nm ORDER BY cluster"""),
    covers = Seq("ML-kmeans-lloyd"))

  // ------------------------------------------------- naive Bayes
  // Multinomial naive Bayes language ID with Laplace smoothing,
  // trained on even doc_ids and evaluated on odd ones, reported as
  // the confusion matrix. The per-class likelihood is a PRODUCT of
  // per-token doubles — folded in token-position order on both
  // engines (aggregate HOF with prior init ≡ list_reduce over a
  // prior-prepended ordered list), so scores are bit-identical and
  // the argmax agrees. Unseen tokens smooth to 1/(tot+V).
  private val q468 = QueryDef(
    "q468_naive_bayes_lang",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      // materialized once: three independent broadcast builds (counts,
      // tots, vocab) each re-ran the train-half explode — broadcast
      // sides are separate jobs, so exchange reuse never applies
      val tokTrain = docs.filter(col("doc_id") % 2 === 0)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .localCheckpoint()
      val counts = tokTrain.groupBy(col("lang").as("l"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val tots = tokTrain.groupBy(col("lang").as("l"))
        .agg(count(lit(1)).as("tot"))
      val vocab = tokTrain.select("tok").distinct()
        .agg(count(lit(1)).as("v"))
      val priors = docs.filter(col("doc_id") % 2 === 0)
        .groupBy(col("lang").as("l")).agg(count(lit(1)).as("nd"))
      val nTrain = docs.filter(col("doc_id") % 2 === 0)
        .agg(count(lit(1)).as("ndocs"))
      val test = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang").as("true_lang"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      val scored = test
        .crossJoin(broadcast(tots))
        .join(broadcast(counts), Seq("l", "tok"), "left")
        .crossJoin(broadcast(vocab))
        .withColumn("p",
          (coalesce(col("c"), lit(0L)).cast("double") + lit(1.0)) /
            (col("tot") + col("v")).cast("double"))
        .groupBy("doc_id", "true_lang", "l")
        .agg(sort_array(collect_list(struct(col("pos"), col("p"))))
          .as("ps"))
        .join(broadcast(priors), Seq("l"))
        .crossJoin(broadcast(nTrain))
        .withColumn("score",
          aggregate(col("ps"),
            col("nd").cast("double") / col("ndocs").cast("double"),
            (acc, e) => acc * e.getField("p")))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("l"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("true_lang"), col("l").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy("true_lang", "pred_lang")
    },
    Some("""WITH tok_train AS (SELECT lang,
          unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % 2 = 0),
      counts AS MATERIALIZED (SELECT lang AS l, tok,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM tok_train GROUP BY 1, 2),
      tots AS (SELECT lang AS l, CAST(COUNT(*) AS BIGINT) AS tot
        FROM tok_train GROUP BY 1),
      vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
        FROM tok_train),
      priors AS (SELECT lang AS l, CAST(COUNT(*) AS BIGINT) AS nd
        FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
      n_train AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndocs
        FROM documents WHERE doc_id % 2 = 0),
      test AS (SELECT doc_id, lang AS true_lang,
          generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
          unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % 2 = 1),
      scored AS MATERIALIZED (SELECT t.doc_id, t.true_lang, tt.l,
          list_reduce(
            list_prepend(CAST(p.nd AS DOUBLE) / CAST(nt.ndocs AS DOUBLE),
              list((CAST(COALESCE(c.c, 0) AS DOUBLE) + 1.0) /
                CAST(tt.tot + vb.v AS DOUBLE) ORDER BY t.pos)),
            (a, b) -> a * b) AS score
        FROM test t
        CROSS JOIN tots tt
        LEFT JOIN counts c ON c.l = tt.l AND c.tok = t.tok
        CROSS JOIN vocab vb
        JOIN priors p ON p.l = tt.l
        CROSS JOIN n_train nt
        GROUP BY t.doc_id, t.true_lang, tt.l, p.nd, nt.ndocs,
          tt.tot, vb.v)
      SELECT true_lang, l AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT doc_id, true_lang, l,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, l) AS rn
        FROM scored)
      WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("ML-naive-bayes"))

  // ------------------------------------------------- stationary dist
  // Stationary distribution of the event-type Markov chain: exact
  // transition probabilities (int/int divisions on the dense
  // states×states grid), then 8 steps of vP with the matvec folded
  // in from-state order on both engines. Reported against the
  // empirical state share — the "where does the process settle vs
  // where is it now" gap.
  private val q469 = QueryDef(
    "q469_markov_stationary",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val trans = ev.withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("fr"), col("nxt").as("to"))
        .agg(count(lit(1)).as("c"))
      // bounded-collect: distinct event types — a small fixed enum
      val states = ev.select(col("event_type").as("st")).distinct()
        .orderBy("st").collect().map(_.getString(0))
      val idx = states.zipWithIndex.toMap
      val rowTot = trans.groupBy("fr").agg(sum("c").as("rt"))
      val pCells = trans.join(rowTot, Seq("fr"))
        .select(col("fr"), col("to"),
          (col("c").cast("double") / col("rt").cast("double")).as("p"))
        // bounded-collect: states x states transition cells — O(enum²)
        .collect()
      val k = states.length
      val pm = Array.ofDim[Double](k, k)
      pCells.foreach(r =>
        pm(idx(r.getString(0)))(idx(r.getString(1))) = r.getDouble(2))
      var v = Array.fill(k)(1.0 / k)
      for (_ <- 1 to 8)
        v = Array.tabulate(k)(j =>
          (0 until k).map(i => v(i) * pm(i)(j)).reduceLeft(_ + _))
      val emp = ev.groupBy(col("event_type").as("st"))
        .agg(count(lit(1)).as("n"))
        .crossJoin(ev.agg(count(lit(1)).as("nt")))
        .select(col("st"),
          (col("n").cast("double") / col("nt").cast("double"))
            .as("empirical_share"))
      import s.implicits._
      val statDf = states.zip(v).toSeq.toDF("st", "stationary_prob")
      statDf.join(emp, Seq("st"))
        .select(col("st").as("event_type"), col("stationary_prob"),
          col("empirical_share"))
        .orderBy("event_type")
    },
    Some {
      val iters = (1 to 8).map { kk =>
        s"""v$kk AS MATERIALIZED (SELECT p.to_s AS st,
          list_reduce(list(v.v * p.p ORDER BY p.fr_s),
            (a, b) -> a + b) AS v
        FROM pmat p JOIN v${kk - 1} v ON v.st = p.fr_s
        GROUP BY p.to_s)"""
      }.mkString(",\n      ")
      s"""WITH ev AS (SELECT user_id, event_type, ts, event_id
        FROM events),
      trans AS (SELECT event_type AS fr,
          lead(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS t_o
        FROM ev),
      tc AS (SELECT fr, t_o, CAST(COUNT(*) AS BIGINT) AS c
        FROM trans WHERE t_o IS NOT NULL GROUP BY 1, 2),
      states AS (SELECT DISTINCT event_type AS st FROM ev),
      rt AS (SELECT fr, CAST(SUM(c) AS BIGINT) AS rt FROM tc
        GROUP BY fr),
      pmat AS MATERIALIZED (SELECT a.st AS fr_s, b.st AS to_s,
          COALESCE(CAST(tc.c AS DOUBLE) / CAST(rt.rt AS DOUBLE), 0.0)
            AS p
        FROM states a CROSS JOIN states b
        LEFT JOIN tc ON tc.fr = a.st AND tc.t_o = b.st
        LEFT JOIN rt ON rt.fr = a.st),
      nstates AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
      v0 AS (SELECT st, 1.0 / (SELECT CAST(k AS DOUBLE) FROM nstates)
          AS v FROM states),
      $iters,
      emp AS (SELECT event_type AS st, CAST(COUNT(*) AS BIGINT) AS n
        FROM ev GROUP BY 1),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM ev)
      SELECT v8.st AS event_type, v8.v AS stationary_prob,
        CAST(e.n AS DOUBLE) / CAST((SELECT nt FROM nt) AS DOUBLE)
          AS empirical_share
      FROM v8 JOIN emp e ON e.st = v8.st
      ORDER BY event_type"""
    },
    covers = Seq("ML-markov-stationary"))

  // ------------------------------------------------- anisotropy
  // Embedding-space anisotropy: the top principal value (q462's
  // 8-step power iteration, same pinned folds) over the exact trace
  // of the scaled covariance — the share of variance the dominant
  // direction hoards. The diagnostic behind "all my cosine scores
  // are 0.9": an anisotropic space needs whitening before
  // similarity search means anything.
  private val q470 = QueryDef(
    "q470_embedding_anisotropy",
    (s, dir) => {
      val vd = vdOf(s, dir).localCheckpoint()
      val pair = vd.as("a").join(vd.as("b"), Seq("vec_id"))
        .groupBy(col("a.d").as("i"), col("b.d").as("j"))
        .agg(sum(col("a.q") * col("b.q")).as("sij"), count(lit(1)).as("n"))
      val moments = vd.groupBy("d").agg(sum("q").as("sd"))
      val cells = pair
        .join(moments.select(col("d").as("i"), col("sd").as("si")), Seq("i"))
        .join(moments.select(col("d").as("j"), col("sd").as("sj")), Seq("j"))
        .select(col("i"), col("j"),
          (dec38(col("n")) * dec38(col("sij")) -
            dec38(col("si")) * dec38(col("sj"))).cast("double").as("cnum"))
        // bounded-collect: 64x64 covariance cells — O(dim²) model state
        .collect()
      val dDim = 64
      val cov = Array.ofDim[Double](dDim, dDim)
      cells.foreach(r => cov(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      var v = Array.fill(dDim)(0.125)
      var nrm = 0.0
      for (_ <- 1 to 8) {
        val w = Array.tabulate(dDim)(i =>
          (0 until dDim).map(j => cov(i)(j) * v(j)).reduceLeft(_ + _))
        nrm = math.sqrt(w.map(x => x * x).reduceLeft(_ + _))
        v = w.map(_ / nrm)
      }
      val trace = (0 until dDim).map(i => cov(i)(i)).reduceLeft(_ + _)
      import s.implicits._
      Seq((nrm, trace, nrm / trace))
        .toDF("lambda1", "trace", "anisotropy")
    },
    Some {
      val iters = (1 to 8).map { k =>
        s"""w$k AS MATERIALIZED (SELECT c.i,
          list_reduce(list(c.cnum * v.v ORDER BY c.j),
            (a, b) -> a + b) AS w
        FROM cells c JOIN v${k - 1} v ON v.i = c.j GROUP BY c.i),
      n$k AS MATERIALIZED (SELECT sqrt(list_reduce(
          list(w * w ORDER BY i), (a, b) -> a + b)) AS nrm FROM w$k),
      v$k AS MATERIALIZED (SELECT i,
          w / (SELECT nrm FROM n$k) AS v FROM w$k)"""
      }.mkString(",\n      ")
      s"""WITH $vdSql,
      pair AS MATERIALIZED (SELECT a.d AS i, b.d AS j,
          CAST(SUM(a.q * b.q) AS BIGINT) AS sij,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM vd a JOIN vd b ON b.vec_id = a.vec_id GROUP BY 1, 2),
      moments AS MATERIALIZED (SELECT d, CAST(SUM(q) AS BIGINT) AS sd
        FROM vd GROUP BY d),
      cells AS MATERIALIZED (SELECT p.i, p.j,
          CAST(CAST(p.n AS HUGEINT) * CAST(p.sij AS HUGEINT) -
            CAST(mi.sd AS HUGEINT) * CAST(mj.sd AS HUGEINT)
            AS DOUBLE) AS cnum
        FROM pair p JOIN moments mi ON mi.d = p.i
        JOIN moments mj ON mj.d = p.j),
      v0 AS (SELECT i, 0.125 AS v FROM (SELECT unnest(range(0, 64))
        AS i)),
      $iters,
      tr AS (SELECT list_reduce(list(cnum ORDER BY i), (a, b) -> a + b)
          AS trace
        FROM cells WHERE i = j)
      SELECT (SELECT nrm FROM n8) AS lambda1, tr.trace,
        (SELECT nrm FROM n8) / tr.trace AS anisotropy
      FROM tr"""
    },
    covers = Seq("LA-anisotropy"))

  // ------------------------------------------------- 2-feature OLS
  // Multiple regression by Cramer's rule: order value on (years
  // since 1995, urgent flag) per segment. All nine normal-equation
  // moments are exact integers; each 3×3 determinant is one
  // HUGEINT/DECIMAL(38,0) polynomial, and each coefficient is ONE
  // double division of two determinants — multivariate OLS with no
  // float accumulation anywhere.
  private val q471 = QueryDef(
    "q471_ols_two_features",
    (s, dir) => {
      val seg = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment").as("segment"))
      val o = t(s, dir, "orders").join(seg, Seq("o_custkey"))
        .select(col("segment"),
          (year(to_date(col("o_orderdate"))) - 1995).cast(LongType).as("x1"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("x2"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("y"))
      val m = o.groupBy("segment").agg(
        count(lit(1)).as("n"), sum("x1").as("s1"), sum("x2").as("s2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum("y").as("sy"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"))
      def det(a: Column, b: Column, c: Column,
              d: Column, e: Column, f: Column,
              g: Column, h: Column, i: Column): Column =
        dec38(a) * (dec38(e) * dec38(i) - dec38(f) * dec38(h)) -
          dec38(b) * (dec38(d) * dec38(i) - dec38(f) * dec38(g)) +
          dec38(c) * (dec38(d) * dec38(h) - dec38(e) * dec38(g))
      m.select(col("segment"), col("n"),
          det(col("n"), col("s1"), col("s2"),
            col("s1"), col("s11"), col("s12"),
            col("s2"), col("s12"), col("s22")).as("dd"),
          det(col("sy"), col("s1"), col("s2"),
            col("s1y"), col("s11"), col("s12"),
            col("s2y"), col("s12"), col("s22")).as("d0"),
          det(col("n"), col("sy"), col("s2"),
            col("s1"), col("s1y"), col("s12"),
            col("s2"), col("s2y"), col("s22")).as("d1"),
          det(col("n"), col("s1"), col("sy"),
            col("s1"), col("s11"), col("s1y"),
            col("s2"), col("s12"), col("s2y")).as("d2"))
        .select(col("segment"), col("n"),
          (col("d0").cast("double") / col("dd").cast("double"))
            .as("beta0_cents"),
          (col("d1").cast("double") / col("dd").cast("double"))
            .as("beta1_cents_per_year"),
          (col("d2").cast("double") / col("dd").cast("double"))
            .as("beta2_urgent_cents"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT c.c_mktsegment AS segment,
          CAST(year(CAST(o.o_orderdate AS DATE)) - 1995 AS BIGINT) AS x1,
          CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1
            ELSE 0 END AS x2,
          CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
      m AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
          CAST(SUM(x1 * x1) AS BIGINT) AS s11,
          CAST(SUM(x1 * x2) AS BIGINT) AS s12,
          CAST(SUM(x2 * x2) AS BIGINT) AS s22,
          CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(x1 * y) AS BIGINT) AS s1y,
          CAST(SUM(x2 * y) AS BIGINT) AS s2y
        FROM o GROUP BY segment),
      d AS (SELECT segment, n,
          CAST(n AS HUGEINT) * (CAST(s11 AS HUGEINT) * s22
              - CAST(s12 AS HUGEINT) * s12)
            - CAST(s1 AS HUGEINT) * (CAST(s1 AS HUGEINT) * s22
              - CAST(s12 AS HUGEINT) * s2)
            + CAST(s2 AS HUGEINT) * (CAST(s1 AS HUGEINT) * s12
              - CAST(s11 AS HUGEINT) * s2) AS dd,
          CAST(sy AS HUGEINT) * (CAST(s11 AS HUGEINT) * s22
              - CAST(s12 AS HUGEINT) * s12)
            - CAST(s1 AS HUGEINT) * (CAST(s1y AS HUGEINT) * s22
              - CAST(s12 AS HUGEINT) * s2y)
            + CAST(s2 AS HUGEINT) * (CAST(s1y AS HUGEINT) * s12
              - CAST(s11 AS HUGEINT) * s2y) AS d0,
          CAST(n AS HUGEINT) * (CAST(s1y AS HUGEINT) * s22
              - CAST(s12 AS HUGEINT) * s2y)
            - CAST(sy AS HUGEINT) * (CAST(s1 AS HUGEINT) * s22
              - CAST(s12 AS HUGEINT) * s2)
            + CAST(s2 AS HUGEINT) * (CAST(s1 AS HUGEINT) * s2y
              - CAST(s1y AS HUGEINT) * s2) AS d1,
          CAST(n AS HUGEINT) * (CAST(s11 AS HUGEINT) * s2y
              - CAST(s1y AS HUGEINT) * s12)
            - CAST(s1 AS HUGEINT) * (CAST(s1 AS HUGEINT) * s2y
              - CAST(s1y AS HUGEINT) * s2)
            + CAST(sy AS HUGEINT) * (CAST(s1 AS HUGEINT) * s12
              - CAST(s11 AS HUGEINT) * s2) AS d2
        FROM m)
      SELECT segment, n,
        CAST(d0 AS DOUBLE) / CAST(dd AS DOUBLE) AS beta0_cents,
        CAST(d1 AS DOUBLE) / CAST(dd AS DOUBLE)
          AS beta1_cents_per_year,
        CAST(d2 AS DOUBLE) / CAST(dd AS DOUBLE) AS beta2_urgent_cents
      FROM d ORDER BY segment"""),
    covers = Seq("ML-ols-two-features"))

  val all: Seq[QueryDef] = Seq(q467, q468, q469, q470, q471)
}
