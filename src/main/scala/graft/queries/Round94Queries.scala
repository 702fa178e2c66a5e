package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Round-94 gate additions (q487–q491): information-retrieval
  * evaluation — MRR/hit@k over exact-lattice cosine rankings, hard-
  * negative margins, BLEU-lite precision on near-dup pairs,
  * farthest-point coreset selection (8 exact-integer stages), and
  * pseudo-relevance-feedback query expansion. Rankings compare
  * identical double trees; selections compare exact integers.
  */
object Round94Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Q = 1048576L

  private def vdOf(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("label"), col("d"),
        floor(col("x").cast("double") * lit(Q.toDouble))
          .cast(LongType).as("q"))

  private val vdSql: String =
    """vd AS MATERIALIZED (SELECT vec_id, CAST(label AS BIGINT) AS label,
        dd.i - 1 AS d,
        CAST(floor(CAST(embedding[dd.i] AS DOUBLE) * 1048576.0)
          AS BIGINT) AS q
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) dd)"""

  /** Cosine ranking of all candidates per query (vec_id < 100):
    * (qa, vb, label_q, label_b, cos, rnk).
    */
  /** Quantized-integer kNN scoring over the embedding table (queries
    * = vec_id < 100, exact integer dots, cos from exact integers) —
    * the shared input of q487/q488/q512, session-cached since every
    * value is integer-derived and bit-deterministic.
    */
  private[queries] def ranked(s: SparkSession, dir: String): DataFrame =
    GraphGateSource.cached(s, "knn-ranked:" + dir)(rankedBuild(s, dir))

  private def rankedBuild(s: SparkSession, dir: String): DataFrame = {
    val vd = vdOf(s, dir).localCheckpoint()
    val norms = vd.groupBy("vec_id")
      .agg(sum(col("q") * col("q")).as("n2"))
    val qv = vd.filter(col("vec_id") < 100)
    val dots = qv.as("a").join(vd.as("b"), Seq("d"))
      .filter(col("a.vec_id") =!= col("b.vec_id"))
      .groupBy(col("a.vec_id").as("qa"), col("a.label").as("lq"),
        col("b.vec_id").as("vb"), col("b.label").as("lb"))
      .agg(sum(col("a.q") * col("b.q")).as("dot"))
    val scored = dots
      .join(norms.select(col("vec_id").as("qa"), col("n2").as("na")),
        Seq("qa"))
      .join(norms.select(col("vec_id").as("vb"), col("n2").as("nb")),
        Seq("vb"))
      .withColumn("cos",
        col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
    val w = Window.partitionBy("qa").orderBy(col("cos").desc, col("vb"))
    scored.withColumn("rnk", row_number().over(w).cast(LongType))
  }

  private val rankedSql: String =
    s"""$vdSql,
      norms AS MATERIALIZED (SELECT vec_id,
          CAST(SUM(q * q) AS BIGINT) AS n2
        FROM vd GROUP BY 1),
      dots AS MATERIALIZED (SELECT a.vec_id AS qa, a.label AS lq,
          b.vec_id AS vb, b.label AS lb,
          CAST(SUM(a.q * b.q) AS BIGINT) AS dot
        FROM vd a JOIN vd b ON b.d = a.d AND a.vec_id <> b.vec_id
        WHERE a.vec_id < 100
        GROUP BY 1, 2, 3, 4),
      ranked AS MATERIALIZED (SELECT qa, lq, vb, lb, cos,
          CAST(row_number() OVER (PARTITION BY qa
            ORDER BY cos DESC, vb) AS BIGINT) AS rnk
        FROM (SELECT d.*,
            CAST(d.dot AS DOUBLE) /
              (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
              AS cos
          FROM dots d JOIN norms na ON na.vec_id = d.qa
          JOIN norms nb ON nb.vec_id = d.vb))"""

  // ------------------------------------------------- MRR / hit@k
  // Label-retrieval evaluation over the embedding space: for each of
  // the first 100 query vectors, rank every other vector by cosine
  // (exact-lattice dot products; cosine trees identical, so rankings
  // agree bitwise) and score the first same-label hit — MRR (Σ1/rank
  // folded in query order), hit@1/5/10 as exact counts. The offline
  // eval harness every ANN index (q45 IVF, q106 PQ) is judged
  // against.
  private val q487 = QueryDef(
    "q487_knn_mrr",
    (s, dir) => {
      val firstHit = ranked(s, dir)
        .filter(col("lq") === col("lb"))
        .groupBy("qa").agg(min("rnk").as("fr"))
        .withColumn("rr", lit(1.0) / col("fr").cast("double"))
      firstHit.agg(count(lit(1)).as("n_queries"),
          sum(when(col("fr") === 1L, 1L).otherwise(0L)).as("hit1"),
          sum(when(col("fr") <= 5L, 1L).otherwise(0L)).as("hit5"),
          sum(when(col("fr") <= 10L, 1L).otherwise(0L)).as("hit10"),
          sort_array(collect_list(struct(col("qa"), col("rr")))).as("rl"))
        .withColumn("srr",
          aggregate(col("rl"), lit(0.0), (a, e) => a + e.getField("rr")))
        .select(col("n_queries"), col("hit1"), col("hit5"), col("hit10"),
          (col("srr") / col("n_queries").cast("double")).as("mrr"))
    },
    Some(s"""WITH $rankedSql,
      fh AS (SELECT qa, MIN(rnk) AS fr FROM ranked
        WHERE lq = lb GROUP BY qa),
      rr AS (SELECT qa, fr, 1.0 / CAST(fr AS DOUBLE) AS rr FROM fh)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        CAST(COUNT(*) FILTER (WHERE fr = 1) AS BIGINT) AS hit1,
        CAST(COUNT(*) FILTER (WHERE fr <= 5) AS BIGINT) AS hit5,
        CAST(COUNT(*) FILTER (WHERE fr <= 10) AS BIGINT) AS hit10,
        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
          list(rr ORDER BY qa)), (a, b) -> a + b) /
          CAST(COUNT(*) AS DOUBLE) AS mrr
      FROM rr"""),
    covers = Seq("IR-mrr"))

  // ------------------------------------------------- hard negatives
  // Hard-negative mining: per query, the margin between the best
  // same-label and best different-label cosine. The 10 most-negative
  // margins are the queries whose nearest neighbor is a WRONG-label
  // impostor — exactly the pairs a contrastive fine-tune needs.
  private val q488 = QueryDef(
    "q488_retrieval_margin",
    (s, dir) => {
      val r = ranked(s, dir)
      val best = r.groupBy("qa", "lq")
        .agg(max(when(col("lq") === col("lb"), col("cos"))).as("best_same"),
          max(when(col("lq") =!= col("lb"), col("cos"))).as("best_diff"))
        .withColumn("margin", col("best_same") - col("best_diff"))
      best.orderBy(col("margin"), col("qa")).limit(10)
        .select(col("qa").as("query_vec"), col("lq").as("label"),
          col("best_same"), col("best_diff"), col("margin"))
    },
    Some(s"""WITH $rankedSql,
      best AS (SELECT qa, lq,
          MAX(CASE WHEN lq = lb THEN cos END) AS best_same,
          MAX(CASE WHEN lq <> lb THEN cos END) AS best_diff
        FROM ranked GROUP BY qa, lq)
      SELECT qa AS query_vec, lq AS label, best_same, best_diff,
        best_same - best_diff AS margin
      FROM best ORDER BY margin, qa LIMIT 10"""),
    covers = Seq("IR-hard-negatives"))

  // ------------------------------------------------- BLEU-lite
  // Modified n-gram precision between verified near-dup pairs
  // (candidate = doc_a, reference = doc_b): P1/P2 are exact clipped-
  // count ratios, combined as sqrt(P1·P2) with a linear brevity
  // factor min(1, len_a/len_b) — geometric-mean BLEU-2 with the exp
  // brevity penalty replaced by a rational (exp is not gateable).
  // The MT metric repurposed as a dedup-quality score.
  private val q489 = QueryDef(
    "q489_bleu_pairs",
    (s, dir) => {
      // session-cached copy of q22's verified-pairs pipeline (the
      // oracle re-derives it independently from documents)
      val pairs = GraphGateSource.cached(s, "q22-pairs:" + dir)(
        graft.SparkEntry.queries("q22_ngram_jaccard")(s, dir))
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint()
      // only documents that appear in a verified pair are ever read
      // by the clipped-count joins or the brevity length — build the
      // gram tables for THAT set (pair-bounded), not the corpus: the
      // two corpus-sized explode→groupBy gram builds disappear and
      // every downstream join is candidate-sized
      val pairDocs = pairs.select(col("doc_a").as("doc_id"))
        .unionAll(pairs.select(col("doc_b").as("doc_id")))
        .distinct()
      val docs = t(s, dir, "documents")
        .join(broadcast(pairDocs), Seq("doc_id"))
      val uni = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val toks = docs.select(col("doc_id"), split(col("text"), " ").as("tk"))
      val bi = toks.select(col("doc_id"),
          explode(expr("transform(sequence(0, size(tk) - 2), " +
            "i -> concat(tk[i], ' ', tk[i + 1]))")).as("g"))
        .filter(col("g").isNotNull)
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      def clipped(grams: DataFrame): DataFrame =
        pairs
          .join(grams.select(col("doc_id").as("doc_a"), col("g"),
            col("c").as("ca")), Seq("doc_a"))
          .join(grams.select(col("doc_id").as("doc_b"), col("g"),
            col("c").as("cb")), Seq("doc_b", "g"), "left")
          .withColumn("cb", coalesce(col("cb"), lit(0L)))
          .groupBy("doc_a", "doc_b")
          .agg(sum(least(col("ca"), col("cb"))).as("clip"),
            sum("ca").as("tot"))
      val p1 = clipped(uni).select(col("doc_a"), col("doc_b"),
        col("clip").as("clip1"), col("tot").as("len_a"))
      val p2 = clipped(bi).select(col("doc_a"), col("doc_b"),
        col("clip").as("clip2"), col("tot").as("tot2"))
      val lenB = uni.groupBy(col("doc_id").as("doc_b"))
        .agg(sum("c").as("len_b"))
      p1.join(p2, Seq("doc_a", "doc_b")).join(lenB, Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (col("clip1").cast("double") / col("len_a").cast("double"))
            .as("p1"),
          (col("clip2").cast("double") / col("tot2").cast("double"))
            .as("p2"),
          (sqrt((col("clip1").cast("double") / col("len_a").cast("double")) *
            (col("clip2").cast("double") / col("tot2").cast("double"))) *
            least(lit(1.0),
              col("len_a").cast("double") / col("len_b").cast("double")))
            .as("bleu2_lite"))
        .orderBy("doc_a", "doc_b")
    },
    Some("""WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk
          FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
             FROM toksrc WHERE len(tk) >= 3),
      sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh
        GROUP BY 1),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(COUNT(*) AS BIGINT) AS common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM p0
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.4),
      uni AS MATERIALIZED (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT)
          AS c
        FROM (SELECT doc_id, unnest(tk) AS g FROM toksrc)
        GROUP BY 1, 2),
      bi AS MATERIALIZED (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT)
          AS c
        FROM (SELECT doc_id,
            unnest(list_transform(range(1, len(tk)),
              i -> tk[i] || ' ' || tk[i+1])) AS g
          FROM toksrc WHERE len(tk) >= 2)
        GROUP BY 1, 2),
      c1 AS (SELECT p.doc_a, p.doc_b,
          CAST(SUM(LEAST(ua.c, COALESCE(ub.c, 0))) AS BIGINT) AS clip1,
          CAST(SUM(ua.c) AS BIGINT) AS len_a
        FROM pairs p
        JOIN uni ua ON ua.doc_id = p.doc_a
        LEFT JOIN uni ub ON ub.doc_id = p.doc_b AND ub.g = ua.g
        GROUP BY 1, 2),
      c2 AS (SELECT p.doc_a, p.doc_b,
          CAST(SUM(LEAST(ba.c, COALESCE(bb.c, 0))) AS BIGINT) AS clip2,
          CAST(SUM(ba.c) AS BIGINT) AS tot2
        FROM pairs p
        JOIN bi ba ON ba.doc_id = p.doc_a
        LEFT JOIN bi bb ON bb.doc_id = p.doc_b AND bb.g = ba.g
        GROUP BY 1, 2),
      lb AS (SELECT doc_id AS doc_b, CAST(SUM(c) AS BIGINT) AS len_b
        FROM uni GROUP BY 1)
      SELECT c1.doc_a, c1.doc_b,
        CAST(c1.clip1 AS DOUBLE) / CAST(c1.len_a AS DOUBLE) AS p1,
        CAST(c2.clip2 AS DOUBLE) / CAST(c2.tot2 AS DOUBLE) AS p2,
        sqrt((CAST(c1.clip1 AS DOUBLE) / CAST(c1.len_a AS DOUBLE)) *
          (CAST(c2.clip2 AS DOUBLE) / CAST(c2.tot2 AS DOUBLE))) *
          LEAST(1.0, CAST(c1.len_a AS DOUBLE) / CAST(lb.len_b AS DOUBLE))
          AS bleu2_lite
      FROM c1 JOIN c2 ON c2.doc_a = c1.doc_a AND c2.doc_b = c1.doc_b
      JOIN lb ON lb.doc_b = c1.doc_b
      ORDER BY c1.doc_a, c1.doc_b"""),
    covers = Seq("IR-bleu-lite"))

  // ------------------------------------------------- coreset
  // Farthest-point (k-center greedy) coreset: 8 centers over the
  // first 500 vectors, starting from the minimum id; each stage
  // picks the point maximizing its min-distance to the chosen set
  // (exact lattice integers, ties → id) and records the covering
  // radius. Runs on collected fixed-point vectors (the pool is the
  // SAMPLE; at corpus scale the pool arrives via q100-style
  // weighted sampling); oracle = 8 unrolled argmax stages.
  private val q490 = QueryDef(
    "q490_farthest_point_coreset",
    (s, dir) => {
      val rows = t(s, dir, "embeddings")
        .filter(col("vec_id") < SamplePools.CoresetPool)
        .select(col("vec_id"),
          expr(s"transform(embedding, x -> " +
            s"CAST(floor(CAST(x AS DOUBLE) * ${Q}.0) AS BIGINT))")
            .as("qs"))
        // bounded-collect: SamplePools.CoresetPool rows — the pool IS
        // the sample (q100 sampler at corpus scale), never the corpus
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
        .sortBy(_._1)
      def d2(a: Array[Long], b: Array[Long]): Long = {
        var i = 0; var acc = 0L
        while (i < a.length) {
          val df = a(i) - b(i); acc += df * df; i += 1
        }
        acc
      }
      val ids = rows.map(_._1)
      val vecs = rows.map(_._2)
      val n = ids.length
      var centers = List(0) // index of min id (rows sorted by id)
      val md = Array.tabulate(n)(i => d2(vecs(i), vecs(0)))
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      out += ((1L, ids(0), md.max))
      for (k <- 2 to 8) {
        var bi = 0
        for (i <- 1 until n)
          if (md(i) > md(bi) || (md(i) == md(bi) && ids(i) < ids(bi))) bi = i
        val c = bi
        centers = c :: centers
        for (i <- 0 until n) md(i) = math.min(md(i), d2(vecs(i), vecs(c)))
        out += ((k.toLong, ids(c), md.max))
      }
      import s.implicits._
      out.toSeq.toDF("stage", "center", "radius_num")
        .select(col("stage"), col("center"),
          (col("radius_num").cast("double") / lit((Q * Q).toDouble))
            .as("cover_radius_sq"))
        .orderBy("stage")
    },
    Some {
      val stages = (2 to 8).map { k =>
        s"""p$k AS MATERIALIZED (SELECT vec_id FROM md${k - 1}
        ORDER BY md DESC, vec_id LIMIT 1),
      md$k AS MATERIALIZED (SELECT m.vec_id,
          LEAST(m.md, dd.d2) AS md
        FROM md${k - 1} m JOIN (SELECT v.vec_id,
            CAST(SUM((v.q - c.q) * (v.q - c.q)) AS BIGINT) AS d2
          FROM vd v JOIN vd c ON c.d = v.d
            AND c.vec_id = (SELECT vec_id FROM p$k)
          GROUP BY v.vec_id) dd ON dd.vec_id = m.vec_id)"""
      }.mkString(",\n      ")
      val outs = (1 to 8).map { k =>
        val ctr = if (k == 1) "(SELECT vec_id FROM p1)"
          else s"(SELECT vec_id FROM p$k)"
        s"""SELECT $k AS stage, $ctr AS center,
        (SELECT CAST(MAX(md) AS DOUBLE) / (1048576.0 * 1048576.0)
          FROM md$k) AS cover_radius_sq"""
      }.mkString("\n      UNION ALL\n      ")
      s"""WITH vd AS MATERIALIZED (SELECT vec_id, dd.i - 1 AS d,
          CAST(floor(CAST(embedding[dd.i] AS DOUBLE) * 1048576.0)
            AS BIGINT) AS q
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) dd
        WHERE vec_id < 500),
      p1 AS MATERIALIZED (SELECT MIN(vec_id) AS vec_id FROM vd),
      md1 AS MATERIALIZED (SELECT v.vec_id,
          CAST(SUM((v.q - c.q) * (v.q - c.q)) AS BIGINT) AS md
        FROM vd v JOIN vd c ON c.d = v.d
          AND c.vec_id = (SELECT vec_id FROM p1)
        GROUP BY v.vec_id),
      $stages
      SELECT CAST(stage AS BIGINT) AS stage,
        CAST(center AS BIGINT) AS center, cover_radius_sq
      FROM ($outs) ORDER BY stage"""
    },
    covers = Seq("SIM-coreset"))

  // ------------------------------------------------- PRF expansion
  // Pseudo-relevance-feedback query expansion: for each seed term,
  // take the 10 best documents by the q434 rational-idf BM25 score,
  // then rank the terms of that feedback pool by exact lift
  // (c_fb·T)/(t_fb·C) against the corpus — the top-5 co-occurring
  // terms are the expansion. End-to-end IR loop, every ranking an
  // identical double tree or exact rational.
  private val q491 = QueryDef(
    "q491_query_expansion_prf",
    (s, dir) => {
      val seeds = Seq("spark", "hash", "vector")
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .localCheckpoint()
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val corpus = dl.agg(sum("dl").as("total_tok"),
        count(lit(1)).as("n_docs"))
      import s.implicits._
      val seedDf = seeds.toDF("seed")
      val scored = seedDf
        .join(tf.withColumnRenamed("term", "seed"), Seq("seed"))
        .join(dl, Seq("doc_id"))
        .join(dft.withColumnRenamed("term", "seed"), Seq("seed"))
        .crossJoin(broadcast(corpus))
        .withColumn("score",
          (((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
          ((col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
              lit(0.75) * (col("dl").cast("double") /
                (col("total_tok").cast("double") /
                  col("n_docs").cast("double")))))))
      val wTop = Window.partitionBy("seed")
        .orderBy(col("score").desc, col("doc_id"))
      val fb = scored.withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 10)
        .select(col("seed"), col("doc_id"))
      val fbTok = fb.join(tok, Seq("doc_id"))
        .groupBy("seed", "term").agg(count(lit(1)).as("c_fb"))
      val fbTot = fbTok.groupBy("seed").agg(sum("c_fb").as("t_fb"))
      val glob = tok.groupBy("term").agg(count(lit(1)).as("c_all"))
      val tot = tok.agg(count(lit(1)).as("t_all"))
      val lift = fbTok
        .join(broadcast(fbTot), Seq("seed"))
        .join(glob, Seq("term"))
        .crossJoin(broadcast(tot))
        .filter(col("term") =!= col("seed"))
        .withColumn("lift",
          (col("c_fb") * col("t_all")).cast("double") /
            (col("t_fb") * col("c_all")).cast("double"))
      val wExp = Window.partitionBy("seed")
        .orderBy(col("lift").desc, col("term"))
      lift.withColumn("rk", row_number().over(wExp).cast(LongType))
        .filter(col("rk") <= 5)
        .select(col("seed"), col("rk"), col("term"), col("lift"))
        .orderBy("seed", "rk")
    },
    Some("""WITH tok AS MATERIALIZED (SELECT doc_id,
          unnest(string_split(text, ' ')) AS term FROM documents),
      tf AS MATERIALIZED (SELECT doc_id, term,
          CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
      dl AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        FROM tok GROUP BY 1),
      df AS MATERIALIZED (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY 1),
      corpus AS (SELECT CAST(SUM(dl) AS BIGINT) AS total_tok,
          CAST(COUNT(*) AS BIGINT) AS n_docs FROM dl),
      seeds AS (SELECT unnest(['spark', 'hash', 'vector']) AS seed),
      scored AS (SELECT s.seed, t.doc_id,
          ((CAST(c.n_docs - f.df AS DOUBLE) + 0.5) /
            (CAST(f.df AS DOUBLE) + 0.5)) *
          ((CAST(t.tf AS DOUBLE) * 2.2) /
            (CAST(t.tf AS DOUBLE) + 1.2 * (0.25 +
              0.75 * (CAST(d.dl AS DOUBLE) /
                (CAST(c.total_tok AS DOUBLE) /
                  CAST(c.n_docs AS DOUBLE)))))) AS score
        FROM seeds s
        JOIN tf t ON t.term = s.seed
        JOIN dl d ON d.doc_id = t.doc_id
        JOIN df f ON f.term = s.seed
        CROSS JOIN corpus c),
      fb AS MATERIALIZED (SELECT seed, doc_id FROM (SELECT seed, doc_id,
          row_number() OVER (PARTITION BY seed
            ORDER BY score DESC, doc_id) AS rk
        FROM scored) WHERE rk <= 10),
      fb_tok AS (SELECT f.seed, t.term, CAST(COUNT(*) AS BIGINT)
          AS c_fb
        FROM fb f JOIN tok t ON t.doc_id = f.doc_id
        GROUP BY 1, 2),
      fb_tot AS (SELECT seed, CAST(SUM(c_fb) AS BIGINT) AS t_fb
        FROM fb_tok GROUP BY 1),
      gl AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c_all
        FROM tok GROUP BY 1),
      tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_all FROM tok),
      lift AS (SELECT ft.seed, ft.term,
          CAST(ft.c_fb * t.t_all AS DOUBLE) /
            CAST(fo.t_fb * g.c_all AS DOUBLE) AS lift
        FROM fb_tok ft
        JOIN fb_tot fo ON fo.seed = ft.seed
        JOIN gl g ON g.term = ft.term
        CROSS JOIN tt t
        WHERE ft.term <> ft.seed)
      SELECT seed, CAST(rk AS BIGINT) AS rk, term, lift
      FROM (SELECT seed, term, lift,
          row_number() OVER (PARTITION BY seed
            ORDER BY lift DESC, term) AS rk
        FROM lift) WHERE rk <= 5 ORDER BY seed, rk"""),
    covers = Seq("IR-prf-expansion"))

  val all: Seq[QueryDef] = Seq(q487, q488, q489, q490, q491)
}
