package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Round-62 gate additions (q329–q333): corpus-curation side effects,
  * feature quality, positional vocabulary, similarity-graph shape,
  * and audience overlap.
  *
  * Determinism: the fixed-point quantization + exact-integer
  * sufficient-statistics pattern of q304/q307; doubles only as
  * terminal divisions/sqrt.
  */
object Round62Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Q = 1048576L // 2^20 fixed-point scale

  // ------------------------------------------------- dedup survivor bias
  // Exact dedup (one survivor per distinct text) does not remove
  // uniformly: the language mix BEFORE vs AFTER, with the
  // percentage-point shift — curation's side effect on the mixture,
  // measured. Shares are exact-count divisions; the shift is one
  // subtraction of identically-shaped doubles.
  private val q329 = QueryDef(
    "q329_dedup_survivor_bias",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val before = d.groupBy("lang").agg(count(lit(1)).as("n_before"))
      val after = d.groupBy("text", "lang").agg(count(lit(1)).as("copies"))
        .groupBy("lang").agg(count(lit(1)).as("n_after"))
      val tot = before.agg(sum(col("n_before")).as("tb"))
      val tota = after.agg(sum(col("n_after")).as("ta"))
      before.join(after, Seq("lang"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(tota))
        .select(col("lang"), col("n_before"), col("n_after"),
          (col("n_before").cast("double") / col("tb").cast("double"))
            .as("share_before"),
          (col("n_after").cast("double") / col("ta").cast("double"))
            .as("share_after"),
          (col("n_after").cast("double") / col("ta").cast("double") -
            col("n_before").cast("double") / col("tb").cast("double"))
            .as("shift"))
        .orderBy("lang")
    },
    Some("""WITH before AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_before
          FROM documents GROUP BY lang),
      dd AS (SELECT lang FROM (SELECT DISTINCT text, lang FROM documents)),
      aft AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_after
              FROM dd GROUP BY lang),
      tb AS (SELECT CAST(SUM(n_before) AS BIGINT) AS tb FROM before),
      ta AS (SELECT CAST(SUM(n_after) AS BIGINT) AS ta FROM aft)
      SELECT lang, n_before, n_after,
        CAST(n_before AS DOUBLE) / CAST(tb AS DOUBLE) AS share_before,
        CAST(n_after AS DOUBLE) / CAST(ta AS DOUBLE) AS share_after,
        CAST(n_after AS DOUBLE) / CAST(ta AS DOUBLE)
          - CAST(n_before AS DOUBLE) / CAST(tb AS DOUBLE) AS shift
      FROM before JOIN aft USING (lang), tb, ta
      ORDER BY lang"""),
    covers = Seq("DD-survivor-bias"))

  // ------------------------------------------------- Fisher scores
  // Feature-selection audit: per probe dimension, the Fisher score —
  // between-class variance of the label means over the pooled
  // within-class variance. All moments come from per-(label, dim)
  // exact quantized sums; the variance algebra runs on those longs
  // and surfaces as one division chain. Shuffle carries
  // |labels|·|dims| partial rows — constant in corpus size.
  private val q330 = QueryDef(
    "q330_fisher_scores",
    (s, dir) => {
      val dims = 0 until 64 by 8
      val e = t(s, dir, "embeddings").select(col("label").cast(LongType).as("lbl") +:
        dims.map(d => floor(element_at(col("embedding"), d + 1).cast("double")
          * lit(Q.toDouble)).cast(LongType).as(s"q$d")): _*)
      val pairs = dims.map(d =>
        struct(lit(d.toLong).as("dim"), col(s"q$d").as("x")))
      val g = e.select(col("lbl"), explode(array(pairs: _*)).as("p"))
        .select(col("lbl"), col("p.dim"), col("p.x"))
        .groupBy("dim", "lbl")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
      // per dim: N, grand sum, and Σ_c sx_c²/n_c — the class terms are
      // rational doubles, so they fold in a FIXED lbl order on both
      // engines (aggregate ↔ list_reduce, the q302 pattern); a plain
      // sum(double) would be partial-aggregation-order dependent
      val term = (col("sx").cast("double") * col("sx").cast("double") /
        col("n").cast("double")).as("v")
      val terms = g.select(col("dim"), col("lbl"), col("n"), col("sx"),
        col("sxx"), term)
      val perDim = terms.groupBy("dim").agg(
        sum(col("n")).as("nn"), sum(col("sx")).as("gsx"),
        aggregate(
          sort_array(collect_list(struct(col("lbl"), col("v")))),
          lit(0.0d), (acc, x) => acc + x.getField("v"))
          .as("sum_sx2_over_n"),
        sum(col("sxx")).as("gsxx"),
        count(lit(1)).as("k"))
      perDim.select(col("dim"), col("k").as("n_classes"),
        ((col("sum_sx2_over_n") -
          col("gsx").cast("double") * col("gsx").cast("double") /
            col("nn").cast("double")) /
          (col("gsxx").cast("double") - col("sum_sx2_over_n")))
          .as("fisher"))
        .orderBy("dim")
    },
    Some("""WITH dims AS (SELECT unnest([0,8,16,24,32,40,48,56]) AS d),
      px AS (SELECT CAST(label AS BIGINT) AS lbl, CAST(d AS BIGINT) AS dim,
          CAST(floor(CAST(embedding[d + 1] AS DOUBLE) * 1048576) AS BIGINT)
            AS x
        FROM embeddings, dims),
      g AS (SELECT dim, lbl, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM px GROUP BY dim, lbl),
      tm AS (SELECT dim, lbl, n, sx, sxx,
          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS v
        FROM g),
      pd AS (SELECT dim, CAST(SUM(n) AS BIGINT) AS nn,
          CAST(SUM(sx) AS BIGINT) AS gsx,
          CAST(0 AS DOUBLE) + list_reduce(list(v ORDER BY lbl),
            (a, b) -> a + b) AS sum_sx2_over_n,
          CAST(SUM(sxx) AS BIGINT) AS gsxx,
          CAST(COUNT(*) AS BIGINT) AS k
        FROM tm GROUP BY dim)
      SELECT dim, k AS n_classes,
        (sum_sx2_over_n
          - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE) / CAST(nn AS DOUBLE))
        / (CAST(gsxx AS DOUBLE) - sum_sx2_over_n) AS fisher
      FROM pd ORDER BY dim"""),
    covers = Seq("SIM-fisher"))

  // ------------------------------------------------- token position
  // Where in a document does each top term live? Normalized mean
  // position (Σpos / Σ(len−1) over its occurrences, 0 = opening,
  // 1 = closing) for the 20 most frequent terms — openers vs closers
  // in the vocabulary. Positions come from posexplode; both sums are
  // exact longs.
  private val q331 = QueryDef(
    "q331_token_position_stats",
    (s, dir) => {
      val base = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), size(col("tk")).cast(LongType).as("len"),
          posexplode(col("tk")).as(Seq("pos", "term")))
        .filter(col("len") > 1)
      val g = base.groupBy("term")
        .agg(count(lit(1)).as("freq"),
          sum(col("pos").cast(LongType)).as("spos"),
          sum(col("len").cast(LongType) - 1L).as("sden"))
      g.orderBy(desc("freq"), asc("term")).limit(20)
        .select(col("term"), col("freq"),
          (col("spos").cast("double") / col("sden").cast("double"))
            .as("mean_rel_pos"))
        .orderBy(desc("freq"), asc("term"))
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk
          FROM documents),
      mx AS (SELECT MAX(len(tk)) AS m FROM d),
      toks AS (SELECT doc_id, s.i - 1 AS pos, tk[s.i] AS term, len(tk) AS len
        FROM d, (SELECT unnest(generate_series(1, (SELECT m FROM mx))) AS i) s
        WHERE s.i <= len(tk) AND len(tk) > 1),
      g AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq,
          CAST(SUM(pos) AS BIGINT) AS spos,
          CAST(SUM(len - 1) AS BIGINT) AS sden
        FROM toks GROUP BY term)
      SELECT term, freq,
        CAST(spos AS DOUBLE) / CAST(sden AS DOUBLE) AS mean_rel_pos
      FROM g ORDER BY freq DESC, term LIMIT 20"""),
    covers = Seq("TXT-positional"))

  // ------------------------------------------------- sim-graph degree
  // Shape of the near-duplicate similarity graph: per-document
  // neighbor count (from q22's Jaccard≥0.4 pairs, both directions)
  // folded to a degree histogram, plus the isolated-document count as
  // degree 0 — the connectivity profile that predicts dedup cluster
  // blowup before running the transitive closure.
  private val q332 = QueryDef(
    "q332_simgraph_degree_hist",
    (s, dir) => {
      // session-cached copy of q22's verified-pairs output (the shared
      // input of q71/q192/q289/q332/q351/q359 — q22's own gate still
      // rebuilds, so its bench timing stays honest)
      val pairs = GraphGateSource.cached(s, "q22-pairs:" + dir)(
        graft.SparkEntry.queries("q22_ngram_jaccard")(s, dir))
        .select("doc_a", "doc_b")
      // materialize the (tiny) degree table ONCE: it feeds the
      // histogram AND the isolated count, and each evaluation would
      // otherwise re-run the full q22 shingle-pair join behind it
      // (measured ~2x the query's whole cost)
      val deg = pairs.select(col("doc_a").as("doc_id"))
        .unionAll(pairs.select(col("doc_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree"))
        .localCheckpoint()
      val nDocs = t(s, dir, "documents").count()
      val withIso = deg.groupBy("degree").agg(count(lit(1)).as("n_docs"))
      import s.implicits._
      val isolated = Seq((0L, nDocs - deg.count())).toDF("degree", "n_docs")
      withIso.unionByName(isolated)
        .filter(col("n_docs") > 0)
        .orderBy("degree")
    },
    Some("""WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk
          FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
             FROM toksrc WHERE len(tk) >= 3),
      sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh
                GROUP BY doc_id),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS common
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      pairs AS (SELECT doc_a, doc_b FROM p0
                JOIN sizes sa ON doc_a = sa.doc_id
                JOIN sizes sb ON doc_b = sb.doc_id
                WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.4),
      deg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree FROM (
                SELECT doc_a AS doc_id FROM pairs
                UNION ALL SELECT doc_b FROM pairs)
              GROUP BY doc_id),
      hist AS (SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM deg GROUP BY degree
               UNION ALL
               SELECT 0,
                 (SELECT COUNT(*) FROM documents)
                   - (SELECT COUNT(*) FROM deg))
      SELECT degree, n_docs FROM hist WHERE n_docs > 0
      ORDER BY degree"""),
    covers = Seq("DD-degree-hist"))

  // ------------------------------------------------- audience overlap
  // Jaccard overlap of user audiences between event-type pairs: do
  // the same users click and purchase, or are the populations
  // disjoint? Distinct (type, user) postings self-join on user — the
  // |types|² matrix from sets collapsed to user cardinality first.
  private val q333 = QueryDef(
    "q333_audience_overlap",
    (s, dir) => {
      val a = t(s, dir, "events")
        .select(col("event_type"), col("user_id")).distinct()
      val sz = a.groupBy("event_type").agg(count(lit(1)).as("n"))
      val inter = a.as("x").join(a.as("y"), Seq("user_id"))
        .filter(col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"),
          col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(sz.select(col("event_type").as("type_a"), col("n").as("na")),
          Seq("type_a"))
        .join(sz.select(col("event_type").as("type_b"), col("n").as("nb")),
          Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_both"),
          (col("n_both").cast("double") /
            (col("na") + col("nb") - col("n_both")).cast("double"))
            .as("jaccard"))
        .orderBy("type_a", "type_b")
    },
    Some("""WITH a AS (SELECT DISTINCT event_type, user_id FROM events),
      sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
             FROM a GROUP BY event_type),
      inter AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
          CAST(COUNT(*) AS BIGINT) AS n_both
        FROM a x JOIN a y ON x.user_id = y.user_id
          AND x.event_type < y.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, n_both,
        CAST(n_both AS DOUBLE) / CAST(na.n + nb.n - n_both AS DOUBLE) AS jaccard
      FROM inter
      JOIN sz na ON na.event_type = type_a
      JOIN sz nb ON nb.event_type = type_b
      ORDER BY type_a, type_b"""),
    covers = Seq("A-audience-overlap"))

  val all: Seq[QueryDef] =
    Seq(q329, q330, q331, q332, q333)
}
