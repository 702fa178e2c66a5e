package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-66 gate additions (q349–q353): inventory classification,
  * embedding-space geometry, dedup-cluster composition, and variance
  * decomposition.
  *
  * Determinism: classification boundaries compare exact DECIMALs
  * (5·cum ≤ 4·tot, never 0.8 as a double); embedding geometry runs on
  * per-row-normalized fixed-point integers; rational-double folds use
  * the fixed-order aggregate ↔ list_reduce pattern.
  */
object Round66Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Q = 1048576L   // 2^20
  private val Q2 = 1099511627776d // 2^40

  // ------------------------------------------------- ABC classification
  // Inventory ABC: parts ranked by revenue, class A = the prefix
  // holding ≤80% of revenue, B to 95%, C the tail. The cutoffs
  // compare exact DECIMALs (5·cum ≤ 4·total, 20·cum ≤ 19·total) so
  // the boundary part lands identically on both engines. One ranked
  // window at part cardinality, then a three-row rollup.
  private val q349 = QueryDef(
    "q349_abc_classification",
    (s, dir) => {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      val per = t(s, dir, "lineitem")
        .groupBy("l_partkey").agg(sum(rev).cast(DecimalType(38, 4)).as("r"))
      val w = Window.orderBy(desc("r"), asc("l_partkey"))
      val tot = per.agg(sum(col("r")).cast(DecimalType(38, 4)).as("t"),
        count(lit(1)).as("np"))
      val cum = per
        .withColumn("cum", sum(col("r")).over(w).cast(DecimalType(38, 4)))
        .crossJoin(broadcast(tot))
        .withColumn("cls",
          when(col("cum") * 5 <= col("t") * 4, "A")
            .when(col("cum") * 20 <= col("t") * 19, "B")
            .otherwise("C"))
      cum.groupBy("cls")
        .agg(count(lit(1)).as("n_parts"),
          sum(col("r")).cast(DecimalType(38, 4)).as("cls_rev"),
          first(col("t")).as("t"), first(col("np")).as("np"))
        .select(col("cls"), col("n_parts"),
          (col("n_parts").cast("double") / col("np").cast("double"))
            .as("part_share"),
          (col("cls_rev").cast("double") / col("t").cast("double"))
            .as("rev_share"))
        .orderBy("cls")
    },
    Some("""WITH per AS (SELECT l_partkey,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS r
        FROM lineitem GROUP BY l_partkey),
      tot AS (SELECT CAST(SUM(r) AS DECIMAL(38,4)) AS t,
          CAST(COUNT(*) AS BIGINT) AS np FROM per),
      c AS (SELECT r,
          CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey) AS DECIMAL(38,4))
            AS cum
        FROM per),
      k AS (SELECT r, CASE WHEN cum * 5 <= t * 4 THEN 'A'
            WHEN cum * 20 <= t * 19 THEN 'B' ELSE 'C' END AS cls, t, np
        FROM c, tot)
      SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
        CAST(COUNT(*) AS DOUBLE) / CAST(MIN(np) AS DOUBLE) AS part_share,
        CAST(CAST(SUM(r) AS DECIMAL(38,4)) AS DOUBLE)
          / CAST(MIN(t) AS DOUBLE) AS rev_share
      FROM k GROUP BY cls
      ORDER BY cls"""),
    covers = Seq("A-abc"))

  // ------------------------------------------------- intra-label coherence
  // Mean pairwise cosine within each label, WITHOUT the quadratic
  // pair join: for unit-normalized vectors u, Σ_pairs u·v =
  // (‖Σu‖² − Σ‖u‖²)/2, so one pass of exact fixed-point sums per
  // (label, dim) answers it. Normalization happens per row (sqrt is
  // IEEE-exact), quantization after it keeps every later sum integer.
  // The de-quantized mean is the class-coherence number an embedding
  // QA gate watches.
  private val q350 = QueryDef(
    "q350_intra_label_coherence",
    (s, dir) => {
      val x2 = transform(col("embedding"),
        x => x.cast("double") * x.cast("double"))
      val l2 = sqrt(aggregate(x2, lit(0.0d), (a, b) => a + b))
      val e = t(s, dir, "embeddings")
        .withColumn("l2", l2).filter(col("l2") > 0)
        .withColumn("u", transform(col("embedding"),
          x => floor(x.cast("double") / col("l2") * lit(Q.toDouble))
            .cast(LongType)))
        .select(col("label").cast(LongType).as("lbl"), col("u"),
          aggregate(col("u"), lit(0L), (a, b) => a + b * b).as("q2"))
        // materialized once: the normalize/quantize lambda chain (4
        // array HOFs per row — interpreted, not codegen'd) feeds two
        // different aggregations (per-row sums and the posexplode'd
        // per-dim sums) whose exchanges differ, so nothing is reusable
        // without it and the HOF pass ran twice
        .localCheckpoint()
      val perRow = e.groupBy("lbl")
        .agg(count(lit(1)).as("n"), sum(col("q2")).as("sq2"))
      val dims = e.select(col("lbl"),
        posexplode(col("u")).as(Seq("dim", "ud")))
        .groupBy("lbl", "dim").agg(sum(col("ud")).as("su"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
      val sumSq = dims.groupBy("lbl")
        .agg(sum(dec(col("su")) * dec(col("su"))).as("ssu2"))
      perRow.join(sumSq, Seq("lbl"))
        .filter(col("n") > 1)
        .select(col("lbl").as("label"), col("n").as("n_vecs"),
          ((col("ssu2") - dec(col("sq2"))).cast("double") /
            ((col("n") * (col("n") - 1L)).cast("double") * lit(Q2)))
            .as("intra_cosine"))
        .orderBy("label")
    },
    Some("""WITH e AS (SELECT CAST(label AS BIGINT) AS lbl,
          list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE)
              / sqrt(list_reduce(list_transform(embedding,
                  y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
                (a, b) -> a + b)) * 1048576) AS BIGINT)) AS u
        FROM embeddings
        WHERE sqrt(list_reduce(list_transform(embedding,
            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)),
          (a, b) -> a + b)) > 0),
      pr AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(list_reduce(list_transform(u, v -> v * v),
            (a, b) -> a + b)) AS BIGINT) AS sq2
        FROM e GROUP BY lbl),
      dims AS (SELECT lbl, d.i AS dim,
          CAST(SUM(u[d.i]) AS BIGINT) AS su
        FROM e, (SELECT unnest(generate_series(1, 64)) AS i) d
        GROUP BY lbl, d.i),
      ss AS (SELECT lbl,
          SUM(CAST(su AS HUGEINT) * su) AS ssu2
        FROM dims GROUP BY lbl)
      SELECT lbl AS label, n AS n_vecs,
        CAST(ssu2 - sq2 AS DOUBLE)
          / (CAST(n * (n - 1) AS DOUBLE) * CAST(1099511627776 AS DOUBLE))
          AS intra_cosine
      FROM pr JOIN ss USING (lbl)
      WHERE n > 1
      ORDER BY label"""),
    covers = Seq("SIM-coherence"))

  // ------------------------------------------------- cluster purity
  // Are near-duplicate clusters cross-lingual? The q22 similarity
  // pairs close transitively ([[graft.dedup.Dedup]]); each cluster
  // reports its size and distinct languages, summarized per size with
  // the mixed-cluster count — cross-lingual near-dups usually mean
  // template/boilerplate contamination, a different cleanup than
  // same-language dedup.
  private val q351 = QueryDef(
    "q351_cluster_purity",
    (s, dir) => {
      // session-cached copy of q22's verified-pairs output (the shared
      // input of q71/q192/q289/q332/q351/q359 — q22's own gate still
      // rebuilds, so its bench timing stays honest)
      val pairs = GraphGateSource.cached(s, "q22-pairs:" + dir)(
        graft.SparkEntry.queries("q22_ngram_jaccard")(s, dir))
        .select("doc_a", "doc_b")
      val clusters = graft.dedup.Dedup.clusters(pairs)
      val withLang = clusters.join(
        t(s, dir, "documents").select(col("doc_id"), col("lang")), "doc_id")
      val per = withLang.groupBy("cluster_id")
        .agg(count(lit(1)).as("size"),
          countDistinct(col("lang")).as("n_langs"))
      per.groupBy("size")
        .agg(count(lit(1)).as("n_clusters"),
          sum(when(col("n_langs") > 1, 1L).otherwise(0L)).as("n_mixed"),
          max(col("n_langs")).as("max_langs"))
        .orderBy("size")
    },
    Some("""WITH RECURSIVE toksrc AS (SELECT doc_id, string_split(text, ' ')
            AS tk FROM documents),
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
      edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
                UNION SELECT doc_b, doc_a FROM pairs),
      reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      assign AS (SELECT a AS doc_id, CAST(LEAST(a, MIN(b)) AS BIGINT)
            AS cluster_id
          FROM reach GROUP BY a),
      per AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size,
          CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
        FROM assign JOIN documents USING (doc_id)
        GROUP BY cluster_id)
      SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
        CAST(SUM(CASE WHEN n_langs > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_mixed,
        MAX(n_langs) AS max_langs
      FROM per GROUP BY size
      ORDER BY size"""),
    covers = Seq("DD-cluster-purity"))

  // ------------------------------------------------- seasonality strength
  // How much of the daily-volume variance the weekday explains:
  // R² = SS_between(dow)/SS_total per event type. Group moments are
  // exact longs; the 7 rational dow terms S_d²/n_d fold in fixed dow
  // order (aggregate ↔ list_reduce), the rest is one division.
  private val q352 = QueryDef(
    "q352_seasonality_strength",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("x"))
        .withColumn("dow", dayofweek(col("d")).cast(LongType))
      val byDow = daily.groupBy("event_type", "dow")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        .withColumn("v", col("sx").cast("double") * col("sx").cast("double") /
          col("n").cast("double"))
      val folded = byDow.groupBy("event_type")
        .agg(sum(col("n")).as("nn"), sum(col("sx")).as("gsx"),
          aggregate(sort_array(collect_list(struct(col("dow"), col("v")))),
            lit(0.0d), (acc, x) => acc + x.getField("v")).as("fold"))
      val tot = daily.groupBy("event_type")
        .agg(sum(col("x") * col("x")).as("sxx"))
      folded.join(tot, Seq("event_type"))
        .select(col("event_type"), col("nn").as("n_days"),
          ((col("fold") - col("gsx").cast("double") * col("gsx").cast("double")
            / col("nn").cast("double")) /
            (col("sxx").cast("double") - col("gsx").cast("double") *
              col("gsx").cast("double") / col("nn").cast("double")))
            .as("seasonality_r2"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, d),
      dd AS (SELECT event_type,
          CAST(dayofweek(d) AS BIGINT) + 1 AS dow, x FROM daily),
      byd AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx
        FROM dd GROUP BY event_type, dow),
      tm AS (SELECT event_type, dow, n, sx,
          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS v
        FROM byd),
      f AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS nn,
          CAST(SUM(sx) AS BIGINT) AS gsx,
          CAST(0 AS DOUBLE) + list_reduce(list(v ORDER BY dow),
            (a, b) -> a + b) AS fold
        FROM tm GROUP BY event_type),
      tot AS (SELECT event_type, CAST(SUM(x * x) AS BIGINT) AS sxx
              FROM daily GROUP BY event_type)
      SELECT event_type, nn AS n_days,
        (fold - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
            / CAST(nn AS DOUBLE))
        / (CAST(sxx AS DOUBLE) - CAST(gsx AS DOUBLE) * CAST(gsx AS DOUBLE)
            / CAST(nn AS DOUBLE)) AS seasonality_r2
      FROM f JOIN tot USING (event_type)
      ORDER BY event_type"""),
    covers = Seq("TS-seasonality-r2"))

  // ------------------------------------------------- effective dimensions
  // Participation ratio (Σλ)²/Σλ² of the probe-dim variances — the
  // effective dimensionality of the embedding space (8 = isotropic,
  // →1 = one dominant direction). Variances are exact DECIMAL(38,0)
  // integers (n·Σx² − (Σx)²), de-quantized to doubles once; both
  // 8-term folds run in fixed dim order.
  private val q353 = QueryDef(
    "q353_effective_dims",
    (s, dir) => {
      val dims = 0 until 64 by 8
      val e = t(s, dir, "embeddings").select(
        dims.map(d => floor(element_at(col("embedding"), d + 1).cast("double")
          * lit(Q.toDouble)).cast(LongType).as(s"q$d")): _*)
      val long = e.select(explode(array(dims.map(d =>
        struct(lit(d.toLong).as("dim"), col(s"q$d").as("x"))): _*)).as("p"))
        .select(col("p.dim"), col("p.x"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
      val g = long.groupBy("dim")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("vraw",
          (dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))))
        .withColumn("v", col("vraw").cast("double") /
          ((col("n") * col("n")).cast("double") * lit(Q2)))
      val folds = g.agg(
        aggregate(sort_array(collect_list(struct(col("dim"), col("v")))),
          lit(0.0d), (a, x) => a + x.getField("v")).as("sv"),
        aggregate(sort_array(collect_list(struct(col("dim"),
          (col("v") * col("v")).as("v2")))),
          lit(0.0d), (a, x) => a + x.getField("v2")).as("sv2"))
      g.crossJoin(broadcast(folds))
        .select(col("dim"), col("v").as("variance"),
          (col("v") / col("sv")).as("var_share"),
          (col("sv") * col("sv") / col("sv2")).as("effective_dims"))
        .orderBy("dim")
    },
    Some("""WITH dims AS (SELECT unnest([0,8,16,24,32,40,48,56]) AS d),
      lng AS (SELECT CAST(d AS BIGINT) AS dim,
          CAST(floor(CAST(embedding[d + 1] AS DOUBLE) * 1048576) AS BIGINT)
            AS x
        FROM embeddings, dims),
      g AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM lng GROUP BY dim),
      v AS (SELECT dim,
          CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
            / (CAST(n * n AS DOUBLE) * CAST(1099511627776 AS DOUBLE)) AS v
        FROM g),
      f AS (SELECT
          CAST(0 AS DOUBLE) + list_reduce(list(v ORDER BY dim),
            (a, b) -> a + b) AS sv,
          CAST(0 AS DOUBLE) + list_reduce(list(v * v ORDER BY dim),
            (a, b) -> a + b) AS sv2
        FROM v)
      SELECT dim, v AS variance, v / sv AS var_share,
        sv * sv / sv2 AS effective_dims
      FROM v, f
      ORDER BY dim"""),
    covers = Seq("SIM-effective-dims"))

  val all: Seq[QueryDef] =
    Seq(q349, q350, q351, q352, q353)
}
