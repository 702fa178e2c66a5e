package graft.queries

import org.apache.spark.sql.functions._


/** Round-46 gate addition (q291): end-to-end evaluation of the LSH
  * candidate generator against exact ground truth.
  */
object Round46Queries {

  // ------------------------------------------------- LSH P/R
  // Does the q23 banding actually find the near-duplicates q22
  // defines? Join the LSH candidate pairs against the exact-Jaccard
  // truth set (≥ 0.4) and report the confusion counts with precision
  // and recall — the end-to-end eval of the dedup retrieval stage
  // (q287 calibrates the estimator; this scores the INDEX). All
  // counts are exact longs from two full-outer-reconciled pair sets;
  // the two ratios close as single divisions. Both pipelines are the
  // gate queries' own factored bodies fed from ONE materialized
  // shingle-posting set — building q22 and q23 via their registry
  // entries paid the shingle explode twice (measured ~1.4x slower).
  private val q291 = QueryDef(
    "q291_lsh_precision_recall",
    (s, dir) => {
      val sh = TextQueries.shinglePostings(s, dir).localCheckpoint()
      // ground truth is q22's verified-pairs pipeline — read the
      // session-cached copy (oracle re-derives it independently)
      val truth = GraphGateSource.cached(s, "q22-pairs:" + dir)(
          graft.SparkEntry.queries("q22_ngram_jaccard")(s, dir))
        .select(col("doc_a"), col("doc_b"), lit(1L).as("is_truth"))
      val cand = TextQueries.lshCandidatesFrom(s, sh)
        .select(col("doc_a"), col("doc_b"), lit(1L).as("is_cand"))
      val merged = truth.join(cand, Seq("doc_a", "doc_b"), "full_outer")
        .select(coalesce(col("is_truth"), lit(0L)).as("is_truth"),
          coalesce(col("is_cand"), lit(0L)).as("is_cand"))
      merged.agg(
          sum(col("is_truth")).as("n_truth"),
          sum(col("is_cand")).as("n_candidates"),
          sum(col("is_truth") * col("is_cand")).as("tp"))
        .select(col("n_truth"), col("n_candidates"), col("tp"),
          (col("n_candidates") - col("tp")).as("fp"),
          (col("n_truth") - col("tp")).as("fn"),
          (col("tp").cast("double") / col("n_candidates").cast("double"))
            .as("precision"),
          (col("tp").cast("double") / col("n_truth").cast("double"))
            .as("recall"))
    },
    Some("""WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
             FROM toksrc WHERE len(tk) >= 3),
      sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      p0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS common
             FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      truth AS (SELECT doc_a, doc_b FROM p0
                JOIN sizes sa ON doc_a = sa.doc_id
                JOIN sizes sb ON doc_b = sb.doc_id
                WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.4),
      sig AS (SELECT doc_id,
          min(substr(md5('0:' || s), 1, 15)) AS h0,
          min(substr(md5('1:' || s), 1, 15)) AS h1,
          min(substr(md5('2:' || s), 1, 15)) AS h2,
          min(substr(md5('3:' || s), 1, 15)) AS h3,
          min(substr(md5('4:' || s), 1, 15)) AS h4,
          min(substr(md5('5:' || s), 1, 15)) AS h5,
          min(substr(md5('6:' || s), 1, 15)) AS h6,
          min(substr(md5('7:' || s), 1, 15)) AS h7
        FROM sh GROUP BY doc_id),
      bands AS (SELECT doc_id, unnest([
          md5('band0:' || h0 || h1), md5('band1:' || h2 || h3),
          md5('band2:' || h4 || h5), md5('band3:' || h6 || h7)]) AS bkey
        FROM sig),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
      merged AS (SELECT
          CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_truth,
          CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_cand
        FROM truth t FULL OUTER JOIN cand c
          ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b),
      g AS (SELECT CAST(SUM(is_truth) AS BIGINT) AS n_truth,
          CAST(SUM(is_cand) AS BIGINT) AS n_candidates,
          CAST(SUM(is_truth * is_cand) AS BIGINT) AS tp
        FROM merged)
      SELECT n_truth, n_candidates, tp,
        n_candidates - tp AS fp, n_truth - tp AS fn,
        CAST(tp AS DOUBLE) / CAST(n_candidates AS DOUBLE) AS precision,
        CAST(tp AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall
      FROM g"""),
    covers = Seq("DEDUP-index-eval"))

  val all: Seq[QueryDef] =
    Seq(q291)
}
