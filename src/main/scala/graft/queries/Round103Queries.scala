package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Round-9 gates: the LSH-backed curation pipeline variant.
  *
  * q109 hash-gates [[graft.pipelines.CorpusCuration]] with its default
  * exact-postings near-dup candidate stage; this gate runs the SAME
  * pipeline with the MinHash-LSH candidate source — the configuration
  * a 100 TB user actually deploys, because exact posting expansion is
  * the one family the scale ladder measured super-linear (×135 at the
  * sf1 rung on dense corpora) while banded LSH stayed posting-linear
  * (×17 on the same data). The oracle re-derives every stage in SQL
  * including the 8-hash/4-band MinHash construction (q23's oracle
  * form), so the end-to-end audit — including which near-dup pairs the
  * bands DID and DID NOT surface — is hash-pinned, not just row-counted.
  * CurationLshSpec separately pins the variant's precision (exactly 1
  * by construction: candidates pass exact verification) and measured
  * recall vs the exact pipeline on the gate corpus.
  */
object Round103Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val nHashes = 8
  private val bandSize = 2

  // ---------------------------------------- LSH-backed curation audit
  private val q530 = QueryDef(
    "q530_curation_lsh",
    (s, dir) => graft.pipelines.CorpusCuration.audit(
      t(s, dir, "documents"),
      graft.pipelines.CorpusCuration.Config(
        candidates = graft.pipelines.CorpusCuration.NearDupCandidates
          .MinHashLsh(nHashes, bandSize))),
    Some {
      val hs = (0 until nHashes)
        .map(j => s"min(substr(md5('$j:' || s), 1, 15)) AS h$j").mkString(", ")
      val bandList = (0 until nHashes / bandSize)
        .map(b => s"md5('band$b:' || h${b * bandSize} || h${b * bandSize + 1})")
        .mkString(", ")
      s"""WITH norm AS (
        SELECT doc_id, trim(regexp_replace(strip_accents(lower(text)), ' +', ' ', 'g')) AS ntext
        FROM documents),
      tok AS (SELECT doc_id, string_split(ntext,' ') AS tk FROM norm),
      wc AS (SELECT doc_id, w, count(*) c
             FROM (SELECT doc_id, unnest(tk) w FROM tok) GROUP BY doc_id, w),
      qual AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) n_words,
          (CAST(sum(c) AS BIGINT) >= 10
           AND CAST(max(c) AS DOUBLE)/sum(c) < 0.2
           AND CAST(sum(c) - count(*) AS DOUBLE)/sum(c) < 0.8) AS q_keep
        FROM wc GROUP BY doc_id),
      ex AS (
        SELECT n.doc_id,
          row_number() OVER (PARTITION BY md5(ntext) ORDER BY n.doc_id) > 1 AS is_exact_dup
        FROM norm n JOIN qual USING (doc_id) WHERE q_keep),
      surv AS (SELECT doc_id FROM ex WHERE NOT is_exact_dup),
      sh AS (
        SELECT DISTINCT t.doc_id,
          unnest(list_transform(range(1, greatest(len(tk)-1, 1)),
            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
        FROM tok t JOIN surv USING (doc_id) WHERE len(tk) >= 3),
      sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
      sig AS (SELECT doc_id, $hs FROM sh GROUP BY doc_id),
      bands AS (SELECT doc_id, unnest([$bandList]) AS bkey FROM sig),
      cand AS (
        SELECT DISTINCT a.doc_id da, b.doc_id db
        FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
      pairs AS (
        SELECT da, db, count(*) common
        FROM cand
        JOIN sh a ON a.doc_id = da
        JOIN sh b ON b.doc_id = db AND a.s = b.s
        GROUP BY da, db),
      near AS (
        SELECT DISTINCT db AS doc_id FROM pairs
        JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        WHERE CAST(common AS DOUBLE)/(sa.n + sb.n - common) >= 0.5)
      SELECT q.doc_id, q.n_words, q.q_keep,
        coalesce(ex.is_exact_dup, FALSE) AS is_exact_dup,
        (near.doc_id IS NOT NULL) AS is_near_dup,
        (q.q_keep AND NOT coalesce(ex.is_exact_dup, FALSE) AND near.doc_id IS NULL) AS kept
      FROM qual q
      LEFT JOIN ex ON q.doc_id = ex.doc_id
      LEFT JOIN near ON q.doc_id = near.doc_id
      ORDER BY q.doc_id"""
    },
    covers = Seq("T-curation-lsh"))

  val all: Seq[QueryDef] = Seq(q530)
}
