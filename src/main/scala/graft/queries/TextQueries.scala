package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Training-data pipeline operators over `documents` / `embeddings`:
  * exact + near deduplication (hash, MinHash+LSH, SimHash, n-gram
  * Jaccard), text analysis (quality stats, language-id heuristic,
  * token counting, fingerprinting) and embedding similarity search
  * (brute-force cosine top-k + an LSH-bucketed variant).
  *
  * Scale design: every near-dup path is inverted-index shaped (shingle
  * → doc postings → candidate pairs) rather than all-pairs, so the
  * shuffle volume is O(postings), not O(n²); the all-pairs cosine is
  * explicitly the small-query-set baseline with the bucketed variant
  * as the 100 TB path.
  *
  * Determinism: hashes are md5 hex strings (identical in Spark and
  * DuckDB); MinHash compares hex strings lexicographically so no
  * integer conversion is needed; doubles come from exact integer
  * counts or identical IEEE expression trees.
  */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** documents/embeddings ship as one small parquet file → one input
    * partition, which would serialize the md5/shingle-heavy compute on
    * a single core. Spread rows across the cluster first; results are
    * partitioning-independent (everything aggregates + totally
    * orders). At real scale the scan has natural parallelism and this
    * becomes a no-op-sized shuffle.
    */
  private def spread(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  /** Word tokens (documents.text is single-space separated). */
  private def toks(c: Column): Column = split(c, " ")

  /** Word-3-gram shingle postings per doc: (doc_id, s). NOT deduped —
    * every consumer aggregates with duplicate-insensitive functions
    * (min for MinHash signatures, collect_set/countDistinct for
    * Jaccard), so a standalone distinct would only add a shuffle.
    *
    * Uses the native [[graft.functions.WordShingles]] expression (one
    * byte scan + contiguous slices per row, fused in codegen) —
    * byte-identical to the split/transform/concat_ws HOF chain it
    * replaced (WordShinglesSpec pins the equivalence; a shingle of
    * single-space-joined words IS a contiguous span of the original).
    * Docs with fewer than 3 words yield an empty array and vanish in
    * the explode, matching the old size filter.
    */
  /** DISTINCT (doc_id, s) by construction: the dedup happens in the
    * per-row `array_distinct` (O(shingles) in the scan task) instead
    * of leaving duplicate postings for every consumer to re-dedup at
    * shuffle level — the SQL twin below is `SELECT DISTINCT` for the
    * same reason. Consumers rely on this: `jaccardPairsFrom`'s sizes
    * use a plain count, q47 joins the postings without re-distincting.
    */
  private def shingles(d: DataFrame): DataFrame =
    d.select(
      col("doc_id"),
      explode(array_distinct(
        graft.functions.WordShingles(d.sparkSession, col("text"), 3))).as("s"))

  /** DuckDB twin of [[shingles]] as a CTE body. */
  private val shinglesSql: String =
    """toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       sh AS (SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
              FROM toksrc WHERE len(tk) >= 3)"""

  // ---------------------------------------------------------------- dedup: exact
  private val q21 = QueryDef(
    "q21_dedup_exact",
    (s, dir) => {
      val d = t(s, dir, "documents")
      d.groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_exact_dups"),
          countDistinct(md5(lower(regexp_replace(col("text"), " +", " "))))
            .as("n_unique_norm"))
        .orderBy("lang")
    },
    Some("""SELECT lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique,
      CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
      CAST(COUNT(DISTINCT md5(lower(regexp_replace(text, ' +', ' ', 'g')))) AS BIGINT) AS n_unique_norm
      FROM documents GROUP BY lang ORDER BY lang"""),
    covers = Seq("DEDUP-exact"))

  // ---------------------------------------------------------------- dedup: n-gram jaccard
  // Inverted-index near-dup: shingle postings → candidate pairs →
  // exact Jaccard. Only docs sharing ≥1 shingle ever pair up.
  /** Shingle postings as q22/q23 consume them — factored out so
    * composers (q291 precision/recall) can build them ONCE and feed
    * both pipelines instead of paying the explode twice.
    */
  private[queries] def shinglePostings(s: SparkSession, dir: String): DataFrame =
    shingles(spread(s, t(s, dir, "documents")))

  /** q22's exact-Jaccard pair pipeline over prebuilt postings.
    * Contract: `sh` is DISTINCT per (doc_id, s) — [[shinglePostings]]
    * guarantees it — so the size count needs no distinct pass.
    */
  private[queries] def jaccardPairsFrom(sh: DataFrame): DataFrame = {
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      // Postings-list pair expansion: group each shingle's (sorted,
      // deduped) doc list and emit its pairs with the codegen'd
      // OrderedPairs expression — one shuffle less than the
      // self-join form, no hash build, no interpreted per-pair HOFs.
      // Shingles shared by >1000 docs are non-discriminative
      // boilerplate; the cap bounds the quadratic expansion at scale
      // (never fires on this corpus: max posting list is ~25, so the
      // oracle join stays equivalent).
      val ds = col("ds")
      val pairs = sh.groupBy("s")
        .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(ds).between(2, 1000))
        .select(explode(graft.functions.OrderedPairs(sh.sparkSession, ds)).as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("common"))
      // SHUFFLE_HASH pins the hash build to the O(docs) sizes side:
      // Catalyst cannot estimate the OrderedPairs explode (Generate
      // keeps its child's stats), UNDERESTIMATES the quadratic pair
      // frame, and on dense corpora tries to BROADCAST it — a driver
      // collect that aborted q105's sf1 run (round-9 decade-up audit)
      pairs
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")
          .hint("shuffle_hash"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")
          .hint("shuffle_hash"), "doc_b")
        .withColumn("jaccard",
          col("common").cast("double") / (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= 0.4)
        .select("doc_a", "doc_b", "common", "na", "nb", "jaccard")
        .orderBy("doc_a", "doc_b")
  }

  private val q22 = QueryDef(
    "q22_ngram_jaccard",
    (s, dir) =>
      // postings feed both the sizes and the pair expansion — one
      // explode, materialized once
      jaccardPairsFrom(shinglePostings(s, dir).persist()),
    Some(s"""WITH $shinglesSql,
      sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(COUNT(*) AS BIGINT) AS common
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT doc_a, doc_b, common, sa.n AS na, sb.n AS nb,
             CAST(common AS DOUBLE) / (sa.n + sb.n - common) AS jaccard
      FROM pairs
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.4
      ORDER BY doc_a, doc_b"""),
    covers = Seq("DEDUP-jaccard"))

  // ---------------------------------------------------------------- dedup: MinHash + LSH
  // 8 MinHash functions (min md5 over salted shingles — hex strings
  // compare like the underlying 128-bit ints), banded 2×4: candidate
  // pairs share ≥1 band. Postings-shaped, no all-pairs stage.
  private val nHashes = 8
  private val bandSize = 2

  /** q23's banded-LSH candidate pipeline over prebuilt postings. */
  private[queries] def lshCandidatesFrom(s: SparkSession, sh: DataFrame): DataFrame = {
      // Whole signature in ONE custom DeclarativeAggregate buffer
      // (graft.functions.MinHashSignature) — the oracle below proves
      // it equals nHashes independent min(md5) aggregates.
      val sig = sh.groupBy("doc_id")
        .agg(graft.functions.MinHashSignature(s, col("s"), nHashes).as("sig"))
        .select(col("doc_id") +:
          (0 until nHashes).map(j => element_at(col("sig"), j + 1).as(s"h$j")): _*)
      val bandCols = (0 until nHashes / bandSize).map { b =>
        md5(concat(lit(s"band$b:"),
          col(s"h${b * bandSize}"), col(s"h${b * bandSize + 1}")))
      }
      val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bkey"))
      bands.as("a")
        .join(bands.as("b"),
          col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared_bands"))
        .orderBy("doc_a", "doc_b")
  }

  private val q23 = QueryDef(
    "q23_minhash_lsh",
    (s, dir) => lshCandidatesFrom(s, shinglePostings(s, dir)),
    Some {
      val hs = (0 until nHashes)
        .map(j => s"min(substr(md5('$j:' || s), 1, 15)) AS h$j").mkString(", ")
      val bandList = (0 until nHashes / bandSize)
        .map(b => s"md5('band$b:' || h${b * bandSize} || h${b * bandSize + 1})")
        .mkString(", ")
      s"""WITH $shinglesSql,
      sig AS (SELECT doc_id, $hs FROM sh GROUP BY doc_id),
      bands AS (SELECT doc_id, unnest([$bandList]) AS bkey FROM sig)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS shared_bands
      FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
      GROUP BY 1, 2 ORDER BY doc_a, doc_b"""
    },
    covers = Seq("DEDUP-minhash"))

  // ---------------------------------------------------------------- dedup: SimHash
  // 16-bit SimHash: bit k of a token's md5 (low bit of hex digit k+1)
  // votes ±1; the sign of the vote sum per bit forms the signature.
  // Docs pair when signatures are identical (Hamming 0).
  private val simBits = 16

  private val q24 = QueryDef(
    "q24_simhash",
    (s, dir) => {
      // per-ROW signature via array HOFs — no explode, so the only
      // shuffle left is the tiny signature groupBy: at corpus scale
      // the old token-level explode+groupBy moved |tokens| rows
      // through an exchange to compute what is a per-document
      // function. md5 per token computed once (its own projection),
      // then 16 integer vote folds over the hash array; votes are
      // order-independent integer sums, so the signature is
      // bit-identical to the exploded form and the SQL oracle.
      val d = spread(s, t(s, dir, "documents"))
      val withHashes = d.select(col("doc_id"),
        transform(toks(col("text")), tok => md5(tok)).as("hs"))
      val sim = (0 until simBits).map { k =>
        val vote = aggregate(col("hs"), lit(0), (acc, h) =>
          acc + when(
            (instr(lit("0123456789abcdef"), substring(h, k + 1, 1)) - 1)
              .bitwiseAND(1) === 1, 1).otherwise(-1))
        when(vote > 0, lit(1L << k)).otherwise(lit(0L))
      }.reduce(_ + _)
      val sigs = withHashes.select(col("doc_id"), sim.as("simhash"))
      val grouped = sigs.groupBy("simhash")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))
      grouped.filter(col("n_docs") > 1)
        .select("simhash", "n_docs", "min_doc")
        .orderBy("simhash")
    },
    Some {
      val vs = (0 until simBits).map(k =>
        s"SUM(CASE WHEN (strpos('0123456789abcdef', substr(md5(tok), ${k + 1}, 1)) - 1) & 1 = 1 THEN 1 ELSE -1 END) AS v$k"
      ).mkString(", ")
      val sim = (0 until simBits).map(k =>
        s"CASE WHEN v$k > 0 THEN ${1L << k} ELSE 0 END").mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      votes AS (SELECT doc_id, $vs FROM tok GROUP BY doc_id),
      sigs AS (SELECT doc_id, CAST($sim AS BIGINT) AS simhash FROM votes)
      SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(doc_id) AS BIGINT) AS min_doc
      FROM sigs GROUP BY simhash HAVING COUNT(*) > 1 ORDER BY simhash"""
    },
    covers = Seq("DEDUP-simhash"))

  // ---------------------------------------------------------------- text quality stats
  private val q25 = QueryDef(
    "q25_text_stats",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val tk = toks(col("text"))
      val stop = size(filter(tk,
        tok => tok.isin("the", "a", "and", "of", "to")))
      d.select(
          col("lang"),
          length(col("text")).as("chars"),
          size(tk).as("n_tokens"),
          stop.as("n_stop"))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("chars")).as("total_chars"),
          sum(col("n_tokens")).as("total_tokens"),
          (sum(col("chars")).cast("double") / sum(col("n_tokens")))
            .as("avg_token_len"),
          (sum(col("n_stop")).cast("double") / sum(col("n_tokens")))
            .as("stopword_ratio"),
          sum(when(col("n_tokens") >= 50, 1).otherwise(0)).as("n_long_docs"))
        .orderBy("lang")
    },
    Some("""WITH d AS (
        SELECT lang, length(text) AS chars,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS n_stop
        FROM documents)
      SELECT lang,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(chars) AS BIGINT) AS total_chars,
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        CAST(SUM(chars) AS DOUBLE) / SUM(n_tokens) AS avg_token_len,
        CAST(SUM(n_stop) AS DOUBLE) / SUM(n_tokens) AS stopword_ratio,
        CAST(SUM(CASE WHEN n_tokens >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_long_docs
      FROM d GROUP BY lang ORDER BY lang"""),
    covers = Seq("TEXT-quality"))

  // ---------------------------------------------------------------- language-id heuristic
  // Marker-stopword n-gram heuristic; the CASE order is part of the
  // contract (first match wins in both engines).
  private val q26 = QueryDef(
    "q26_lang_id",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val padded = concat(lit(" "), lower(col("text")), lit(" "))
      def has(words: String*): Column =
        words.map(w => padded.contains(s" $w ")).reduce(_ || _)
      val pred = when(has("der", "und", "nicht", "das"), "de")
        .when(has("el", "los", "las", "una"), "es")
        .when(has("le", "les", "des", "une"), "fr")
        .when(has("de", "het", "een", "niet"), "nl")
        .when(has("the", "and", "of", "is"), "en")
        .otherwise("unknown")
      d.select(col("lang"), pred.as("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    },
    Some {
      def has(words: Seq[String]): String =
        words.map(w => s"contains(' ' || lower(text) || ' ', ' $w ')")
          .mkString("(", " OR ", ")")
      s"""SELECT lang,
        CASE WHEN ${has(Seq("der", "und", "nicht", "das"))} THEN 'de'
             WHEN ${has(Seq("el", "los", "las", "una"))} THEN 'es'
             WHEN ${has(Seq("le", "les", "des", "une"))} THEN 'fr'
             WHEN ${has(Seq("de", "het", "een", "niet"))} THEN 'nl'
             WHEN ${has(Seq("the", "and", "of", "is"))} THEN 'en'
             ELSE 'unknown' END AS pred_lang,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2 ORDER BY lang, pred_lang"""
    },
    covers = Seq("TEXT-langid"))

  // ---------------------------------------------------------------- token counting
  // BPE-ish regex token counting: words / numbers / single symbols.
  private val q27 = QueryDef(
    "q27_token_count",
    (s, dir) => {
      val d = spread(s, t(s, dir, "documents"))
      val bpeish = size(regexp_extract_all(
        lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
      d.groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(bpeish).as("total_bpeish_tokens"),
          sum(size(toks(col("text")))).as("total_ws_tokens"),
          max(bpeish).as("max_doc_tokens"),
          (sum(bpeish).cast("double") / count(lit(1))).as("avg_doc_tokens"))
        .orderBy("source")
    },
    Some("""SELECT source,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS total_bpeish_tokens,
      CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
      CAST(MAX(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS INTEGER) AS max_doc_tokens,
      CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS DOUBLE) / COUNT(*) AS avg_doc_tokens
      FROM documents GROUP BY source ORDER BY source"""),
    covers = Seq("TEXT-tokens"))

  // ---------------------------------------------------------------- fingerprinting
  // Rolling 5-char shingle fingerprint = lexicographic min of shingle
  // md5s — a winnowing-style document signature, computed without an
  // explode via array HOFs.
  private val q28 = QueryDef(
    "q28_fingerprint",
    (s, dir) => {
      val d = spread(s, t(s, dir, "documents"))
      val fp = array_min(transform(
        sequence(lit(1), length(col("text")) - 4),
        i => md5(col("text").substr(i, lit(5)))))
      d.filter(length(col("text")) >= 5)
        .select(col("doc_id"), fp.as("fingerprint"))
        .groupBy("fingerprint")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("min_doc"))
        .orderBy("fingerprint")
    },
    Some("""WITH fp AS (
        SELECT doc_id,
          list_aggregate(list_transform(range(1, greatest(length(text) - 3, 1)),
            i -> md5(substr(text, i, 5))), 'min') AS fingerprint
        FROM documents WHERE length(text) >= 5)
      SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(MIN(doc_id) AS BIGINT) AS min_doc
      FROM fp GROUP BY fingerprint ORDER BY fingerprint"""),
    covers = Seq("TEXT-fingerprint"))

  // ---------------------------------------------------------------- similarity: brute-force cosine top-k
  /** dot(a, b) in double, sequential over elements — identical IEEE
    * evaluation order in Spark's `aggregate` fold and DuckDB's
    * `list_sum`.
    */
  private val q29 = QueryDef(
    "q29_cosine_topk",
    (s, dir) => {
      val e = spread(s, t(s, dir, "embeddings"))
      // query pool capped at SamplePools.AnnQueryPool (round 6): the
      // scan side stays the FULL corpus — that's the point of the
      // exact baseline — but the pool no longer grows with it, so the
      // gate is O(pool · corpus), linear in the corpus
      val q = e.filter(col("vec_id") % 50 === 0 &&
          col("vec_id") < lit(50L * SamplePools.AnnQueryPool))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = e.select(
        col("vec_id").as("n_id"), col("label").as("n_label"),
        col("embedding").as("n_emb"))
      val cos = graft.functions.CosineSimilarity(s, col("q_emb"), col("n_emb"))
      val w = Window.partitionBy("q_id").orderBy(desc("cos"), asc("n_id"))
      c.crossJoin(broadcast(q))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cos", cos)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("n_id"), col("n_label"), col("cos"),
          col("rk").cast("long").as("rk"))
        .orderBy("q_id", "rk")
    },
    Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
                       FROM embeddings
                       WHERE vec_id % 50 = 0
                         AND vec_id < ${50L * SamplePools.AnnQueryPool}),
      c AS (SELECT vec_id AS n_id, label AS n_label, embedding AS n_emb FROM embeddings),
      scored AS (
        SELECT q_id, n_id, n_label,
          list_sum(list_transform(list_zip(q_emb, n_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
          (sqrt(list_sum(list_transform(list_zip(q_emb, q_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) *
           sqrt(list_sum(list_transform(list_zip(n_emb, n_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))) AS cos
        FROM c, q WHERE q_id <> n_id),
      ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
                 FROM scored)
      SELECT q_id, n_id, n_label, cos, rk FROM ranked WHERE rk <= 5
      ORDER BY q_id, rk"""),
    covers = Seq("SIM-brute"))

  // ---------------------------------------------------------------- similarity: LSH-bucketed ANN
  // Scale path: partition vectors by the sign pattern of 4 fixed
  // dimensions (16 buckets); search only within the query's bucket.
  // At 100 TB the bucket becomes the shuffle/partition key and each
  // bucket is searched independently.
  private val q30 = QueryDef(
    "q30_cosine_ann_bucketed",
    (s, dir) => {
      val e = spread(s, t(s, dir, "embeddings"))
      def bucketOf(emb: Column): Column =
        concat(Seq(1, 9, 17, 25).map(d =>
          when(element_at(emb, d) >= 0, "1").otherwise("0")): _*)
      val b = e.select(
        col("vec_id"), col("label"), col("embedding"),
        bucketOf(col("embedding")).as("bucket"))
      // same AnnQueryPool cap as q29 — the bucket join already bounds
      // the scan side; the cap bounds the probe side too
      val q = b.filter(col("vec_id") % 50 === 0 &&
          col("vec_id") < lit(50L * SamplePools.AnnQueryPool))
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("bucket"))
      val c = b.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("bucket"))
      val cos = graft.functions.CosineSimilarity(s, col("q_emb"), col("n_emb"))
      // per-query top-3 via the custom bounded-heap operator (see
      // q58/graft.plans.TopKPerKey) — no full sort of each bucket's
      // candidate list
      val scored = q.join(c, Seq("bucket"))
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cos", cos)
        .select(col("bucket"), col("q_id"), col("n_id"), col("cos"))
      graft.plans.TopKPerKey.perKey(scored, Seq("q_id"),
          Seq(desc("cos"), asc("n_id")), 3, rankName = "rk")
        .orderBy("q_id", "rk")
    },
    Some(s"""WITH b AS (
        SELECT vec_id, embedding,
          (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END) ||
          (CASE WHEN embedding[9] >= 0 THEN '1' ELSE '0' END) ||
          (CASE WHEN embedding[17] >= 0 THEN '1' ELSE '0' END) ||
          (CASE WHEN embedding[25] >= 0 THEN '1' ELSE '0' END) AS bucket
        FROM embeddings),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket FROM b
            WHERE vec_id % 50 = 0
              AND vec_id < ${50L * SamplePools.AnnQueryPool}),
      c AS (SELECT vec_id AS n_id, embedding AS n_emb, bucket FROM b),
      scored AS (
        SELECT q.bucket, q_id, n_id,
          list_sum(list_transform(list_zip(q_emb, n_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
          (sqrt(list_sum(list_transform(list_zip(q_emb, q_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))) *
           sqrt(list_sum(list_transform(list_zip(n_emb, n_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))))) AS cos
        FROM q JOIN c USING (bucket) WHERE q_id <> n_id),
      ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
                 FROM scored)
      SELECT bucket, q_id, n_id, cos, rk FROM ranked WHERE rk <= 3
      ORDER BY q_id, rk"""),
    covers = Seq("SIM-ann"))

  // ---------------------------------------------------------------- dedup: LSH → exact verify
  // The complete near-dup decision pipeline: MinHash/LSH proposes
  // candidate pairs (sub-quadratic), exact Jaccard verifies them, and
  // the keep/drop decision falls out — precision of the sketch is
  // visible in the is_dup column. Corpus-level removal on top of these
  // pairs lives in graft.dedup.Dedup (DedupSpec).
  private val q47 = QueryDef(
    "q47_minhash_verified",
    (s, dir) => {
      // the postings feed both the sketch and the verify stage — one
      // explode, materialized once
      val sh = shingles(spread(s, t(s, dir, "documents"))).persist()
      // candidates via banded MinHash (as q23)
      val sig = sh.groupBy("doc_id")
        .agg(graft.functions.MinHashSignature(s, col("s"), nHashes).as("sig"))
        .select(col("doc_id") +:
          (0 until nHashes).map(j => element_at(col("sig"), j + 1).as(s"h$j")): _*)
      val bandCols = (0 until nHashes / bandSize).map { b =>
        md5(concat(lit(s"band$b:"),
          col(s"h${b * bandSize}"), col(s"h${b * bandSize + 1}")))
      }
      val bands = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bkey"))
      // cand feeds both the verify restriction and the final join;
      // persisting it keeps the MinHash aggregate single-pass
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("shared_bands"))
        .persist()
      // Exact verification restricted to candidate docs — that's the
      // entire economics of LSH→verify: the sketch proposes o(n²)
      // pairs, so the exact Jaccard pass touches only their postings
      // (broadcast semi-join keeps the narrow shape), never the full
      // corpus × corpus co-shingle expansion.
      val candDocs = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      // sh is DISTINCT per (doc_id, s) by construction (shingles), so
      // sizes need no distinct pass and the co-shingle join needs no
      // per-side re-distinct — three shuffle-level dedups removed
      val shCand = sh.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
      val sizes = shCand.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val common = shCand.select(col("doc_id").as("doc_a"), col("s"))
        .join(shCand.select(col("doc_id").as("doc_b"), col("s")), "s")
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      cand
        .join(common, Seq("doc_a", "doc_b"), "left")
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard",
          coalesce(col("common"), lit(0L)).cast("double") /
            (col("na") + col("nb") - coalesce(col("common"), lit(0L))))
        .withColumn("is_dup", col("jaccard") >= 0.4)
        .select("doc_a", "doc_b", "shared_bands", "jaccard", "is_dup")
        .orderBy("doc_a", "doc_b")
    },
    Some {
      val hs = (0 until nHashes)
        .map(j => s"min(substr(md5('$j:' || s), 1, 15)) AS h$j").mkString(", ")
      val bandList = (0 until nHashes / bandSize)
        .map(b => s"md5('band$b:' || h${b * bandSize} || h${b * bandSize + 1})")
        .mkString(", ")
      s"""WITH $shinglesSql,
      sig AS (SELECT doc_id, $hs FROM sh GROUP BY doc_id),
      bands AS (SELECT doc_id, unnest([$bandList]) AS bkey FROM sig),
      cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      CAST(COUNT(*) AS BIGINT) AS shared_bands
               FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      sizes AS (SELECT doc_id, CAST(COUNT(DISTINCT s) AS BIGINT) AS n FROM sh GROUP BY 1),
      common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                        CAST(COUNT(DISTINCT a.s) AS BIGINT) AS common
                 FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
      SELECT c.doc_a, c.doc_b, c.shared_bands,
        CAST(COALESCE(cm.common, 0) AS DOUBLE) / (sa.n + sb.n - COALESCE(cm.common, 0)) AS jaccard,
        CAST(COALESCE(cm.common, 0) AS DOUBLE) / (sa.n + sb.n - COALESCE(cm.common, 0)) >= 0.4 AS is_dup
      FROM cand c
      LEFT JOIN common cm ON c.doc_a = cm.doc_a AND c.doc_b = cm.doc_b
      JOIN sizes sa ON c.doc_a = sa.doc_id
      JOIN sizes sb ON c.doc_b = sb.doc_id
      ORDER BY c.doc_a, c.doc_b"""
    },
    covers = Seq("DEDUP-minhash", "DEDUP-jaccard"))

  val all: Seq[QueryDef] =
    Seq(q21, q22, q23, q24, q25, q26, q27, q28, q29, q30, q47)
}
