package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables
import graft.dedup.BloomDedup
import graft.functions.{StripAccents, WordShingles}

/** Round-3 gate additions (q97–q134).
  *
  * Corpus/training-data: Gopher repetition filters, StripAccents
  * normalization, bloom-prefiltered dedup, systematic weighted
  * sampling, vocabulary + OOV + coverage, containment near-dup, PQ
  * ANN, end-to-end curation audit, incremental admission,
  * decontamination, source drift, collocation lift, media resize.
  *
  * Relational/analytic tail: star join, windowed distinct + quantiles,
  * full/right outer, EWMA, constraints suite, mergeable histogram,
  * snapshot diff, bool aggs, NOT IN 3VL, dynamic pivot, as-of
  * tolerance, outer explode, tumbling/hopping window(), JSON
  * quarantine, TPC-H Q17/Q21 decorrelations, relational division,
  * null-aggregate matrix, funnel, cohort retention, calendar edges.
  *
  * Determinism rules as everywhere (QueryDef scaladoc): doubles from
  * exact integer/DECIMAL sums through ONE shared IEEE tree, BIGINT
  * casts on the DuckDB side, total ORDER BY.
  */
object Round4Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // --------------------------------------------- repetition quality filter
  // Gopher-style repetition stats per document: duplicate-word
  // fraction, most-common-word share, most-common-bigram share, and
  // the keep/drop verdict a pretraining cleaning pass would apply.
  // All ratios are single divisions of exact integer counts, so the
  // doubles (and the threshold comparisons on them) are bit-identical
  // across engines. One explode for words, one for bigrams; both
  // aggregate before the join, so the shuffle carries per-doc stats,
  // not tokens.
  private val q97 = QueryDef(
    "q97_repetition",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val tk = d.select(col("doc_id"), split(col("text"), " ").as("tk"))
      val wc = tk.select(col("doc_id"), explode(col("tk")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val stats = wc.groupBy("doc_id").agg(
        sum("c").as("n_words"),
        count(lit(1)).as("n_distinct"),
        max("c").as("max_word"))
      val bigrams = tk.select(col("doc_id"),
        explode(when(size(col("tk")) >= 2,
          transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
          .otherwise(array())).as("bg"))
      val bstats = bigrams.groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("max_bigram"), sum("c").as("n_bigrams"))
      val repFrac = (col("n_words") - col("n_distinct")).cast("double") / col("n_words")
      val topWord = col("max_word").cast("double") / col("n_words")
      val topBigram = col("max_bigram").cast("double") / col("n_bigrams")
      stats.join(bstats, "doc_id")
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          col("max_word"), col("max_bigram"),
          repFrac.as("rep_word_frac"),
          topWord.as("top_word_frac"),
          topBigram.as("top_bigram_frac"),
          (topWord < 0.2 && repFrac < 0.8).as("keep"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents
      ), wc AS (
        SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w
      ), stats AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) n_words, count(*) n_distinct,
               CAST(max(c) AS BIGINT) max_word
        FROM wc GROUP BY doc_id
      ), big AS (
        SELECT doc_id, bg, count(*) c FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(string_split(text,' '))),
              i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1])) AS bg
          FROM documents) GROUP BY doc_id, bg
      ), bigstats AS (
        SELECT doc_id, CAST(max(c) AS BIGINT) max_bigram, CAST(sum(c) AS BIGINT) n_bigrams
        FROM big GROUP BY doc_id
      )
      SELECT s.doc_id, n_words, n_distinct, max_word, max_bigram,
        CAST(n_words - n_distinct AS DOUBLE)/n_words AS rep_word_frac,
        CAST(max_word AS DOUBLE)/n_words AS top_word_frac,
        CAST(max_bigram AS DOUBLE)/n_bigrams AS top_bigram_frac,
        (CAST(max_word AS DOUBLE)/n_words < 0.2
          AND CAST(n_words - n_distinct AS DOUBLE)/n_words < 0.8) AS keep
      FROM stats s JOIN bigstats b USING (doc_id)
      ORDER BY s.doc_id"""),
    covers = Seq("T-quality-repetition"))

  // --------------------------------------------------- text normalization
  // Accent stripping + case folding + whitespace collapse — the
  // canonicalization pass before dedup/language-id. The accented
  // input is planted deterministically (translate on a substring) so
  // the native StripAccents expression is exercised against DuckDB's
  // built-in strip_accents on identical text.
  private val q98 = QueryDef(
    "q98_normalize_text",
    (s, dir) => {
      val messy = t(s, dir, "documents").select(col("doc_id"),
        concat(translate(upper(substring(col("text"), 1, 60)), "AEO", "ÁÉÖ"),
          lit("  ")).as("raw"))
      val norm = trim(regexp_replace(StripAccents(s, lower(col("raw"))), " +", " "))
      messy.select(col("doc_id"), col("raw"), norm.as("norm"),
          (length(col("raw")) - length(norm)).cast(LongType).as("removed"))
        .orderBy("doc_id")
    },
    Some("""WITH messy AS (
        SELECT doc_id,
          translate(upper(substr(text,1,60)), 'AEO', 'ÁÉÖ') || '  ' AS raw
        FROM documents)
      SELECT doc_id, raw,
        trim(regexp_replace(strip_accents(lower(raw)), ' +', ' ', 'g')) AS norm,
        CAST(len(raw) -
          len(trim(regexp_replace(strip_accents(lower(raw)), ' +', ' ', 'g'))) AS BIGINT)
          AS removed
      FROM messy ORDER BY doc_id"""),
    covers = Seq("T-normalize", "P2", "P3"))

  // ------------------------------------------------- bloom-prefilter dedup
  // Which documents of an incoming batch (doc_id % 5 = 0) are NOT
  // already in the corpus (the rest)? BloomDedup: corpus-side bloom
  // filter prunes the batch before an exact verify join — result is
  // bit-identical to the plain NOT EXISTS the oracle runs.
  private val q99 = QueryDef(
    "q99_bloom_prefilter",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = d.filter(col("doc_id") % 5 =!= 0)
      val batch = d.filter(col("doc_id") % 5 === 0)
      BloomDedup.newRows(batch, corpus, Seq("text"), expectedItems = 100000L)
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, n_chars FROM documents b
      WHERE doc_id % 5 = 0 AND NOT EXISTS (
        SELECT 1 FROM documents c WHERE c.doc_id % 5 <> 0 AND c.text = b.text)
      ORDER BY doc_id"""),
    covers = Seq("T-dedup-bloom", "S7"))

  // ------------------------------------------- deterministic weighted sample
  // Systematic sampling proportional to n_chars, ~5 docs per source:
  // walk each stratum in doc_id order accumulating weight and emit
  // every row whose cumulative weight crosses a multiple of
  // total/5 — weight-proportional, reproducible (no RNG), and
  // integer-exact so it hash-matches across engines. The
  // curated-corpus twin of q54's uniform hash sampling.
  private val q100 = QueryDef(
    "q100_weighted_sample",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val wCum = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("source")
      d.select(col("doc_id"), col("source"), col("n_chars"),
          sum("n_chars").over(wCum).as("cum"),
          sum("n_chars").over(wAll).as("total"))
        .withColumn("step", expr("total DIV 5 + 1"))
        .filter(expr("cum DIV step > (cum - n_chars) DIV step"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("cum"))
        .orderBy("source", "doc_id")
    },
    Some("""WITH w AS (
        SELECT doc_id, source, n_chars,
          CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS total
        FROM documents)
      SELECT doc_id, source, n_chars, cum
      FROM w WHERE cum // (total // 5 + 1) > (cum - n_chars) // (total // 5 + 1)
      ORDER BY source, doc_id"""),
    covers = Seq("T-weighted-sample", "W1"))

  // ------------------------------------------------- vocabulary construction
  // Corpus vocabulary: id by (frequency desc, term) with cumulative
  // corpus coverage — the token-id assignment step of tokenizer
  // training. The unpartitioned windows run over the POST-AGGREGATE
  // term table (tiny), not the corpus.
  private val q101 = QueryDef(
    "q101_vocab_coverage",
    (s, dir) => {
      val tc = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val tot = tc.agg(sum("c").as("t"))
      val wOrd = Window.orderBy(desc("c"), asc("w"))
      tc.crossJoin(broadcast(tot))
        .select(col("w").as("term"),
          row_number().over(wOrd).cast(LongType).as("vocab_id"),
          col("c").as("n_occurrences"),
          (sum("c").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") / col("t")).as("cum_share"))
        .orderBy("vocab_id")
    },
    Some("""WITH tok AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
      tc AS (SELECT w, CAST(count(*) AS BIGINT) c FROM tok GROUP BY w),
      tot AS (SELECT CAST(sum(c) AS BIGINT) t FROM tc),
      vocab AS (SELECT w, CAST(row_number() OVER (ORDER BY c DESC, w) AS BIGINT) AS vocab_id,
        c, CAST(sum(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM tc)
      SELECT w AS term, vocab_id, c AS n_occurrences,
        CAST(cum AS DOUBLE) / t AS cum_share
      FROM vocab, tot ORDER BY vocab_id"""),
    covers = Seq("T-vocab", "W7"))

  // ------------------------------------------------------------- OOV rate
  // Per-document out-of-vocabulary rate against the top-10 corpus
  // vocabulary — the coverage metric that drives vocab-size choices.
  // The vocab is broadcast (tiny by construction); tokens never
  // shuffle except for the per-doc count aggregate.
  private val q102 = QueryDef(
    "q102_oov_rate",
    (s, dir) => {
      val tok = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val top = tok.groupBy("w").agg(count(lit(1)).as("c"))
        .select(col("w"), row_number().over(Window.orderBy(desc("c"), asc("w"))).as("rn"))
        .filter(col("rn") <= 10)
        .select(col("w").as("vw"))
      tok.join(broadcast(top), col("w") === col("vw"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          (count(lit(1)) - count(col("vw"))).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
      tc AS (SELECT w, count(*) c FROM tok GROUP BY w),
      top AS (SELECT w FROM (SELECT w, row_number() OVER (ORDER BY c DESC, w) rn FROM tc)
              WHERE rn <= 10)
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(count(*) - count(top.w) AS BIGINT) AS n_oov,
        CAST(count(*) - count(top.w) AS DOUBLE) / count(*) AS oov_rate
      FROM tok t LEFT JOIN top ON t.w = top.w
      GROUP BY t.doc_id ORDER BY t.doc_id"""),
    covers = Seq("T-vocab", "J1"))

  // ----------------------------------------------------------- star join
  // Five-dimension star query: the fact table joins every dim
  // broadcast (each is fact/10000th the size), so the only shuffle in
  // the plan is the final group-by — the canonical warehouse shape
  // the reference pushes to Athena. Gross revenue from exact DECIMAL
  // sums.
  private val q103 = QueryDef(
    "q103_star_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val dec = DecimalType(18, 2)
      li.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .filter(col("p_size") <= 25 && col("s_acctbal") > 0)
        .groupBy(col("r_name").as("region"), col("l_returnflag").as("flag"),
          col("p_brand").as("brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("gross"))
        .orderBy("region", "flag", "brand")
    },
    Some("""SELECT r_name AS region, l_returnflag AS flag, p_brand AS brand,
        CAST(count(*) AS BIGINT) AS n_items,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_size <= 25 AND s_acctbal > 0
      GROUP BY r_name, l_returnflag, p_brand
      ORDER BY region, flag, brand"""),
    covers = Seq("J1", "A4"))

  // ----------------------------------------------- windowed distinct counts
  // COUNT(DISTINCT) as a window function — Spark's window operator
  // does not support DISTINCT aggregates, so the idiomatic form is
  // size(collect_set() OVER w): per-order distinct suppliers and
  // return flags on every line item, no self-join.
  private val q104 = QueryDef(
    "q104_windowed_distinct",
    (s, dir) => {
      val w = Window.partitionBy("l_orderkey")
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          size(collect_set(col("l_suppkey")).over(w)).cast(LongType).as("n_supp"),
          size(collect_set(col("l_returnflag")).over(w)).cast(LongType).as("n_flags"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
        CAST(count(distinct l_suppkey) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_supp,
        CAST(count(distinct l_returnflag) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_flags
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
    covers = Seq("W-distinct", "A3"))

  // ------------------------------------------------- containment near-dup
  // Shingle-containment join: containment(A→B) = |S(A)∩S(B)| / |S(A)|
  // over distinct word trigrams, via inverted-index postings (the
  // asymmetric complement of Jaccard — catches documents EMBEDDED in
  // larger ones, which symmetric similarity underweights). Pairs form
  // only where a shingle is shared, so the shuffle is
  // posting-bounded, not O(n²).
  private val q105 = QueryDef(
    "q105_containment",
    (s, dir) => {
      // postings feed both sizes and pair expansion — one explode,
      // materialized once (q22's pattern). Shared-shingle counts are
      // SYMMETRIC, so enumerate unordered pairs with array HOFs over
      // each shingle's grouped posting list (no self-join, no hash
      // build) and mirror them afterwards; only the containment
      // denominator differs per direction. The posting-size cap
      // bounds the quadratic expansion against degenerate boilerplate
      // shingles at scale (far above any list in this corpus, so the
      // oracle's self-join stays equivalent).
      // the session-cached distinct (doc_id, shingle) frame is the
      // same row set as the per-doc array_distinct explode this
      // replaced (a (doc, shingle) dup can only arise within one doc)
      val sh = GraphGateSource.cached(s, "shingle-distinct:" + dir)(
        t(s, dir, "documents").select(col("doc_id"),
          explode(graft.functions.WordShingles(s, col("text"), 3))
            .as("s")).distinct())
        .withColumnRenamed("s", "sh")
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val ds = col("ds")
      val half = sh.groupBy("sh")
        .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(ds).between(2, 100000))
        .select(explode(graft.functions.OrderedPairs(s, ds)).as("p"))
        .groupBy(col("p.a").as("a_id"), col("p.b").as("b_id"))
        .agg(count(lit(1)).as("shared"))
      val pairs = half.unionAll(half.select(
        col("b_id").as("a_id"), col("a_id").as("b_id"), col("shared")))
      val containment = col("shared").cast("double") / col("n")
      // SHUFFLE_HASH on the doc-level sizes side: Catalyst cannot
      // estimate the OrderedPairs explode (Generate keeps the child's
      // stats), so it UNDERESTIMATES the pair frame and tries to
      // BROADCAST it — at the sf1 rung that is a 1 GiB driver collect
      // (found by the round-9 decade-up audit: spark.driver
      // .maxResultSize abort). The hash hint pins the build to the
      // O(docs) side, partitioned — correct at any corpus size
      pairs.join(sizes.withColumnRenamed("doc_id", "a_id")
        .hint("shuffle_hash"), "a_id")
        .filter(containment >= 0.5)
        .select(col("a_id"), col("b_id"), col("shared"), containment.as("containment"))
        .orderBy("a_id", "b_id")
    },
    Some("""WITH sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(len(string_split(text,' ')) - 1, 1)),
          i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1]
               || ' ' || string_split(text,' ')[i+2]))) AS s
        FROM documents),
      sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) n FROM sh GROUP BY doc_id),
      pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS BIGINT) AS shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        GROUP BY a.doc_id, b.doc_id)
      SELECT a_id, b_id, shared,
        CAST(shared AS DOUBLE) / sa.n AS containment
      FROM pairs JOIN sizes sa ON a_id = sa.doc_id
      WHERE CAST(shared AS DOUBLE) / sa.n >= 0.5
      ORDER BY a_id, b_id"""),
    covers = Seq("T-dedup-containment", "J2"))

  // ------------------------------------------------------ PQ compressed ANN
  // Product-quantization ANN (similarity/PqIndex): train 8×16
  // codebooks, encode the corpus 32× smaller, ADC-generate candidates
  // from the codes alone, exact-cosine refine to top-5. k-means has
  // no SQL twin, but the trained CODEBOOK is a pure function of the
  // data — the gate is hash-gated against a dynamic oracle that
  // inlines the codebook (+ driver-side cell norms) as SQL literals
  // (AnnModelOracle.pqSql) and re-derives encode + ADC + refine +
  // baseline + recall independently in DuckDB, with the model shared
  // through the per-JVM TrainedModels cache so one training run feeds
  // both sides. The in-query recall floor stays as a semantic
  // catastrophe guard; PqIndexSpec pins recall with a fully-trained
  // book (iters=1 here keeps the gate cheap).
  private val q106 = QueryDef(
    "q106_pq_ann",
    (s, dir) => {
      import graft.similarity.PqIndex
      val emb = t(s, dir, "embeddings")
      // query pool via the AnnBaseline shared path — every-100th id
      // capped at SamplePools.AnnQueryPool (linear-in-corpus
      // baseline); the baseline itself is hash-gated as q106b
      val queries = AnnBaseline.queryPool(emb, stride = 100L)
      val book = graft.similarity.TrainedModels
        .pq(s, dir, m = 8, k = 16, iters = 1)
      val codes = PqIndex.encode(emb, "vec_id", "embedding", book)
      val pq = PqIndex.searchRefined(codes, emb, queries, book,
        "vec_id", "embedding", topK = 5, refine = 40)
        .localCheckpoint() // O(queries·k) rows; read by recall AND output
      val cosBf = graft.functions.CosineSimilarity(
        s, col("q_emb"), col("embedding"))
      val scoredAll = emb.crossJoin(broadcast(queries))
        .filter(col("q_id") =!= col("vec_id"))
        .withColumn("cos_bf", cosBf)
        .select(col("q_id"), col("vec_id").as("n_id"), col("cos_bf"))
      val bf = graft.plans.TopKPerKey.perKey(scoredAll, Seq("q_id"),
        Seq(desc("cos_bf"), asc("n_id")), 5, rankName = "bf_rk")
        .localCheckpoint() // O(queries·k) rows
      val recall = pq
        .join(bf.select(col("q_id"), col("n_id"), lit(1L).as("hit")),
          Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / 5.0)
          .as("recall5"))
        .localCheckpoint() // O(queries) rows; mean gate + output column
      // bounded-collect: one aggregated mean-recall row — the
      // semantic gate for the shape-checking iters=1 book. 0.4 is a
      // CATASTROPHE floor (broken ADC or refine scores near 0):
      // measured means are 0.51-0.68 across SFs with this one-iter
      // book; full-training quality is pinned in PqIndexSpec
      val mean = recall.agg(avg(col("recall5"))).collect()(0).getDouble(0)
      require(mean >= 0.4, f"PQ recall@5 vs brute force = $mean%.3f < 0.4")
      pq.join(recall, Seq("q_id"))
        .select(col("q_id"), col("rk"), col("n_id"), col("cos"), col("recall5"))
        .orderBy("q_id", "rk")
    },
    None,
    covers = Seq("T-ann-pq"),
    dynOracle = Some((s, dir) => AnnModelOracle.pqSql(
      graft.similarity.TrainedModels.pq(s, dir, m = 8, k = 16, iters = 1),
      stride = 100L, refine = 40, topK = 5)))

  // ---------------------------------------------------------- full outer join
  // FULL OUTER over two sparse aggregates — both sides contribute
  // unmatched keys (nulls on each side at gate scale). NULL counts are
  // kept as NULLs (outer semantics, not coalesced away); the total
  // order is on the coalesced key.
  private val q107 = QueryDef(
    "q107_full_outer",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9900)
        .groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("n_cust"))
      val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 4000)
        .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("n_supp"))
      c.join(sup, col("cnk") === col("snk"), "full_outer")
        .select(coalesce(col("cnk"), col("snk")).as("nk"),
          col("n_cust"), col("n_supp"))
        .orderBy("nk")
    },
    Some("""WITH c AS (SELECT c_nationkey nk, CAST(count(*) AS BIGINT) n_cust
               FROM customer WHERE c_acctbal > 9900 GROUP BY 1),
      s AS (SELECT s_nationkey nk, CAST(count(*) AS BIGINT) n_supp
            FROM supplier WHERE s_acctbal > 4000 GROUP BY 1)
      SELECT coalesce(c.nk, s.nk) nk, n_cust, n_supp
      FROM c FULL OUTER JOIN s ON c.nk = s.nk ORDER BY nk"""),
    covers = Seq("J-full-outer"))

  // ------------------------------------------------------------------ EWMA
  // Exponentially weighted moving average (α = 1/2) over each user's
  // last 16 event values: the frame-ordered value list folds through
  // (acc + x)/2 — a SEQUENTIAL reduction, so the IEEE tree is fixed
  // (windowed SUM would be partial-agg-order nondeterministic), and
  // dividing by 2 is exponent arithmetic (exact), so both engines
  // produce identical bits. The time-series smoothing primitive
  // alongside q07's flat rolling mean and q83's interpolation.
  private val q108 = QueryDef(
    "q108_ewma",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-15, Window.currentRow)
      val l = col("l")
      t(s, dir, "events")
        .withColumn("l", collect_list(col("value")).over(w))
        .select(col("event_id"), col("user_id"),
          aggregate(slice(l, 2, 1000), element_at(l, 1),
            (acc, x) => (acc + x) / 2).as("ewma"))
        .orderBy("user_id", "event_id")
    },
    Some("""SELECT event_id, user_id,
        list_reduce(list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 15 PRECEDING AND CURRENT ROW), (acc, x) -> (acc + x)/2) AS ewma
      FROM events ORDER BY user_id, event_id"""),
    covers = Seq("W-ewma", "W1"))

  // ------------------------------------------------ end-to-end curation
  // The full corpus-curation pipeline (pipelines/CorpusCuration):
  // normalize → repetition quality gates → exact dedup → trigram-
  // Jaccard near-dup, with the complete per-document audit trail
  // hash-matched against a single SQL re-implementation of all four
  // stages. The integration gate on top of the per-operator gates
  // (q97/q98/q21/q22).
  private val q109 = QueryDef(
    "q109_curation_pipeline",
    (s, dir) =>
      graft.pipelines.CorpusCuration.audit(t(s, dir, "documents")),
    Some("""WITH norm AS (
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
      pairs AS (
        SELECT a.doc_id da, b.doc_id db, count(*) common
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id),
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
      ORDER BY q.doc_id"""),
    covers = Seq("T-curation-pipeline"))

  // ---------------------------------------------------- constraint checking
  // Deequ-style data-quality suite: completeness, key uniqueness,
  // range, accepted values, positivity — ONE aggregation pass over the
  // fact table — plus an anti-join referential-integrity probe; the
  // report pivots out of the metric row with explode(array(struct)).
  // The declared-schema validation step of the reference's cleaner
  // (cleaners.py:229-252), as a reusable report. The uniqueness
  // constraint genuinely FAILS on this corpus (duplicate
  // (l_orderkey, l_linenumber) pairs exist) — the report shows it.
  private val q110 = QueryDef(
    "q110_constraints",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val m = li.agg(
        count(lit(1)).as("n"),
        count(col("l_shipdate")).as("ship_nonnull"),
        countDistinct(col("l_orderkey"), col("l_linenumber")).as("pk_distinct"),
        sum(when(col("l_discount").between(0, 0.1), 1).otherwise(0)).as("disc_in_range"),
        sum(when(col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)).as("flag_ok"),
        sum(when(col("l_quantity") > 0, 1).otherwise(0)).as("qty_pos"))
      val ri = li.join(t(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
      def c(name: String, actual: Column, expected: Column) =
        struct(lit(name).as("name"), actual.as("actual"), expected.as("expected"))
      m.crossJoin(ri)
        .select(explode(array(
          c("completeness_l_shipdate", col("ship_nonnull"), col("n")),
          c("uniqueness_pk", col("pk_distinct"), col("n")),
          c("range_l_discount", col("disc_in_range"), col("n")),
          c("accepted_l_returnflag", col("flag_ok"), col("n")),
          c("positive_l_quantity", col("qty_pos"), col("n")),
          c("ri_orderkey", col("orphans"), lit(0L)))).as("c"))
        .select(col("c.name"), col("c.actual"), col("c.expected"),
          (col("c.actual") === col("c.expected")).as("pass"))
        .orderBy("name")
    },
    Some("""WITH m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(count(l_shipdate) AS BIGINT) AS ship_nonnull,
          CAST(count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS pk_distinct,
          CAST(sum(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS disc_in_range,
          CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT) AS flag_ok,
          CAST(sum(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) AS BIGINT) AS qty_pos
        FROM lineitem),
      ri AS (
        SELECT CAST(count(*) AS BIGINT) AS orphans
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IS NULL)
      SELECT c.name, c.actual, c.expected, c.actual = c.expected AS pass FROM (
        SELECT 'completeness_l_shipdate' AS name, ship_nonnull AS actual, n AS expected FROM m
        UNION ALL SELECT 'uniqueness_pk', pk_distinct, n FROM m
        UNION ALL SELECT 'range_l_discount', disc_in_range, n FROM m
        UNION ALL SELECT 'accepted_l_returnflag', flag_ok, n FROM m
        UNION ALL SELECT 'positive_l_quantity', qty_pos, n FROM m
        UNION ALL SELECT 'ri_orderkey', orphans, CAST(0 AS BIGINT) FROM ri) c
      ORDER BY c.name"""),
    covers = Seq("P9-validate", "A2"))

  // ------------------------------------------------- mergeable histogram
  // Fixed-edge histogram as MERGEABLE state: per-batch partial bin
  // counts/sums (batches = user_id % 3) re-aggregate to exactly the
  // one-shot histogram the oracle computes — integer bin counts and
  // DECIMAL bin sums are associative, so the equality is bitwise. The
  // distribution-sketch analogue of q94's incremental sums: approximate
  // percentiles at any batch boundary cost O(bins), never a corpus
  // rescan.
  private val q111 = QueryDef(
    "q111_mergeable_histogram",
    (s, dir) => {
      val dec = DecimalType(18, 2)
      val binned = t(s, dir, "events").select(
        least(greatest(floor(col("value") / 25.0), lit(0)), lit(7))
          .cast(LongType).as("bin"),
        (col("user_id") % 3).as("b"),
        col("value"))
      val partial = binned.groupBy("b", "bin").agg(
        count(lit(1)).as("n"), sum(col("value").cast(dec)).cast(dec).as("total"))
      partial.groupBy("bin").agg(
          sum("n").as("n"), sum("total").cast(dec).cast("double").as("total"))
        .orderBy("bin")
    },
    Some("""SELECT CAST(least(greatest(floor(value / 25.0), 0), 7) AS BIGINT) AS bin,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1 ORDER BY 1"""),
    covers = Seq("A-hist-mergeable"))

  // ---------------------------------------------------------- snapshot diff
  // Table-version diff: FULL OUTER on the key classifies every row as
  // added / removed / changed (null-free attribute compare), emitting
  // only the delta — the inverse of applyCdc (derive a changelog FROM
  // two snapshots when the upstream has none, e.g. the reference's
  // daily full refetch). The two versions are derived deterministically
  // from customer (dropped keys, bumped balances); the `+ 10` is a
  // single IEEE add, identical bits in both engines.
  private val q112 = QueryDef(
    "q112_snapshot_diff",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val v1 = c.filter(col("c_custkey") % 13 =!= 0)
        .select(col("c_custkey").as("k1"), col("c_name").as("name1"),
          col("c_acctbal").as("bal1"))
      val v2 = c.filter(col("c_custkey") % 11 =!= 0)
        .select(col("c_custkey").as("k2"), col("c_name").as("name2"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 10)
            .otherwise(col("c_acctbal")).as("bal2"))
      v1.join(v2, col("k1") === col("k2"), "full_outer")
        .select(coalesce(col("k1"), col("k2")).as("k"),
          when(col("k1").isNull, "added")
            .when(col("k2").isNull, "removed")
            .when(col("bal1") =!= col("bal2") || col("name1") =!= col("name2"), "changed")
            .otherwise("same").as("change"),
          col("bal1").as("old_bal"), col("bal2").as("new_bal"))
        .filter(col("change") =!= "same")
        .orderBy("k")
    },
    Some("""WITH v1 AS (SELECT c_custkey k, c_name, c_acctbal
               FROM customer WHERE c_custkey % 13 <> 0),
      v2 AS (SELECT c_custkey k, c_name,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10 ELSE c_acctbal END AS c_acctbal
             FROM customer WHERE c_custkey % 11 <> 0)
      SELECT coalesce(v1.k, v2.k) AS k,
        CASE WHEN v1.k IS NULL THEN 'added'
             WHEN v2.k IS NULL THEN 'removed'
             WHEN v1.c_acctbal <> v2.c_acctbal OR v1.c_name <> v2.c_name THEN 'changed'
             ELSE 'same' END AS change,
        v1.c_acctbal AS old_bal, v2.c_acctbal AS new_bal
      FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
      WHERE v1.k IS NULL OR v2.k IS NULL
         OR v1.c_acctbal <> v2.c_acctbal OR v1.c_name <> v2.c_name
      ORDER BY k"""),
    covers = Seq("S-diff", "J-full-outer"))

  // ------------------------------------------ incremental corpus admission
  // store/DedupStore folded over three arrival batches (doc_id % 3,
  // admitted in order): bloom-prefiltered exactly-once admission whose
  // final corpus must equal the oracle's one-shot first-seen-wins
  // dedup — (arrival batch, doc_id) ordered — proving cross-batch and
  // in-batch dedup compose with the atomic state commit.
  private val q113 = QueryDef(
    "q113_incremental_admission",
    (s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val root = java.nio.file.Files.createTempDirectory("graft_admit").toString
      // filter sized ~20× the sf0.1 corpus: admission cost scales with
      // the filter's bit array (built per task, merged on the driver),
      // so size for the expected corpus, not a universal constant
      val ds = new graft.store.DedupStore(
        new graft.store.TableStore(s, root), "corpus", "text", 100000L)
      (0 to 2).foreach(b => ds.admit(s"b$b", d.filter(col("doc_id") % 3 === b)))
      ds.corpus.get.select("doc_id").orderBy("doc_id")
    },
    Some("""SELECT doc_id FROM (
        SELECT doc_id, row_number() OVER (
          PARTITION BY text ORDER BY doc_id % 3, doc_id) AS rn
        FROM documents) WHERE rn = 1 ORDER BY doc_id"""),
    covers = Seq("T-dedup-incremental", "S7"))

  // ------------------------------------------------------ boolean aggregates
  // bool_and / bool_or / count_if — the predicate-aggregate tail of
  // the scalar surface (q63 gates the bitwise twins).
  private val q114 = QueryDef(
    "q114_bool_aggs",
    (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(bool_and(col("o_totalprice") > 1000).as("all_over_1k"),
          bool_or(col("o_orderstatus") === "F").as("any_final"),
          count_if(col("o_totalprice") > 200000).as("n_big"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
        bool_and(o_totalprice > 1000) AS all_over_1k,
        bool_or(o_orderstatus = 'F') AS any_final,
        CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
        CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY 1 ORDER BY 1"""),
    covers = Seq("A-bool"))

  // ---------------------------------------------------- decontamination
  // Benchmark decontamination: training documents sharing any word
  // 7-gram with the held-out eval split (doc_id % 97 = 0) are flagged
  // with their overlap count — the n-gram contamination check every
  // pretraining pipeline runs before training. Eval grams are DISTINCT
  // and tiny → broadcast; training grams stream through the join
  // without materializing.
  private val q115 = QueryDef(
    "q115_decontamination",
    (s, dir) => {
      val d = t(s, dir, "documents")
      def grams(df: DataFrame) = df.select(col("doc_id"),
        explode(array_distinct(WordShingles(s, col("text"), 7))).as("g"))
      val evalGrams = grams(d.filter(col("doc_id") % 97 === 0))
        .select("g").distinct()
      grams(d.filter(col("doc_id") % 97 =!= 0))
        .join(broadcast(evalGrams), "g")
        .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated_grams"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
      evalg AS (
        SELECT DISTINCT unnest(list_transform(range(1, greatest(len(tk)-5, 1)),
          i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]||' '||tk[i+5]||' '||tk[i+6])) AS g
        FROM tok WHERE doc_id % 97 = 0 AND len(tk) >= 7),
      traing AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(tk)-5, 1)),
          i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4]||' '||tk[i+5]||' '||tk[i+6]))) AS g
        FROM tok WHERE doc_id % 97 <> 0 AND len(tk) >= 7)
      SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated_grams
      FROM traing t JOIN evalg e ON t.g = e.g
      GROUP BY t.doc_id ORDER BY t.doc_id"""),
    covers = Seq("T-decontamination", "J1"))

  // ------------------------------------------------------ windowed quantiles
  // Exact percentiles as WINDOW functions (no group-collapse): per-order
  // median quantity/price on every line item. Fraction choices keep the
  // interpolation bit-identical across engines: 0.5 of doubles (halving
  // is exact and round(a+b)/2 = round((a+b)/2)), 0.25 of the integer
  // quantities (dyadic interpolation of small ints is exact, the q50
  // argument).
  private val q116 = QueryDef(
    "q116_windowed_quantiles",
    (s, dir) => {
      val w = Window.partitionBy("l_orderkey")
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          percentile(col("l_quantity"), lit(0.5)).over(w).as("med_qty"),
          percentile(col("l_quantity"), lit(0.25)).over(w).as("q1_qty"),
          percentile(col("l_extendedprice"), lit(0.5)).over(w).as("med_price"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
        quantile_cont(l_quantity, 0.5) OVER (PARTITION BY l_orderkey) AS med_qty,
        quantile_cont(l_quantity, 0.25) OVER (PARTITION BY l_orderkey) AS q1_qty,
        quantile_cont(l_extendedprice, 0.5) OVER (PARTITION BY l_orderkey) AS med_price
      FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
    covers = Seq("W-quantile"))

  // ------------------------------------------------- NOT IN null semantics
  // The classic three-valued-logic footgun, pinned: NOT IN against a
  // null-free subquery behaves like an anti-join (3 customers), but a
  // single NULL in the subquery makes NOT IN UNKNOWN for every
  // non-matching row — zero results. Both engines must agree on both.
  private val q117 = QueryDef(
    "q117_not_in_nulls",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("ni_c")
      t(s, dir, "orders").createOrReplaceTempView("ni_o")
      s.sql("""SELECT
        (SELECT count(*) FROM ni_c
         WHERE c_custkey NOT IN (SELECT o_custkey FROM ni_o
                                 WHERE o_totalprice > 300000)) AS n_clean,
        (SELECT count(*) FROM ni_c
         WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 7) FROM ni_o
                                 WHERE o_totalprice > 300000)) AS n_poisoned""")
    },
    Some("""SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                               WHERE o_totalprice > 300000)) AS n_clean,
      (SELECT CAST(count(*) AS BIGINT) FROM customer
       WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 7) FROM orders
                               WHERE o_totalprice > 300000)) AS n_poisoned"""),
    covers = Seq("C-not-in-3vl"))

  // ----------------------------------------------------------- dynamic pivot
  // Pivot with DISCOVERED values: the Spark side passes no value list
  // (pivot() plans an internal distinct + sorts the values), and must
  // land on exactly the columns the oracle spells out by hand — q44
  // gates the fixed-list form.
  private val q118 = QueryDef(
    "q118_dynamic_pivot",
    (s, dir) => {
      val dec = DecimalType(18, 2)
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_nationkey") < 4)
        .groupBy(col("c_mktsegment").as("seg"))
        .pivot("n_name") // no value list: discovered + sorted by Spark
        .agg(sum(col("c_acctbal").cast(dec)).cast("double"))
        .orderBy("seg")
    },
    Some("""SELECT c_mktsegment AS seg,
        CAST(sum(CASE WHEN n_name='NATION_0' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS "NATION_0",
        CAST(sum(CASE WHEN n_name='NATION_1' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS "NATION_1",
        CAST(sum(CASE WHEN n_name='NATION_2' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS "NATION_2",
        CAST(sum(CASE WHEN n_name='NATION_3' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS "NATION_3"
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE n_nationkey < 4
      GROUP BY seg ORDER BY seg"""),
    covers = Seq("A-pivot-dynamic"))

  // ------------------------------------------------------------- right join
  // RIGHT OUTER with the dimension predicate in the JOIN condition
  // (not the WHERE clause — there it would kill the outer rows): every
  // supplier survives, nation only attaches below the key cutoff.
  private val q119 = QueryDef(
    "q119_right_join",
    (s, dir) =>
      t(s, dir, "nation")
        .join(t(s, dir, "supplier"),
          col("s_nationkey") === col("n_nationkey") && col("n_nationkey") < 10,
          "right")
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy("s_suppkey"),
    Some("""SELECT s_suppkey, s_name, n_name
      FROM nation RIGHT JOIN supplier
        ON s_nationkey = n_nationkey AND n_nationkey < 10
      ORDER BY s_suppkey"""),
    covers = Seq("J-right-outer"))

  // ------------------------------------------------- as-of with tolerance
  // Bounded-staleness as-of join: the latest purchase at-or-before each
  // click still matches ONLY within a 1-hour window — stale matches
  // yield nulls, the freshness contract real feature/enrichment joins
  // carry (q41 gates the unbounded form; same one-shuffle union+window
  // plan).
  private val q120 = QueryDef(
    "q120_asof_tolerance",
    (s, dir) => {
      val e = t(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      graft.operators.AsOfJoin
        .asof(clicks, purchases, "user_id", "ts", "ts",
          Seq("value", "event_id"), tiebreak = "event_id",
          toleranceMs = 3600000L)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_clicks"),
          count(col("asof_value")).as("n_matched"),
          sum(col("asof_value").cast("decimal(18,2)")).cast("double")
            .as("sum_asof_value"))
        .orderBy("user_id")
    },
    Some("""WITH clicks AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      purch AS (
        SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'purchase'),
      u AS (
        SELECT user_id, ts AS t, 1 AS is_left, CAST(NULL AS BIGINT) AS rtb,
               CAST(NULL AS DOUBLE) AS p_value
        FROM clicks
        UNION ALL
        SELECT user_id, ts, 0, event_id, value FROM purch),
      c AS (
        SELECT user_id, t, is_left,
          last_value(CASE WHEN is_left = 0 THEN p_value END IGNORE NULLS) OVER w AS av,
          last_value(CASE WHEN is_left = 0 THEN t END IGNORE NULLS) OVER w AS art
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY t, is_left, rtb
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      m AS (
        SELECT user_id, t,
          CASE WHEN art IS NOT NULL AND t - art <= INTERVAL 1 HOUR THEN av END AS av
        FROM c WHERE is_left = 1)
      SELECT user_id,
        CAST(COUNT(*) AS BIGINT) AS n_clicks,
        CAST(COUNT(av) AS BIGINT) AS n_matched,
        CAST(SUM(CAST(av AS DECIMAL(18,2))) AS DOUBLE) AS sum_asof_value
      FROM m GROUP BY user_id ORDER BY user_id"""),
    covers = Seq("J-asof-tolerance"))

  // ------------------------------------------------------- media resize
  // Distributed resize through the deterministic codec stub (q48's
  // derivation of binary media from document bytes): payloads resized
  // to a 64×32 target, metadata re-decoded from the RESIZED bytes, and
  // the resized object's sha256 — all SQL-checkable because the stub
  // is byte arithmetic (prefix take) over ASCII text.
  private val q121 = QueryDef(
    "q121_media_resize",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val mod = col("doc_id") % 3
      val media = d.select(
        col("doc_id").as("media_id"),
        when(mod === 0, "image").when(mod === 1, "audio").otherwise("video")
          .as("media_type"),
        lit(null).cast("string").as("uri"),
        col("text").cast("binary").as("content"),
        lit(null).cast("int").as("meta_width"),
        lit(null).cast("int").as("meta_height"),
        lit(null).cast("int").as("meta_sample_rate"))
      graft.multimodal.MediaFeatures.resizeAll(media, 64, 32)
        .toDF().orderBy("media_id")
    },
    Some("""WITH media AS (
        SELECT doc_id AS media_id,
          CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
          text, octet_length(encode(text)) AS n FROM documents),
      r AS (SELECT *, greatest(16, least(n, 64*32 // 64)) AS k FROM media)
      SELECT media_id, media_type,
        CAST(n AS BIGINT) AS orig_len,
        CAST(k AS BIGINT) AS new_len,
        CAST(CASE media_type WHEN 'image' THEN 1 + (k % 1024) WHEN 'video' THEN 640 ELSE 0 END AS INTEGER) AS new_width,
        CAST(CASE media_type WHEN 'image' THEN 1 + ((k // 1024) % 1024) WHEN 'video' THEN 360 ELSE 0 END AS INTEGER) AS new_height,
        sha256(substr(text, 1, k)) AS resized_sha256
      FROM r ORDER BY media_id"""),
    covers = Seq("MM-resize"))

  // ---------------------------------------------------------- outer explode
  // explode_outer: unnesting that PRESERVES rows whose array is empty
  // (plain explode silently drops them — the subtle row-loss bug in
  // naive token pipelines). Null results ordered via sentinel so both
  // engines agree (Spark sorts NULLS FIRST, DuckDB LAST).
  private val q122 = QueryDef(
    "q122_explode_outer",
    (s, dir) => {
      val arr = t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"),
          filter(split(col("text"), " "), w => length(w) > 6).as("rare"))
      arr.select(col("doc_id"), explode_outer(col("rare")).as("rare_word"))
        .orderBy(col("doc_id"), coalesce(col("rare_word"), lit("~")))
    },
    Some("""WITH arr AS (
        SELECT doc_id, list_filter(string_split(text,' '), w -> len(w) > 6) AS rare
        FROM documents WHERE doc_id < 40)
      SELECT a.doc_id, u.w AS rare_word
      FROM arr a LEFT JOIN (SELECT doc_id, unnest(rare) AS w FROM arr) u
        ON a.doc_id = u.doc_id
      ORDER BY a.doc_id, coalesce(u.w, '~')"""),
    covers = Seq("A6-outer"))

  // ---------------------------------------------------- tumbling windows
  // Arbitrary-interval time bucketing with the native window()
  // function (15-minute tumbling) — the batch twin of the streaming
  // windowedCounts, epoch-aligned exactly like DuckDB's time_bucket.
  private val q123 = QueryDef(
    "q123_time_bucket",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type"),
    Some("""SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS w_start, event_type,
        CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("A5-interval"))

  // ------------------------------------------------------ quarantine channel
  // Row-level error channel: JSON payloads corrupted deterministically
  // (truncated for event_id % 7 = 0) parse to NULL instead of failing
  // the job; good rows contribute typed values, bad rows are counted
  // into the quarantine — the reference's try/except-per-record
  // (pipeline.py:222-298) as a set-based split.
  private val q124 = QueryDef(
    "q124_json_quarantine",
    (s, dir) => {
      val e = t(s, dir, "events").withColumn("props2",
        when(col("event_id") % 7 === 0,
          substring(col("props"), lit(1), length(col("props")) - 1))
          .otherwise(col("props")))
      val parsed = e.withColumn("j",
        from_json(col("props2"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))))
      // PERMISSIVE from_json yields a null-FIELDED struct on corrupt
      // input, not a null struct — classify on the required field
      // (every valid payload carries k), mirroring json_valid
      parsed.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(col("j.k")).as("n_good"),
          (count(lit(1)) - count(col("j.k"))).as("n_quarantined"),
          sum(col("j.k").cast(LongType)).as("sum_k"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (
        SELECT event_type,
          CASE WHEN event_id % 7 = 0 THEN substr(props, 1, len(props) - 1)
               ELSE props END AS props2
        FROM events)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN json_valid(props2) THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
        CAST(sum(CASE WHEN json_valid(props2) THEN 0 ELSE 1 END) AS BIGINT) AS n_quarantined,
        CAST(sum(CASE WHEN json_valid(props2)
                 THEN CAST(json_extract(props2, '$.k') AS BIGINT) END) AS BIGINT) AS sum_k
      FROM e GROUP BY event_type ORDER BY event_type"""),
    covers = Seq("P9-quarantine", "C-json"))

  // ----------------------------------------- correlated aggregate (TPC-H Q17)
  // Small-quantity revenue against a PER-PART correlated average —
  // Catalyst decorrelates the scalar subquery into an aggregate +
  // join instead of re-running it per row. Quantity sums of small ints
  // are exact, so the 0.2×avg threshold is deterministic.
  private val q125 = QueryDef(
    "q125_correlated_avg",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("ca_l")
      t(s, dir, "part").createOrReplaceTempView("ca_p")
      s.sql("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7
          AS avg_yearly,
        count(*) AS n_small
        FROM ca_l l JOIN ca_p p ON p_partkey = l_partkey
        WHERE p_size < 10
          AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM ca_l l2
                            WHERE l2.l_partkey = l.l_partkey)""")
    },
    Some("""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7
        AS avg_yearly,
      CAST(count(*) AS BIGINT) AS n_small
      FROM lineitem l JOIN part p ON p_partkey = l_partkey
      WHERE p_size < 10
        AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)"""),
    covers = Seq("C2-correlated"))

  // -------------------------------------- multi-existential (TPC-H Q21)
  // Sole-failure suppliers: EXISTS another supplier on the order AND
  // NOT EXISTS another FAILING supplier — one semi- plus one anti-join
  // against the same fact after decorrelation, the hardest standard
  // subquery shape.
  private val q126 = QueryDef(
    "q126_sole_failure",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("sf_l")
      t(s, dir, "orders").createOrReplaceTempView("sf_o")
      t(s, dir, "supplier").createOrReplaceTempView("sf_s")
      s.sql("""SELECT s_name, count(*) AS numwait
        FROM sf_s, sf_l l1, sf_o
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM sf_l l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM sf_l l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name ORDER BY numwait DESC, s_name""")
    },
    Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name ORDER BY numwait DESC, s_name"""),
    covers = Seq("C-multi-exists"))

  // ------------------------------------------------------- source drift
  // Distribution-drift monitor: term-share difference between two
  // source groups, top movers first — the corpus-mix check run before
  // admitting a new crawl into training data. Shares are single
  // divisions of exact counts; ranking on the shared IEEE drift tree
  // with a term tiebreak is therefore engine-stable.
  private val q127 = QueryDef(
    "q127_source_drift",
    (s, dir) => {
      val tok = t(s, dir, "documents").select(
        when(col("source").isin("src0", "src1", "src2"), "a").otherwise("b")
          .as("grp"),
        explode(split(col("text"), " ")).as("w"))
      val wide = tok.groupBy("w").agg(
        count_if(col("grp") === "a").as("n_a"),
        count_if(col("grp") === "b").as("n_b"))
      val tot = wide.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
      val drift = col("n_a").cast("double") / col("ta") -
        col("n_b").cast("double") / col("tb")
      wide.crossJoin(broadcast(tot))
        .select(col("w").as("term"), col("n_a"), col("n_b"),
          drift.as("share_drift"))
        .orderBy(abs(drift).desc, col("term"))
        .limit(15)
    },
    Some("""WITH tok AS (
        SELECT CASE WHEN source IN ('src0','src1','src2') THEN 'a' ELSE 'b' END AS grp,
          unnest(string_split(text,' ')) AS w
        FROM documents),
      c AS (SELECT grp, w, CAST(count(*) AS BIGINT) n FROM tok GROUP BY 1, 2),
      tot AS (SELECT grp, CAST(sum(n) AS BIGINT) t FROM c GROUP BY 1),
      wide AS (
        SELECT w,
          coalesce(max(CASE WHEN grp='a' THEN n END), 0) AS n_a,
          coalesce(max(CASE WHEN grp='b' THEN n END), 0) AS n_b
        FROM c GROUP BY w),
      ta AS (SELECT t FROM tot WHERE grp='a'), tb AS (SELECT t FROM tot WHERE grp='b')
      SELECT w AS term, n_a, n_b,
        CAST(n_a AS DOUBLE)/ta.t - CAST(n_b AS DOUBLE)/tb.t AS share_drift
      FROM wide, ta, tb
      ORDER BY abs(CAST(n_a AS DOUBLE)/ta.t - CAST(n_b AS DOUBLE)/tb.t) DESC, term
      LIMIT 15"""),
    covers = Seq("T-drift"))

  // -------------------------------------------------- relational division
  // "Orders whose EVERY line item satisfies P" — division via
  // NOT EXISTS a violating row, planned as an anti join (the FORALL
  // quantifier SQL lacks natively).
  private val q128 = QueryDef(
    "q128_relational_division",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("rd_l")
      t(s, dir, "orders").createOrReplaceTempView("rd_o")
      s.sql("""SELECT o_orderkey, o_orderstatus, count(*) AS n_items
        FROM rd_o JOIN rd_l ON l_orderkey = o_orderkey
        WHERE NOT EXISTS (SELECT 1 FROM rd_l l2
                          WHERE l2.l_orderkey = o_orderkey
                            AND l2.l_returnflag <> 'N')
        GROUP BY o_orderkey, o_orderstatus ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_orderstatus, CAST(count(*) AS BIGINT) AS n_items
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_orderkey = o_orderkey
                          AND l2.l_returnflag <> 'N')
      GROUP BY o_orderkey, o_orderstatus ORDER BY o_orderkey"""),
    covers = Seq("C-division"))

  // -------------------------------------------------------- hopping windows
  // Overlapping (hopping) windows: 30-minute length sliding by 15 —
  // every event lands in TWO buckets via the native window() fan-out;
  // the oracle builds the same fan-out with an explicit 2-offset
  // unnest. Completes the window family (tumbling q123, session q84).
  private val q129 = QueryDef(
    "q129_hopping_window",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "30 minutes", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("event_type"), col("n"))
        .orderBy("w_start", "event_type"),
    Some("""WITH hop AS (
        SELECT event_type,
          time_bucket(INTERVAL 15 MINUTE, ts) - o * INTERVAL 15 MINUTE AS w_start
        FROM events, (SELECT unnest(range(0, 2)) AS o))
      SELECT w_start, event_type, CAST(count(*) AS BIGINT) AS n
      FROM hop GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("A5-hopping"))

  // ------------------------------------------------ aggregate null matrix
  // Null semantics of the aggregate surface pinned on an ALL-NULL
  // group: count(*) counts rows, count(x) skips nulls, sum/min/max of
  // nothing are NULL (never 0) — the exact behaviors that silently
  // corrupt KPIs when an engine deviates.
  private val q130 = QueryDef(
    "q130_null_agg_matrix",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderpriority").as("pri"),
        when(col("o_orderpriority") === "5-LOW", lit(null))
          .otherwise(col("o_totalprice")).as("p"))
      o.groupBy("pri").agg(
          count(lit(1)).as("n_rows"),
          count(col("p")).as("n_vals"),
          sum(col("p").cast(DecimalType(18, 2))).cast("double").as("sum_p"),
          min(col("p")).as("min_p"),
          max(col("p")).as("max_p"),
          (count(lit(1)) - count(col("p"))).as("n_nulls"))
        .orderBy("pri")
    },
    Some("""WITH o AS (SELECT o_orderpriority AS pri,
          CASE WHEN o_orderpriority = '5-LOW' THEN NULL ELSE o_totalprice END AS p
        FROM orders)
      SELECT pri, CAST(count(*) AS BIGINT) n_rows, CAST(count(p) AS BIGINT) n_vals,
        CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_p,
        min(p) AS min_p, max(p) AS max_p,
        CAST(count(*) - count(p) AS BIGINT) AS n_nulls
      FROM o GROUP BY pri ORDER BY pri"""),
    covers = Seq("A-null-matrix"))

  // ------------------------------------------------------ collocation lift
  // Bigram collocations by LIFT — P(ab)/(P(a)P(b)) as the rational
  // n_ab·N/(n_a·n_b), so no logs (PMI's log changes nothing about the
  // ranking) and the score is one shared IEEE tree over exact counts.
  // The collocation-mining step of phrase-vocabulary induction.
  private val q131 = QueryDef(
    "q131_bigram_lift",
    (s, dir) => {
      val tk = t(s, dir, "documents").select(split(col("text"), " ").as("tk"))
      val uni = tk.select(explode(col("tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
      val tot = uni.agg(sum("n").as("t"))
      val big = tk.select(explode(when(size(col("tk")) >= 2,
          transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1))))
          .otherwise(array())).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 30)
        .withColumn("wa", split(col("bg"), " ")(0))
        .withColumn("wb", split(col("bg"), " ")(1))
      val lift = col("n_ab").cast("double") * col("t") / (col("n_a") * col("n_b"))
      big
        .join(uni.select(col("w").as("wa"), col("n").as("n_a")), "wa")
        .join(uni.select(col("w").as("wb"), col("n").as("n_b")), "wb")
        .crossJoin(broadcast(tot))
        .select(col("bg").as("bigram"), col("n_ab"), col("n_a"), col("n_b"),
          lift.as("lift"))
        .orderBy(lift.desc, col("bigram"))
        .limit(20)
    },
    Some("""WITH tok AS (SELECT string_split(text,' ') AS tk FROM documents),
      uni AS (SELECT w, CAST(count(*) AS BIGINT) n
              FROM (SELECT unnest(tk) w FROM tok) GROUP BY w),
      tot AS (SELECT CAST(sum(n) AS BIGINT) t FROM uni),
      big AS (
        SELECT bg, CAST(count(*) AS BIGINT) n_ab FROM (
          SELECT unnest(list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1])) AS bg
          FROM tok) GROUP BY bg),
      parts AS (
        SELECT bg, n_ab, string_split(bg, ' ')[1] AS wa, string_split(bg, ' ')[2] AS wb
        FROM big WHERE n_ab >= 30)
      SELECT bg AS bigram, n_ab, ua.n AS n_a, ub.n AS n_b,
        CAST(n_ab AS DOUBLE) * t / (ua.n * ub.n) AS lift
      FROM parts JOIN uni ua ON wa = ua.w JOIN uni ub ON wb = ub.w, tot
      ORDER BY CAST(n_ab AS DOUBLE) * t / (ua.n * ub.n) DESC, bigram LIMIT 20"""),
    covers = Seq("T-collocation"))

  // ------------------------------------------------------------- funnel
  // Ordered conversion funnel with per-step deadlines: first signup →
  // first click within 48 h → first purchase within 96 h of that
  // click. Each step joins only the previous step's survivors on the
  // key (no window over raw events), which is the funnel shape that
  // scales; min() timestamps make every step deterministic.
  private val q132 = QueryDef(
    "q132_funnel",
    (s, dir) => {
      val e = t(s, dir, "events")
      val s1 = e.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val s2 = e.filter(col("event_type") === "click")
        .join(s1, "user_id")
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 48 HOURS"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val s3 = e.filter(col("event_type") === "purchase")
        .join(s2, "user_id")
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 96 HOURS"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(s2.agg(count(lit(1)).as("n_clicked_48h")))
        .crossJoin(s3.agg(count(lit(1)).as("n_purchased_96h")))
    },
    Some("""WITH s AS (SELECT user_id, min(ts) t1 FROM events
               WHERE event_type='signup' GROUP BY 1),
      c AS (SELECT e.user_id, min(ts) t2 FROM events e JOIN s ON e.user_id = s.user_id
            WHERE event_type='click' AND ts > t1 AND ts <= t1 + INTERVAL 48 HOUR
            GROUP BY 1),
      p AS (SELECT e.user_id, min(ts) t3 FROM events e JOIN c ON e.user_id = c.user_id
            WHERE event_type='purchase' AND ts > t2 AND ts <= t2 + INTERVAL 96 HOUR
            GROUP BY 1)
      SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
             CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clicked_48h,
             CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchased_96h"""),
    covers = Seq("A-funnel"))

  // ------------------------------------------------------ cohort retention
  // Weekly cohort retention: users grouped by first-activity week,
  // counted distinct-active at each week offset — the classic
  // retention triangle, all integer epoch arithmetic (UTC day
  // boundaries, DIV week buckets) so both engines agree exactly.
  private val q133 = QueryDef(
    "q133_cohort_retention",
    (s, dir) => {
      val e = t(s, dir, "events")
      val first = e.groupBy("user_id").agg(to_date(min(col("ts"))).as("d0"))
      val act = e.join(first, "user_id")
        .select(col("user_id"),
          expr("unix_timestamp(CAST(d0 AS TIMESTAMP)) DIV 604800").as("cohort_week"),
          expr("(unix_timestamp(CAST(to_date(ts) AS TIMESTAMP)) - " +
            "unix_timestamp(CAST(d0 AS TIMESTAMP))) DIV 604800").as("week_offset"))
        .distinct()
      act.groupBy("cohort_week", "week_offset")
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""WITH first AS (
        SELECT user_id, CAST(min(ts) AS DATE) d0 FROM events GROUP BY 1),
      act AS (
        SELECT DISTINCT e.user_id,
          CAST(epoch(CAST(f.d0 AS TIMESTAMP)) AS BIGINT) // 604800 AS cohort_week,
          (CAST(epoch(CAST(CAST(e.ts AS DATE) AS TIMESTAMP)) AS BIGINT) -
           CAST(epoch(CAST(f.d0 AS TIMESTAMP)) AS BIGINT)) // 604800 AS week_offset
        FROM events e JOIN first f ON e.user_id = f.user_id)
      SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
        CAST(week_offset AS BIGINT) AS week_offset,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
      FROM act GROUP BY 1, 2 ORDER BY 1, 2"""),
    covers = Seq("A-cohort"))

  // ----------------------------------------------------- calendar edges
  // Month-arithmetic edge semantics pinned: month-end clamping (Jan 31
  // + 1 month = Feb 28/29, incl. across leap years via last_day),
  // month truncation, day diffs, quarters — the calendar behaviors
  // that silently skew period-over-period reports when engines
  // disagree (q19 gates the everyday date surface).
  private val q134 = QueryDef(
    "q134_calendar_edges",
    (s, dir) =>
      t(s, dir, "orders")
        .select(to_date(col("o_orderdate")).as("dt")).distinct()
        .select(col("dt"),
          add_months(col("dt"), 1).as("plus_month"),
          last_day(col("dt")).as("month_end"),
          add_months(last_day(col("dt")), 1).as("clamped_next"),
          trunc(col("dt"), "month").as("month_start"),
          datediff(col("dt"), lit("2024-01-01").cast("date")).cast(LongType)
            .as("days_since_jan1"),
          quarter(col("dt")).cast(LongType).as("qtr"))
        .orderBy("dt"),
    Some("""WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dt FROM orders)
      SELECT dt,
        CAST(dt + INTERVAL 1 MONTH AS DATE) AS plus_month,
        last_day(dt) AS month_end,
        CAST(last_day(dt) + INTERVAL 1 MONTH AS DATE) AS clamped_next,
        CAST(date_trunc('month', dt) AS DATE) AS month_start,
        CAST(date_diff('day', DATE '2024-01-01', dt) AS BIGINT) AS days_since_jan1,
        CAST(date_part('quarter', dt) AS BIGINT) AS qtr
      FROM d ORDER BY dt"""),
    covers = Seq("D-calendar"))

  // ------------------------------------------------- forward-looking frame
  // A strictly-ahead window frame (1 FOLLOWING..3 FOLLOWING): look-ahead
  // aggregation whose frame EXCLUDES the current row — empty frames at
  // partition tails must yield NULL sums and 0 counts, pinned.
  private val q135 = QueryDef(
    "q135_forward_frame",
    (s, dir) => {
      // (l_orderkey, l_linenumber) is NOT unique in this corpus (q110
      // proves it) — the window order needs the full attribute
      // tiebreak, and rows identical on every sort column are
      // interchangeable (same quantity ⇒ same frame sums)
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_suppkey", "l_partkey", "l_quantity", "l_extendedprice")
        .rowsBetween(1, 3)
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_suppkey"),
          sum(col("l_quantity").cast(LongType)).over(w).as("qty_ahead"),
          count(lit(1)).over(w).as("n_ahead"))
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "qty_ahead", "n_ahead")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_suppkey,
        CAST(sum(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_suppkey, l_partkey, l_quantity, l_extendedprice
          ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS BIGINT) AS qty_ahead,
        CAST(count(*) OVER (PARTITION BY l_orderkey
          ORDER BY l_linenumber, l_suppkey, l_partkey, l_quantity, l_extendedprice
          ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS BIGINT) AS n_ahead
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber, l_suppkey, qty_ahead, n_ahead"""),
    covers = Seq("W-forward-frame"))

  // ------------------------------------------------- point-in-interval join
  // Event-to-enclosing-window assignment via the equi-shaped
  // RangeJoin.pointInInterval (points carry ONE bin, intervals explode
  // theirs — no nested loop, no dedup): clicks inside each user's
  // first-72-hours window, aggregated. Oracle is the plain theta join.
  private val q136 = QueryDef(
    "q136_point_in_interval",
    (s, dir) => {
      val e = t(s, dir, "events")
      val iv = e.groupBy("user_id").agg(min(col("ts")).as("s"))
        .withColumn("e", col("s") + expr("INTERVAL 72 HOURS"))
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      graft.operators.RangeJoin
        .pointInInterval(clicks, "ts", iv, "s", "e",
          keys = Seq("user_id"), binMinutes = 720)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_in_window"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("val_in_window"))
        .orderBy("user_id")
    },
    Some("""WITH iv AS (SELECT user_id, min(ts) s, min(ts) + INTERVAL 72 HOUR e
               FROM events GROUP BY 1)
      SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_in_window,
        CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS val_in_window
      FROM events e JOIN iv ON e.user_id = iv.user_id
        AND e.ts >= iv.s AND e.ts < iv.e
      WHERE e.event_type = 'click'
      GROUP BY e.user_id ORDER BY e.user_id"""),
    covers = Seq("J2-point"))

  // ---------------------------------------------------- gaps and islands
  // Consecutive-day activity streaks (gaps-and-islands): date minus
  // per-user row_number is constant within an unbroken run, so one
  // window pass + one group-by finds every island — no self-joins, no
  // iteration. Streak analytics over integer date arithmetic.
  private val q137 = QueryDef(
    "q137_streaks",
    (s, dir) => {
      val days = t(s, dir, "events")
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val anchor = date_sub(col("d"),
        row_number().over(Window.partitionBy("user_id").orderBy("d")))
      days.withColumn("anchor", anchor)
        .groupBy("user_id", "anchor")
        .agg(min(col("d")).as("streak_start"), max(col("d")).as("streak_end"),
          count(lit(1)).as("streak_days"))
        .filter(col("streak_days") >= 3)
        .select("user_id", "streak_start", "streak_end", "streak_days")
        .orderBy("user_id", "streak_start")
    },
    Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d FROM events),
      grp AS (SELECT user_id, d,
        CAST(d AS DATE) - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
          AS INTEGER) AS anchor
        FROM days)
      SELECT user_id, min(d) AS streak_start, max(d) AS streak_end,
        CAST(count(*) AS BIGINT) AS streak_days
      FROM grp GROUP BY user_id, anchor
      HAVING count(*) >= 3
      ORDER BY user_id, streak_start"""),
    covers = Seq("W-islands"))

  // ---------------------------------------------- cumulative distinct users
  // Running count of DISTINCT users over time — windows cannot count
  // distinct cumulatively, so the scalable form is the
  // first-occurrence trick: each user contributes on their first day
  // only, and a running SUM of those contributions IS the cumulative
  // distinct count. O(n) instead of re-deduping every prefix.
  private val q138 = QueryDef(
    "q138_cumulative_distinct",
    (s, dir) => {
      val e = t(s, dir, "events")
      val daily = e.groupBy("user_id").agg(to_date(min(col("ts"))).as("d"))
        .groupBy("d").agg(count(lit(1)).as("n_new"))
      val allDays = e.select(to_date(col("ts")).as("d")).distinct()
      val w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
      allDays.join(daily, Seq("d"), "left")
        .select(col("d"), coalesce(col("n_new"), lit(0L)).as("n_new"))
        .withColumn("cum_unique_users", sum(col("n_new")).over(w))
        .orderBy("d")
    },
    Some("""WITH firsts AS (
        SELECT CAST(min(ts) AS DATE) AS d FROM events GROUP BY user_id),
      daily AS (SELECT d, CAST(count(*) AS BIGINT) n_new FROM firsts GROUP BY d),
      alldays AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
      SELECT a.d, coalesce(n_new, 0) AS n_new,
        CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY a.d ROWS UNBOUNDED PRECEDING)
          AS BIGINT) AS cum_unique_users
      FROM alldays a LEFT JOIN daily ON a.d = daily.d
      ORDER BY a.d"""),
    covers = Seq("W-cumulative-distinct", "A3"))

  // ------------------------------------------------- struct-array unnest
  // Arrays of STRUCTS built in-row (zip_with to a named struct) and
  // exploded back to columns — the nested-record fan-out the raw NS
  // payload needs (publicationSections[].stations[]), gated on
  // synthetic (word, length) pairs.
  private val q139 = QueryDef(
    "q139_struct_inline",
    (s, dir) => {
      val tk = split(col("text"), " ")
      t(s, dir, "documents").filter(col("doc_id") < 10)
        .select(col("doc_id"),
          explode(zip_with(tk, transform(tk, w => length(w)),
            (w, l) => struct(w.as("word"), l.cast(LongType).as("wlen")))).as("p"))
        .select(col("doc_id"), col("p.word").as("word"), col("p.wlen").as("wlen"))
        .orderBy("doc_id", "word", "wlen")
    },
    Some("""WITH z AS (
        SELECT doc_id, list_zip(string_split(text,' '),
          list_transform(string_split(text,' '), w -> len(w))) AS pairs
        FROM documents WHERE doc_id < 10)
      SELECT doc_id, u.p[1] AS word, CAST(u.p[2] AS BIGINT) AS wlen
      FROM (SELECT doc_id, unnest(pairs) AS p FROM z) u(doc_id, p)
      ORDER BY doc_id, word, wlen"""),
    covers = Seq("P8-struct-array"))

  val all: Seq[QueryDef] =
    Seq(q97, q98, q99, q100, q101, q102, q103, q104, q105, q106, q107, q108,
      q109, q110, q111, q112, q113, q114, q115, q116, q117, q118, q119, q120,
      q121, q122, q123, q124, q125, q126, q127, q128, q129, q130, q131, q132,
      q133, q134, q135, q136, q137, q138, q139)
}
