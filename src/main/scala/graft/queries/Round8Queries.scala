package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-8 gate additions (q169+): the TPC-H Q7/Q8/Q14 join shapes
  * (nation-pair volume, regional market share, promo share — the
  * broadcast-dim star plans), map higher-order functions, URL
  * parsing + cryptographic hash surface, exact-substring span
  * REMOVAL (the rewrite q157 only measures), and the first BPE
  * merge-step pair count (tokenizer training at corpus scale).
  *
  * Determinism rules as everywhere (QueryDef scaladoc): money math in
  * DECIMAL(18,2), doubles only from ONE shared IEEE tree, BIGINT
  * casts on the DuckDB side, total ORDER BY.
  */
object Round8Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ------------------------------------------------- TPC-H Q7 volume
  // Nation-pair shipping volume: revenue flowing between two specific
  // nations per ship year, in both directions. Supplier, nation and
  // customer sides resolve via broadcast joins (dims); the single
  // data-sized exchange is lineitem⋈orders on orderkey. The nation
  // filter lands on the BROADCAST side before the join, so at 100 TB
  // the fact rows of the 23 uninvolved nations are dropped by the
  // (tiny) hash-table probe, never shuffled.
  private val q169 = QueryDef(
    "q169_tpch_q7",
    (s, dir) => {
      val nat = t(s, dir, "nation")
      val suppN = t(s, dir, "supplier")
        .join(nat.filter(col("n_name").isin("NATION_3", "NATION_8")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custN = t(s, dir, "customer")
        .join(nat.filter(col("n_name").isin("NATION_3", "NATION_8")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("rev"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        date_part('year', l_shipdate) AS l_year,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      WHERE sn.n_name IN ('NATION_3', 'NATION_8')
        AND cn.n_name IN ('NATION_3', 'NATION_8')
        AND sn.n_name <> cn.n_name
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
    covers = Seq("J-tpch-q7"))

  // ------------------------------------------- TPC-H Q8 market share
  // National market share: of all PROMO-part revenue sold to customers
  // in EUROPE, the fraction supplied by NATION_8, per order year.
  // Share = conditional DECIMAL sum / total DECIMAL sum, divided once
  // as double (the engine-wide one-IEEE-tree rule). Every dimension
  // (part, supplier→nation, customer→nation→region) broadcasts; the
  // one shuffle is lineitem⋈orders.
  private val q170 = QueryDef(
    "q170_tpch_q8",
    (s, dir) => {
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      val partP = t(s, dir, "part").filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val suppN = t(s, dir, "supplier")
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custEu = t(s, dir, "customer")
        .join(nat.join(broadcast(reg), col("n_regionkey") === col("r_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val ord = t(s, dir, "orders")
        .join(broadcast(custEu), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("rev"))
        .join(broadcast(partP), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_year")
        .agg(
          (sum(when(col("supp_nation") === "NATION_8", col("rev"))
            .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double") /
            sum(col("rev")).cast("double")).as("mkt_share"),
          sum(col("rev")).cast("double").as("total_rev"),
          count(lit(1)).as("n_items"))
        .orderBy("o_year")
    },
    Some("""SELECT date_part('year', o_orderdate) AS o_year,
        CAST(SUM(CASE WHEN sn.n_name = 'NATION_8'
              THEN CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
              ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS mkt_share,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_rev,
        CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
      GROUP BY 1 ORDER BY 1"""),
    covers = Seq("J-tpch-q8"))

  // ------------------------------------------- TPC-H Q14 promo share
  // Promo revenue share per ship month: one fact scan, one broadcast
  // part join, conditional-over-total DECIMAL sums surfaced by a
  // single double division. The month bucket comes from date_trunc so
  // partition pruning on a month-partitioned lineitem would kick in
  // unchanged.
  private val q171 = QueryDef(
    "q171_tpch_q14",
    (s, dir) => {
      val partT = t(s, dir, "part").select("p_partkey", "p_type")
      t(s, dir, "lineitem")
        .select(col("l_partkey"),
          date_trunc("month", col("l_shipdate")).as("ship_month"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("rev"))
        .join(broadcast(partT), col("l_partkey") === col("p_partkey"))
        .groupBy("ship_month")
        .agg(
          (lit(100).cast("double") *
            sum(when(col("p_type") === "PROMO", col("rev"))
              .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double") /
            sum(col("rev")).cast("double")).as("promo_share"),
          sum(col("rev")).cast("double").as("total_rev"),
          count(lit(1)).as("n_items"))
        .orderBy("ship_month")
    },
    Some("""SELECT date_trunc('month', l_shipdate) AS ship_month,
        CAST(100 AS DOUBLE) * CAST(SUM(CASE WHEN p_type = 'PROMO'
            THEN CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2)))
            ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_share,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_rev,
        CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY 1"""),
    covers = Seq("J-tpch-q14"))

  // ------------------------------------------------ map HOF surface
  // Map lambdas over the per-doc term-frequency map (q70 builds it;
  // here it is transformed in place): map_filter selects repeated
  // terms, transform_values squares counts (Σc², the Simpson
  // numerator, via one aggregate over map_values), transform_keys
  // rewrites keys. All per-row — zero shuffle beyond the tf groupBy
  // — which is why map HOFs beat explode-transform-reaggregate for
  // per-doc feature maps at corpus scale. The oracle computes the
  // same facts straight from the tf table (DuckDB's map lambda
  // surface differs; the CONTRACT is on values, not plan shape).
  private val q172 = QueryDef(
    "q172_map_hofs",
    (s, dir) => {
      val tok = t(s, dir, "documents").filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      val m = tf.groupBy("doc_id")
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("term"), col("c"))))).as("tfm"))
      m.select(
          col("doc_id"),
          size(col("tfm")).as("n_terms"),
          size(map_filter(col("tfm"), (_, v) => v >= 2)).as("n_repeated"),
          aggregate(map_values(transform_values(col("tfm"), (_, v) => v * v)),
            lit(0L), (acc, v) => acc + v).as("sq_mass"),
          array_max(map_keys(transform_keys(col("tfm"),
            (k, _) => upper(k)))).as("max_upper_key"))
        .orderBy("doc_id")
    },
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents WHERE doc_id % 3 = 0),
      tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
             FROM tok GROUP BY 1, 2)
      SELECT doc_id,
        CAST(COUNT(*) AS INTEGER) AS n_terms,
        CAST(COUNT(*) FILTER (WHERE c >= 2) AS INTEGER) AS n_repeated,
        CAST(SUM(c * c) AS BIGINT) AS sq_mass,
        MAX(upper(term)) AS max_upper_key
      FROM tf GROUP BY doc_id ORDER BY doc_id"""),
    covers = Seq("MAP-hofs"))

  // ------------------------------------------- URL parse + hash surface
  // Domain extraction and content digests — the crawl-curation
  // identity operations (URL canonicalization keys, content-hash
  // dedup keys). URLs are constructed from doc metadata, then pulled
  // apart with Spark's native parse_url (HOST / PATH / QUERY:key) and
  // digested with sha2-256 + md5; the oracle rebuilds the same parts
  // from the raw columns, so a parse_url deviation (or a hex-case
  // difference in sha2) hash-mismatches. Everything is per-row
  // (narrow), as a 100 TB URL normalization pass must be.
  private val q173 = QueryDef(
    "q173_url_hash",
    (s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") % 7 === 0)
        .withColumn("url",
          concat(lit("https://"), col("source"), lit(".example.org/d/"),
            col("doc_id"), lit("?lang="), col("lang"), lit("&v=1")))
      d.select(
          col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_q"),
          sha2(col("text"), 256).as("sha256_text"),
          md5(col("url")).as("md5_url"),
          length(col("text")).as("n_chars"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
        source || '.example.org' AS host,
        '/d/' || doc_id AS path,
        lang AS lang_q,
        sha256(text) AS sha256_text,
        md5('https://' || source || '.example.org/d/' || doc_id
            || '?lang=' || lang || '&v=1') AS md5_url,
        CAST(length(text) AS INTEGER) AS n_chars
      FROM documents WHERE doc_id % 7 = 0 ORDER BY doc_id"""),
    covers = Seq("TEXT-url-hash"))

  // --------------------------------------- exact-substring span removal
  // The REWRITE stage of exact-substring dedup (q157 only measures):
  // any 5-gram appearing in ≥2 documents is boilerplate; every token
  // it covers is dropped from every document, and the surviving
  // tokens are reassembled in order. Plan: one posting build (doc,
  // pos, gram), one gram-frequency aggregate, a semi-join back, a
  // covered-position explode (×5, distinct), an anti-join on (doc,
  // pos), and one per-doc reassembly groupBy — every step keyed and
  // partitionable, nothing quadratic; the shared-gram side is
  // DISTINCT doc counts so a gram repeated inside ONE doc is not
  // boilerplate. Output compares via md5 digest of the rewritten
  // text, so a single misplaced token mismatches.
  private val q174 = QueryDef(
    "q174_span_removal",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), split(col("text"), " ").as("tk"))
      val tok = docs.select(col("doc_id"),
        posexplode(col("tk")).as(Seq("pos0", "term")))
      val grams = docs
        .select(col("doc_id"),
          posexplode(graft.functions.WordShingles(s, col("text"), 5))
            .as(Seq("gpos0", "g")))
      val shared = grams.groupBy("g")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select("g")
      val covered = grams.join(shared, Seq("g"), "left_semi")
        .select(col("doc_id"),
          explode(sequence(col("gpos0"), col("gpos0") + 4)).as("pos0"))
        .distinct()
      val kept = tok.join(covered, Seq("doc_id", "pos0"), "left_anti")
      kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          md5(concat_ws(" ",
            transform(sort_array(collect_list(struct(col("pos0"), col("term")))),
              x => x("term")))).as("digest"))
        .join(docs.select(col("doc_id"), size(col("tk")).cast(LongType).as("n_tok")),
          Seq("doc_id"), "right")
        .select(col("doc_id"), col("n_tok"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
          coalesce(col("digest"), md5(lit(""))).as("digest"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      toki AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i FROM d),
      tok AS (SELECT doc_id, i - 1 AS pos0, tk[i] AS term FROM toki),
      gri AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS i
              FROM d WHERE len(tk) >= 5),
      gr AS (SELECT doc_id, i - 1 AS gpos0,
               tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
               tk[i+3] || ' ' || tk[i+4] AS g
             FROM gri),
      shared AS (SELECT g FROM gr GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
      covi AS (SELECT gr.doc_id, gr.gpos0, unnest(generate_series(0, 4)) AS off
               FROM gr JOIN shared USING (g)),
      cov AS (SELECT DISTINCT doc_id, gpos0 + off AS pos0 FROM covi),
      kept AS (SELECT t.doc_id, t.pos0, t.term FROM tok t
               WHERE NOT EXISTS (SELECT 1 FROM cov c
                 WHERE c.doc_id = t.doc_id AND c.pos0 = t.pos0)),
      agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                md5(string_agg(term, ' ' ORDER BY pos0)) AS digest
              FROM kept GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.tk) AS BIGINT) AS n_tok,
        COALESCE(a.n_kept, 0) AS n_kept,
        CAST(len(d.tk) AS BIGINT) - COALESCE(a.n_kept, 0) AS n_removed,
        COALESCE(a.digest, md5('')) AS digest
      FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id"""),
    covers = Seq("DEDUP-span-removal"))

  // --------------------------------------------- BPE merge-step counts
  // The inner loop of byte-pair-encoding tokenizer training: count
  // adjacent character pairs across the corpus, weighted by word
  // frequency. The heavy lift is ONE word-frequency aggregate (the
  // corpus collapses to its vocabulary — at 100 TB that is the only
  // data-sized shuffle); pairs then explode from the tiny distinct
  // vocab, so each merge iteration after the first costs vocab-sized
  // work, not corpus-sized. Top-30 by (count desc, pair) is exactly
  // the greedy BPE merge choice, made deterministic by the total
  // tiebreak.
  private val q175 = QueryDef(
    "q175_bpe_pairs",
    (s, dir) => {
      val words = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("wc"))
      val pairs = words
        .select(col("wc"),
          explode(transform(sequence(lit(1), length(col("w")) - 1),
            i => col("w").substr(i, lit(2)))).as("pair"))
      pairs.groupBy("pair")
        .agg(sum(col("wc")).as("n"))
        .orderBy(desc("n"), col("pair"))
        .limit(30)
    },
    Some("""WITH words AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) >= 2 GROUP BY w),
      p0 AS (SELECT w, wc, unnest(generate_series(1, len(w) - 1)) AS i FROM words),
      pairs AS (SELECT substring(w, i, 2) AS pair, wc FROM p0)
      SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
      FROM pairs GROUP BY pair
      ORDER BY n DESC, pair LIMIT 30"""),
    covers = Seq("TEXT-bpe"))

  val all: Seq[QueryDef] =
    Seq(q169, q170, q171, q172, q173, q174, q175)
}
