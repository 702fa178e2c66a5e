package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, IntegerType, LongType}

import graft.Tables

/** Round-7 gate additions (q162+): RAG-style chunking, token-budget
  * admission, discrete percentiles, EXCLUDE-CURRENT-ROW window
  * emulation, int8 embedding quantization, event-transition matrices,
  * and the TPC-H returned-item join shape.
  *
  * Determinism rules as everywhere (QueryDef scaladoc): doubles only
  * from exact integer/DECIMAL state through ONE shared IEEE tree,
  * BIGINT casts on the DuckDB side, total ORDER BY.
  */
object Round7Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ------------------------------------------------ overlapping chunking
  // RAG/pretraining chunk fan-out: fixed 32-token windows advancing by
  // a 24-token stride (8 tokens of overlap), one output row per chunk.
  // The chunk text is re-sliced from the token array in-row
  // (`slice` + `concat_ws`) — no self-join, no explode-then-window —
  // so the operator is one narrow `Generate` per doc and scales
  // linearly with corpus size; chunk identity travels as an md5 digest
  // so the gate compares content without hauling strings. Stride
  // starts come from `sequence(0, n_tok-1, 24)`: every token lands in
  // ≥1 chunk, tails shorter than the window emit with their true
  // length (`least(32, n-start)`).
  private val q162 = QueryDef(
    "q162_chunk_overlap",
    (s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .withColumn("n_tok", size(col("tk")))
      docs
        .select(col("doc_id"), col("n_tok"), col("tk"),
          posexplode(sequence(lit(0), col("n_tok") - 1, lit(24)))
            .as(Seq("chunk_idx", "start_tok")))
        .select(
          col("doc_id"),
          col("chunk_idx").cast(LongType).as("chunk_idx"),
          col("start_tok").cast(LongType).as("start_tok"),
          least(lit(32), col("n_tok") - col("start_tok")).cast(LongType).as("chunk_len"),
          md5(concat_ws(" ", slice(col("tk"), col("start_tok") + 1, lit(32)))).as("digest"))
        .orderBy("doc_id", "chunk_idx")
    },
    Some("""WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS tk,
               len(string_split(text, ' ')) AS n_tok
        FROM documents WHERE doc_id % 5 = 0),
      starts AS (
        SELECT doc_id, n_tok, tk,
               unnest(generate_series(0, n_tok - 1, 24)) AS start_tok
        FROM d),
      c AS (
        SELECT doc_id, n_tok, start_tok,
               array_to_string(tk[start_tok + 1 : start_tok + 32], ' ') AS chunk
        FROM starts)
      SELECT doc_id,
        CAST((start_tok / 24) AS BIGINT) AS chunk_idx,
        CAST(start_tok AS BIGINT) AS start_tok,
        CAST(least(32, n_tok - start_tok) AS BIGINT) AS chunk_len,
        md5(chunk) AS digest
      FROM c
      ORDER BY doc_id, chunk_idx"""),
    covers = Seq("TEXT-chunking"))

  // --------------------------------------------- token-budget admission
  // Per-source corpus capping: order each source's docs by a
  // deterministic hash (reproducible "random" priority, as q54/q142),
  // admit while the running token total stays within a 3000-token
  // budget. One window cumsum per source — the admission decision for
  // N docs costs one shuffle by source, not an iterative loop; at
  // 100 TB the budget becomes per-source reservoir quotas with the
  // same cumulative-threshold shape. Gate reports per-source admitted
  // counts + exact token mass.
  private val q163 = QueryDef(
    "q163_token_budget",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tok"),
          md5(col("doc_id").cast("string")).as("h"))
      val w = Window.partitionBy("source").orderBy("h")
      docs.withColumn("cum_tok", sum(col("n_tok")).over(w))
        .filter(col("cum_tok") <= 3000)
        .groupBy("source")
        .agg(count(lit(1)).as("n_admitted"),
          sum(col("n_tok")).as("tok_admitted"),
          max(col("cum_tok")).as("budget_used"))
        .orderBy("source")
    },
    Some("""WITH d AS (
        SELECT source, doc_id,
          len(string_split(text, ' ')) AS n_tok,
          md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents),
      c AS (
        SELECT source, n_tok,
          SUM(n_tok) OVER (PARTITION BY source ORDER BY h) AS cum_tok
        FROM d)
      SELECT source,
        CAST(COUNT(*) AS BIGINT) AS n_admitted,
        CAST(SUM(n_tok) AS BIGINT) AS tok_admitted,
        CAST(MAX(cum_tok) AS BIGINT) AS budget_used
      FROM c WHERE cum_tok <= 3000
      GROUP BY source ORDER BY source"""),
    covers = Seq("TEXT-budget"))

  // ------------------------------------------------- discrete percentiles
  // PERCENTILE_DISC: the quantile that must be an actual data value
  // (order statistic), vs q50's interpolated PERCENTILE_CONT. No
  // interpolation means no float arithmetic at all — the gate is
  // exact for ANY fraction, not just dyadic ones. Spark 4 has the
  // ANSI WITHIN GROUP syntax natively; DuckDB's quantile_disc is the
  // same order statistic (smallest value with cumulative fraction
  // ≥ p).
  private val q164 = QueryDef(
    "q164_percentile_disc",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      // graft.operators.ExactQuantiles rank-selects over the DISTINCT
      // value frame (l_quantity has ~50 distinct values — the count
      // pre-agg collapses 600k rows to 150) instead of the built-in's
      // four independent per-group value buffers; selection is
      // bit-identical to percentile_disc (ExactQuantilesSpec).
      // Regime note (same-JVM A/B): few large groups — the built-in
      // buffer loses one decade up (sf1: 5.3 s vs 4.3 s) while
      // costing slightly less at sf0.1; the scale shape ships
      val qty = graft.operators.ExactQuantiles.disc(
        li, Seq("l_returnflag"), "l_quantity",
        Seq(("p10", 0.1), ("p50", 0.5), ("p90", 0.9)))
      val price = graft.operators.ExactQuantiles.disc(
        li, Seq("l_returnflag"), "l_extendedprice", Seq(("price_p99", 0.99)))
      qty.join(price, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("p10"), col("p50"), col("p90"),
          col("price_p99"), qty.col("__group_n").as("n"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
        quantile_disc(l_quantity, 0.1) AS p10,
        quantile_disc(l_quantity, 0.5) AS p50,
        quantile_disc(l_quantity, 0.9) AS p90,
        quantile_disc(l_extendedprice, 0.99) AS price_p99,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    covers = Seq("A-percentile-disc"))

  // ------------------------------------- EXCLUDE CURRENT ROW emulation
  // Leave-one-out rolling stats: each day's revenue against the
  // surrounding ±3-day window EXCLUDING itself — the anomaly-baseline
  // window shape. Spark has no EXCLUDE clause, so the engine computes
  // the full ±3 frame once and subtracts the current row (sum − x,
  // count − 1): same single window pass, two extra codegen'd
  // arithmetic ops, NO second frame. The oracle uses DuckDB's native
  // `EXCLUDE CURRENT ROW` — hash-equality proves the emulation exact.
  // Sums are DECIMAL so the subtraction is exact; the loo average is
  // one shared double division.
  private val q165 = QueryDef(
    "q165_window_exclude",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("prio"),
          to_date(col("o_orderdate")).as("d"))
        .agg(sum(dec(col("o_totalprice"))).as("rev"))
      val w = Window.partitionBy("prio").orderBy("d").rowsBetween(-3, 3)
      daily
        .withColumn("frame_rev", sum(col("rev")).over(w).cast(DecimalType(38, 2)))
        .withColumn("frame_n", count(lit(1)).over(w))
        .select(col("prio"), col("d"),
          col("rev").cast("double").as("rev"),
          (col("frame_rev") - col("rev")).cast("double").as("loo_rev"),
          ((col("frame_rev") - col("rev")).cast("double") /
            (col("frame_n") - 1)).as("loo_avg"))
        .filter(dayofmonth(col("d")) === 1)
        .orderBy("prio", "d")
    },
    Some("""WITH daily AS (
        SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1, 2),
      loo AS (
        SELECT prio, d, rev,
          SUM(rev) OVER w_ex AS loo_rev,
          COUNT(*) OVER w_ex AS loo_n
        FROM daily
        WINDOW w_ex AS (PARTITION BY prio ORDER BY d
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW))
      SELECT prio, d, CAST(rev AS DOUBLE) AS rev,
        CAST(loo_rev AS DOUBLE) AS loo_rev,
        CAST(loo_rev AS DOUBLE) / loo_n AS loo_avg
      FROM loo WHERE date_part('day', d) = 1
      ORDER BY prio, d"""),
    covers = Seq("W-exclude"))

  // ---------------------------------------------- int8 quantization
  // Symmetric per-vector int8 quantization of the embedding column —
  // the compression step before shipping vectors to an ANN index
  // (PQ's scalar cousin; 4× smaller than float32). Per row: maxabs
  // scale, q_i = clip(floor(x_i·127/maxabs)) — all in-row HOFs, no
  // shuffle at all until the tiny verification aggregate. float→double
  // casts are exact and the scale expression is ONE shared IEEE tree,
  // so floor() lands identically in both engines; the int sums are
  // then order-independent. All-zero vectors (maxabs=0) quantize to
  // zeros by the guard, not NaN.
  private val q166 = QueryDef(
    "q166_int8_quantize",
    (s, dir) => {
      val xd = (c: Column) => c.cast("double")
      val emb = t(s, dir, "embeddings").filter(col("vec_id") % 4 === 0)
        .withColumn("maxabs",
          array_max(transform(col("embedding"), x => abs(xd(x)))))
      val quant = transform(col("embedding"), x =>
        when(col("maxabs") === 0d, lit(0))
          .otherwise(least(lit(127), greatest(lit(-127),
            floor(xd(x) * lit(127.0) / col("maxabs")).cast(IntegerType)))))
      emb
        .withColumn("q", quant)
        .select(col("vec_id"),
          size(col("q")).cast(LongType).as("n_dim"),
          aggregate(col("q"), lit(0L), (acc, v) => acc + v).as("q_sum"),
          array_min(col("q")).as("q_min"),
          array_max(col("q")).as("q_max"),
          size(filter(col("q"), v => v =!= 0)).cast(LongType).as("n_nonzero"),
          col("maxabs"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (
        SELECT vec_id, embedding,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings WHERE vec_id % 4 = 0),
      q AS (
        SELECT vec_id, maxabs,
          list_transform(embedding, x -> CASE WHEN maxabs = 0 THEN 0
            ELSE CAST(least(127, greatest(-127,
              floor(CAST(x AS DOUBLE) * 127.0 / maxabs))) AS INTEGER) END) AS qv
        FROM e)
      SELECT vec_id,
        CAST(len(qv) AS BIGINT) AS n_dim,
        CAST(list_sum(qv) AS BIGINT) AS q_sum,
        CAST(list_min(qv) AS INTEGER) AS q_min,
        CAST(list_max(qv) AS INTEGER) AS q_max,
        CAST(len(list_filter(qv, v -> v != 0)) AS BIGINT) AS n_nonzero,
        maxabs
      FROM q ORDER BY vec_id"""),
    covers = Seq("SIM-quantize"))

  // ------------------------------------------- event-transition matrix
  // First-order Markov transition counts over each user's event
  // sequence: lag() within (user, time) order builds the (prev → next)
  // pairs, one groupBy counts them, and each transition's probability
  // is its count over the source state's outgoing total (window sum —
  // exact int/int division). The per-user window partitions by
  // user_id, so state never concentrates; this is the
  // session-analytics shape that degenerates to a driver loop in
  // row-at-a-time engines.
  private val q167 = QueryDef(
    "q167_markov_transitions",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pairs = t(s, dir, "events")
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val counts = pairs.groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      counts
        .withColumn("out_total",
          sum(col("n")).over(Window.partitionBy("prev_type")))
        .select(col("prev_type"), col("next_type"), col("n"),
          (col("n").cast("double") / col("out_total")).as("p"))
        .orderBy("prev_type", "next_type")
    },
    Some("""WITH pairs AS (
        SELECT user_id, event_type AS next_type,
          LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events),
      counts AS (
        SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM pairs WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type)
      SELECT prev_type, next_type, n,
        CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
      FROM counts
      ORDER BY prev_type, next_type"""),
    covers = Seq("A-markov"))

  // ------------------------------------------ TPC-H Q10 returned items
  // The returned-item revenue report: lineitem filtered to returns ⋈
  // orders (one quarter) ⋈ customer ⋈ nation, revenue aggregated per
  // customer, top 20. The canonical "two facts + two dims" shape: both
  // dims broadcast, the fact⋈fact join shuffles only the quarter's
  // orders, and the final top-k is TakeOrderedAndProject — no global
  // sort. Revenue = Σ price·(1−disc) in DECIMAL, surfaced once as
  // double.
  private val q168 = QueryDef(
    "q168_tpch_q10",
    (s, dir) => {
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-04-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          (dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("rev"))
      val cust = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"),
          max(col("c_acctbal")).as("acctbal"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n_items,
        MAX(c_acctbal) AS acctbal
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1999-01-01'
        AND o_orderdate <  TIMESTAMP '1999-04-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""),
    covers = Seq("J-tpch-q10"))

  val all: Seq[QueryDef] =
    Seq(q162, q163, q164, q165, q166, q167, q168)
}
