package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-67 gate additions (q354–q358): sampling design, storage
  * economics, temporal ordering, funnel latency, and loyalty
  * segmentation.
  */
object Round67Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- Neyman allocation
  // Survey-sampling design: allocate a 1000-doc inspection budget
  // across sources proportional to N_h·s_h (Neyman). Strata moments
  // are exact longs; s_h is one sqrt over them, and the weight
  // normalizer folds in fixed source order (the q302 pattern) so the
  // shares are partition-independent. Allocations floor to integers.
  private val q354 = QueryDef(
    "q354_neyman_allocation",
    (s, dir) => {
      val g = t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
        .withColumn("sd", sqrt(
          (col("n").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) /
            (col("n").cast("double") * col("n").cast("double"))))
        .withColumn("w", col("n").cast("double") * col("sd"))
      val tot = g.agg(
        aggregate(sort_array(collect_list(struct(col("source"), col("w")))),
          lit(0.0d), (a, x) => a + x.getField("w")).as("sw"))
      g.crossJoin(broadcast(tot))
        .select(col("source"), col("n").as("n_docs"), col("sd"),
          (col("w") / col("sw")).as("alloc_share"),
          floor(lit(1000.0d) * (col("w") / col("sw"))).cast(LongType)
            .as("alloc_n"))
        .orderBy("source")
    },
    Some("""WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(n_chars) AS BIGINT) AS sx,
          CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY source),
      w AS (SELECT source, n,
          sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sd,
          CAST(n AS DOUBLE) * sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS w
        FROM g),
      tot AS (SELECT CAST(0 AS DOUBLE) + list_reduce(
          list(w ORDER BY source), (a, b) -> a + b) AS sw FROM w)
      SELECT source, n AS n_docs, sd,
        w / sw AS alloc_share,
        CAST(floor(CAST(1000 AS DOUBLE) * (w / sw)) AS BIGINT) AS alloc_n
      FROM w, tot
      ORDER BY source"""),
    covers = Seq("SAMPLE-neyman"))

  // ------------------------------------------------- dedup savings
  // The storage-savings report per source: bytes (n_chars) before and
  // after exact-text dedup and the savings rate — what the dedup run
  // is worth, in units leadership understands. Distinct texts keep
  // ONE representative's bytes; all sums exact longs.
  private val q355 = QueryDef(
    "q355_dedup_savings",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val before = d.groupBy("source")
        .agg(count(lit(1)).as("docs_before"),
          sum(col("n_chars")).as("bytes_before"))
      val after = d.groupBy("source", "text")
        .agg(min(col("n_chars")).as("nc"))
        .groupBy("source")
        .agg(count(lit(1)).as("docs_after"), sum(col("nc")).as("bytes_after"))
      before.join(after, Seq("source"))
        .select(col("source"), col("docs_before"), col("docs_after"),
          col("bytes_before"), col("bytes_after"),
          ((col("bytes_before") - col("bytes_after")).cast("double") /
            col("bytes_before").cast("double")).as("savings_rate"))
        .orderBy("source")
    },
    Some("""WITH before AS (SELECT source,
          CAST(COUNT(*) AS BIGINT) AS docs_before,
          CAST(SUM(n_chars) AS BIGINT) AS bytes_before
        FROM documents GROUP BY source),
      dd AS (SELECT source, text, CAST(MIN(n_chars) AS BIGINT) AS nc
             FROM documents GROUP BY source, text),
      aft AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_after,
          CAST(SUM(nc) AS BIGINT) AS bytes_after
        FROM dd GROUP BY source)
      SELECT source, docs_before, docs_after, bytes_before, bytes_after,
        CAST(bytes_before - bytes_after AS DOUBLE)
          / CAST(bytes_before AS DOUBLE) AS savings_rate
      FROM before JOIN aft USING (source)
      ORDER BY source"""),
    covers = Seq("DD-savings"))

  // ------------------------------------------------- sequence asymmetry
  // Temporal ordering bias between event-type pairs: of the users who
  // perform both A and B, how many saw A strictly first? First-
  // occurrence times per (user, type) collapse the log once; the
  // pair join runs at user cardinality. 0.5 = no ordering convention.
  private val q356 = QueryDef(
    "q356_sequence_asymmetry",
    (s, dir) => {
      val firsts = t(s, dir, "events")
        .groupBy("user_id", "event_type").agg(min(col("ts")).as("first_ts"))
      firsts.as("a").join(firsts.as("b"), Seq("user_id"))
        .filter(col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("a.first_ts") < col("b.first_ts"), 1L).otherwise(0L))
            .as("a_first"),
          sum(when(col("b.first_ts") < col("a.first_ts"), 1L).otherwise(0L))
            .as("b_first"))
        .select(col("type_a"), col("type_b"), col("n_users"),
          col("a_first"), col("b_first"),
          (col("a_first").cast("double") / col("n_users").cast("double"))
            .as("a_first_rate"))
        .orderBy("type_a", "type_b")
    },
    Some("""WITH firsts AS (SELECT user_id, event_type, MIN(ts) AS first_ts
          FROM events GROUP BY user_id, event_type)
      SELECT a.event_type AS type_a, b.event_type AS type_b,
        CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(SUM(CASE WHEN a.first_ts < b.first_ts THEN 1 ELSE 0 END)
          AS BIGINT) AS a_first,
        CAST(SUM(CASE WHEN b.first_ts < a.first_ts THEN 1 ELSE 0 END)
          AS BIGINT) AS b_first,
        CAST(SUM(CASE WHEN a.first_ts < b.first_ts THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS a_first_rate
      FROM firsts a JOIN firsts b ON a.user_id = b.user_id
        AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
      ORDER BY type_a, type_b"""),
    covers = Seq("A-seq-asymmetry"))

  // ------------------------------------------------- funnel latency
  // How long from first click to first purchase, for users who did
  // both and in that order: the latency distribution (P25/P50/P90 in
  // seconds, exact order statistics over integral epoch diffs) plus
  // the conversion count — q132 counts the funnel, this prices its
  // speed.
  private val q357 = QueryDef(
    "q357_funnel_latency",
    (s, dir) => {
      val firsts = t(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "click", col("ts")))
          .as("first_click"),
          min(when(col("event_type") === "purchase", col("ts")))
            .as("first_purchase"))
        .filter(col("first_click").isNotNull &&
          col("first_purchase").isNotNull &&
          col("first_purchase") > col("first_click"))
        .withColumn("latency_s",
          expr("(unix_micros(first_purchase) - unix_micros(first_click))" +
            " DIV 1000000"))
      firsts.agg(count(lit(1)).as("n_converted"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY latency_s)")
          .cast(LongType).as("p25_s"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_s)")
          .cast(LongType).as("p50_s"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_s)")
          .cast(LongType).as("p90_s"),
        max(col("latency_s")).as("max_s"))
    },
    Some("""WITH firsts AS (SELECT user_id,
          MIN(CASE WHEN event_type = 'click' THEN ts END) AS fc,
          MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY user_id),
      lat AS (SELECT
          CAST((epoch_us(fp) - epoch_us(fc)) // 1000000 AS BIGINT)
            AS latency_s
        FROM firsts
        WHERE fc IS NOT NULL AND fp IS NOT NULL AND fp > fc)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
        CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY latency_s)
          AS BIGINT) AS p25_s,
        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY latency_s)
          AS BIGINT) AS p50_s,
        CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY latency_s)
          AS BIGINT) AS p90_s,
        MAX(latency_s) AS max_s
      FROM lat"""),
    covers = Seq("A-funnel-latency"))

  // ------------------------------------------------- brand loyalty
  // Loyalty segmentation: customers by distinct-brand breadth
  // (1 brand = loyal, 2–3, 4+) with each segment's customer count and
  // exact revenue share — does breadth buy more than loyalty? The
  // per-customer rollup shuffles once on the customer key.
  private val q358 = QueryDef(
    "q358_brand_loyalty",
    (s, dir) => {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      // measured (same-JVM interleaved A/B, round 9): the two-level
      // (customer, brand) pre-aggregate that beats Expand elsewhere is
      // SLOWER here — the Expand duplicates only a 3-byte brand column
      // while the pre-agg pays a second full shuffle — so the direct
      // countDistinct shape stays
      val per = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(countDistinct(col("p_brand")).as("n_brands"),
          sum(rev).cast(DecimalType(38, 4)).as("r"))
        .withColumn("segment",
          when(col("n_brands") === 1, "1_loyal")
            .when(col("n_brands") <= 3, "2_mixed")
            .otherwise("3_broad"))
      val tot = per.agg(sum(col("r")).cast(DecimalType(38, 4)).as("t"),
        count(lit(1)).as("nc"))
      per.groupBy("segment")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("r")).cast(DecimalType(38, 4)).as("seg_rev"))
        .crossJoin(broadcast(tot))
        .select(col("segment"), col("n_customers"),
          (col("n_customers").cast("double") / col("nc").cast("double"))
            .as("customer_share"),
          (col("seg_rev").cast("double") / col("t").cast("double"))
            .as("revenue_share"),
          (col("seg_rev").cast("double") / col("n_customers").cast("double"))
            .as("rev_per_customer"))
        .orderBy("segment")
    },
    Some("""WITH per AS (SELECT o_custkey,
          CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS r
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey),
      seg AS (SELECT CASE WHEN n_brands = 1 THEN '1_loyal'
            WHEN n_brands <= 3 THEN '2_mixed' ELSE '3_broad' END AS segment,
          r FROM per),
      tot AS (SELECT CAST(SUM(r) AS DECIMAL(38,4)) AS t,
          CAST(COUNT(*) AS BIGINT) AS nc FROM per)
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        CAST(COUNT(*) AS DOUBLE) / CAST(MIN(nc) AS DOUBLE) AS customer_share,
        CAST(CAST(SUM(r) AS DECIMAL(38,4)) AS DOUBLE) / CAST(MIN(t) AS DOUBLE)
          AS revenue_share,
        CAST(CAST(SUM(r) AS DECIMAL(38,4)) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS rev_per_customer
      FROM seg, tot GROUP BY segment
      ORDER BY segment"""),
    covers = Seq("A-loyalty"))

  val all: Seq[QueryDef] =
    Seq(q354, q355, q356, q357, q358)
}
