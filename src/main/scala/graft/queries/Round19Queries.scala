package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-19 gate additions (q213+): order-insensitive duplicate
  * grouping, interpolated percentiles in exact arithmetic, numeric
  * RANGE frames, and Spark's native bitmap-aggregate family.
  */
object Round19Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------- bag-of-words duplicates
  // Duplicate grouping that exact-hash dedup (q21) misses: documents
  // equal up to word ORDER and MULTIPLICITY collapse onto a sorted
  // distinct-token signature. The signature is an in-row projection
  // (narrow), the grouping is the only shuffle, and the md5 group key
  // keeps the gate's compare representation-independent. Shuffled or
  // stuttered near-dup copies — common crawl artifacts — land in one
  // cluster without any pairwise comparison.
  private val q213 = QueryDef(
    "q213_bag_dup_groups",
    (s, dir) => {
      val sig = md5(
        array_join(sort_array(array_distinct(split(col("text"), " "))), " ")
          .cast("binary"))
      t(s, dir, "documents")
        .select(col("doc_id"), sig.as("sig"))
        .groupBy("sig")
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("keeper"),
          array_join(sort_array(collect_list(col("doc_id").cast("string"))), ",")
            .as("members"))
        .filter(col("n_docs") > 1)
        .orderBy("keeper")
    },
    Some("""SELECT
        md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS sig,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(MIN(doc_id) AS BIGINT) AS keeper,
        array_to_string(list_sort(list(CAST(doc_id AS VARCHAR))), ',') AS members
      FROM documents
      GROUP BY 1 HAVING COUNT(*) > 1
      ORDER BY keeper"""),
    covers = Seq("DEDUP-bag-of-words"))

  // ------------------------------------------- interpolated percentiles
  // PERCENTILE_CONT(k/4) per priority class WITHOUT trusting either
  // engine's native interpolation internals: the index splits as
  // h = (n−1)·k = 4·lo + rem in INTEGERS, the two bracketing order
  // statistics are picked by row_number, and the interpolation
  // v_lo + (v_hi − v_lo)·rem/4 runs the identical IEEE tree on both
  // engines over exact cent values (q50/q164 gate the discrete
  // variants). One window pass + one aggregate; no per-quantile scan.
  private val q214 = QueryDef(
    "q214_percentile_cont",
    (s, dir) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      val w = Window.partitionBy("o_orderpriority").orderBy("cents")
      val ranked = t(s, dir, "orders")
        .select(col("o_orderpriority"), cents.as("cents"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("o_orderpriority")))
      def pick(k: Int): Seq[org.apache.spark.sql.Column] = {
        val lo = expr(s"((n - 1) * $k) div 4")
        val rem = ((col("n") - 1) * k) % 4
        Seq(
          max(when(col("rn") === lo + 1, col("cents"))).as(s"vlo_$k"),
          max(when(col("rn") === lo + 2, col("cents"))).as(s"vhi_$k"),
          max(rem).as(s"rem_$k"))
      }
      def interp(k: Int): org.apache.spark.sql.Column = {
        val vlo = col(s"vlo_$k").cast("double")
        val vhi = coalesce(col(s"vhi_$k"), col(s"vlo_$k")).cast("double")
        ((vlo + (vhi - vlo) * col(s"rem_$k").cast("double") / 4.0) / 100.0)
          .as(s"p${k * 25}")
      }
      ranked.groupBy("o_orderpriority")
        .agg((pick(1) ++ pick(2) ++ pick(3)).head,
          (pick(1) ++ pick(2) ++ pick(3)).tail: _*)
        .select(col("o_orderpriority") +: (1 to 3).map(interp): _*)
        .orderBy("o_orderpriority")
    },
    Some("""WITH ranked AS (
        SELECT o_orderpriority,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rn,
          COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders),
      agg AS (
        SELECT o_orderpriority,
          MAX(CASE WHEN rn = (n-1) * 1 // 4 + 1 THEN cents END) AS vlo_1,
          MAX(CASE WHEN rn = (n-1) * 1 // 4 + 2 THEN cents END) AS vhi_1,
          MAX((n-1) * 1 % 4) AS rem_1,
          MAX(CASE WHEN rn = (n-1) * 2 // 4 + 1 THEN cents END) AS vlo_2,
          MAX(CASE WHEN rn = (n-1) * 2 // 4 + 2 THEN cents END) AS vhi_2,
          MAX((n-1) * 2 % 4) AS rem_2,
          MAX(CASE WHEN rn = (n-1) * 3 // 4 + 1 THEN cents END) AS vlo_3,
          MAX(CASE WHEN rn = (n-1) * 3 // 4 + 2 THEN cents END) AS vhi_3,
          MAX((n-1) * 3 % 4) AS rem_3
        FROM ranked GROUP BY o_orderpriority)
      SELECT o_orderpriority,
        (CAST(vlo_1 AS DOUBLE) + (CAST(COALESCE(vhi_1, vlo_1) AS DOUBLE)
          - CAST(vlo_1 AS DOUBLE)) * CAST(rem_1 AS DOUBLE) / 4.0) / 100.0 AS p25,
        (CAST(vlo_2 AS DOUBLE) + (CAST(COALESCE(vhi_2, vlo_2) AS DOUBLE)
          - CAST(vlo_2 AS DOUBLE)) * CAST(rem_2 AS DOUBLE) / 4.0) / 100.0 AS p50,
        (CAST(vlo_3 AS DOUBLE) + (CAST(COALESCE(vhi_3, vlo_3) AS DOUBLE)
          - CAST(vlo_3 AS DOUBLE)) * CAST(rem_3 AS DOUBLE) / 4.0) / 100.0 AS p75
      FROM agg ORDER BY o_orderpriority"""),
    covers = Seq("STAT-percentile-cont"))

  // ------------------------------------------- numeric RANGE frames
  // Value-based window frames on a NUMERIC order key: for each
  // customer, how many same-nation peers sit within 100 currency
  // units below their balance, and their summed balance — RANGE
  // BETWEEN 10000 PRECEDING AND CURRENT ROW over exact cents (q178
  // gates the time-interval twin, q53 the epoch emulation). Peers
  // with EQUAL balance all join the frame (RANGE, not ROWS) — the
  // semantic the gate pins. Output decimated to every 20th customer.
  private val q215 = QueryDef(
    "q215_numeric_range_frame",
    (s, dir) => {
      val cents = (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
      val w = Window.partitionBy("c_nationkey").orderBy("cents")
        .rangeBetween(-10000, 0)
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), cents.as("cents"))
        .withColumn("n_near", count(lit(1)).over(w))
        .withColumn("sum_near", sum(col("cents")).over(w))
        .filter(col("c_custkey") % 20 === 0)
        .select("c_custkey", "c_nationkey", "n_near", "sum_near")
        .orderBy("c_custkey")
    },
    Some("""WITH c AS (
        SELECT c_custkey, c_nationkey,
          CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM customer)
      SELECT c_custkey, c_nationkey,
        CAST(COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY cents
          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near,
        CAST(SUM(cents) OVER (PARTITION BY c_nationkey ORDER BY cents
          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_near
      FROM c QUALIFY c_custkey % 20 = 0
      ORDER BY c_custkey"""),
    covers = Seq("WIN-numeric-range-frame"))

  // ------------------------------------------- native bitmap aggregates
  // Spark's built-in bitmap family (bitmap_bucket_number /
  // bitmap_bit_position / bitmap_construct_agg / bitmap_count) doing
  // exact distinct users per event type — the engine-native twin of
  // q199's hand-rolled 63-bit bitmaps, proven against plain
  // COUNT(DISTINCT). Buckets hold 32k bits, state is OR-mergeable
  // binary, and the final count sums per-bucket popcounts.
  private val q216 = QueryDef(
    "q216_native_bitmap_agg",
    (s, dir) => {
      // user_id + 1 keeps the 1-based bitmap positions strictly
      // positive for a 0-based id space
      t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("bitmap_bucket_number(user_id + 1)").as("bucket"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id + 1))").as("bm"))
        .groupBy("event_type")
        .agg(
          sum(expr("bitmap_count(bm)")).as("n_distinct_users"),
          count(lit(1)).as("n_buckets"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_users,
        CAST(COUNT(DISTINCT user_id // 32768) AS BIGINT) AS n_buckets
      FROM events GROUP BY event_type ORDER BY event_type"""),
    covers = Seq("AGG-native-bitmap"))

  val all: Seq[QueryDef] =
    Seq(q213, q214, q215, q216)
}
