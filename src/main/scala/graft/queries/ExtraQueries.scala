package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.Tables

/** Coverage beyond the reference's own surface (SURVEY §2.7's "none in
  * reference" set operations, array-function roundtrips, rollup
  * subtotals, and approximate aggregates as the exact-countDistinct
  * scale path).
  */
object ExtraQueries {

  // ---------------------------------------------------------------- arrays
  // The CSV-station roundtrip pattern (split → dedupe → sort → rejoin,
  // cleaners.py:181-229 / O3) exercised generically.
  private val q37 = QueryDef(
    "q37_array_ops",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val toks = split(col("text"), " ")
      val distinctSorted = array_sort(array_distinct(toks))
      d.select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          size(distinctSorted).as("n_distinct"),
          array_join(slice(distinctSorted, 1, 5), ",").as("first5"),
          element_at(distinctSorted, 1).as("first_token"),
          element_at(distinctSorted, -1).as("last_token"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
      CAST(len(list_sort(list_distinct(string_split(text, ' ')))) AS INTEGER) AS n_distinct,
      array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first5,
      list_sort(list_distinct(string_split(text, ' ')))[1] AS first_token,
      list_sort(list_distinct(string_split(text, ' ')))[-1] AS last_token
      FROM documents ORDER BY doc_id"""),
    covers = Seq("O3", "P8"))

  // ---------------------------------------------------------------- set ops
  private val q38 = QueryDef(
    "q38_set_ops",
    (s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val bigSpenders = o.filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("k")).distinct()
      val union = building.union(bigSpenders).distinct()
      val inter = building.intersect(bigSpenders)
      val minus = building.except(bigSpenders)
      union.agg(count(lit(1)).as("n_union"))
        .crossJoin(inter.agg(count(lit(1)).as("n_intersect")))
        .crossJoin(minus.agg(count(lit(1)).as("n_except")))
    },
    Some("""WITH building AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
      big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 150000)
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT k FROM building UNION SELECT k FROM big)) AS n_union,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT k FROM building INTERSECT SELECT k FROM big)) AS n_intersect,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT k FROM building EXCEPT SELECT k FROM big)) AS n_except"""),
    covers = Seq("SET-ops"))

  // ---------------------------------------------------------------- rollup
  // Subtotal hierarchies; NULL group keys replaced by a sentinel so
  // both engines order identically (Spark sorts NULLS FIRST, DuckDB
  // NULLS LAST).
  private val q39 = QueryDef(
    "q39_rollup",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
        .select(
          coalesce(col("n_name"), lit("(all)")).as("nation"),
          coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          col("n"), col("qty"))
        .orderBy("nation", "returnflag")
    },
    Some("""SELECT
        COALESCE(n_name, '(all)') AS nation,
        COALESCE(l_returnflag, '(all)') AS returnflag,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, l_returnflag)
      ORDER BY nation, returnflag"""),
    covers = Seq("AGG-rollup"))

  // ---------------------------------------------------------------- approx
  // HLL / GK sketch values differ across engines, so the sketch
  // OUTPUTS can't hash-match an oracle — but their accuracy BOUNDS
  // can: the query emits the exact values (both engines compute
  // those) plus integer flags asserting each estimate sits inside
  // its documented error band (HLL rsd 0.02 → generous ±10%;
  // approx_percentile accuracy 1000 → rank error ≤ n/1000, checked
  // against a ±5-rank-percent exact band). The sketches are
  // deterministic for fixed data, so the flags are stable and the
  // oracle pins them to 1 — a sketch drifting out of its band turns
  // the gate red instead of passing a rows-only check.
  private val q40 = QueryDef(
    "q40_approx_distinct",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      // exact bands via graft.operators.ExactQuantiles — the built-in
      // percentile() buffers the whole per-group value multiset in an
      // ObjectHashAggregate; the rank-select form is one codegen'd
      // count agg + window over distinct values, bit-identical output
      // (fuzz-pinned in ExactQuantilesSpec)
      val bands = graft.operators.ExactQuantiles.cont(
        li, Seq("l_returnflag"), "l_extendedprice",
        Seq(("b50lo", 0.45), ("b50hi", 0.55), ("b99lo", 0.985), ("b99hi", 0.995)))
      // exact distinct on its own frame: countDistinct mixed with the
      // sketch aggregates plans an Expand that duplicates every fact
      // row; two-level distinct-then-count keeps map-side combine
      val exact = li.select("l_returnflag", "l_partkey").distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact_parts"))
      li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          expr("approx_percentile(l_extendedprice, array(0.5D, 0.99D), 1000)")
            .as("pa"))
        .join(exact, Seq("l_returnflag"))
        .join(bands, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("exact_parts"),
          (col("ap").cast("double") >= col("exact_parts") * 0.9 &&
            col("ap").cast("double") <= col("exact_parts") * 1.1)
            .cast("long").as("hll_within_10pct"),
          (element_at(col("pa"), 1) >= col("b50lo") &&
            element_at(col("pa"), 1) <= col("b50hi"))
            .cast("long").as("p50_in_band"),
          (element_at(col("pa"), 2) >= col("b99lo") &&
            element_at(col("pa"), 2) <= col("b99hi"))
            .cast("long").as("p99_in_band"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        CAST(1 AS BIGINT) AS hll_within_10pct,
        CAST(1 AS BIGINT) AS p50_in_band,
        CAST(1 AS BIGINT) AS p99_in_band
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    covers = Seq("AGG-approx"))

  // ---------------------------------------------------------------- as-of join
  // Each click is enriched with the user's most recent purchase at or
  // before it. Spark runs graft.operators.AsOfJoin (union +
  // last-non-null window — one key shuffle, no range explosion); the
  // oracle expresses the identical union+window semantics in SQL.
  private val q41 = QueryDef(
    "q41_asof_join",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      graft.operators.AsOfJoin
        .asof(clicks, purchases, "user_id", "ts", "ts",
          Seq("value", "event_id"), tiebreak = "event_id")
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_clicks"),
          count(col("asof_value")).as("n_matched"),
          sum(col("asof_value").cast("decimal(18,2)")).cast("double")
            .as("sum_asof_value"),
          max(col("asof_event_id")).as("last_purchase_id"))
        .orderBy("user_id")
    },
    Some("""WITH clicks AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      purch AS (
        SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'purchase'),
      u AS (
        SELECT user_id, ts AS t, 1 AS is_left, CAST(NULL AS BIGINT) AS rtb,
               CAST(NULL AS DOUBLE) AS p_value, CAST(NULL AS BIGINT) AS p_id
        FROM clicks
        UNION ALL
        SELECT user_id, ts, 0, event_id, value, event_id FROM purch),
      c AS (
        SELECT user_id, t, is_left,
          last_value(CASE WHEN is_left = 0 THEN p_value END IGNORE NULLS) OVER w AS av,
          last_value(CASE WHEN is_left = 0 THEN p_id END IGNORE NULLS) OVER w AS aid
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY t, is_left, rtb
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT user_id,
        CAST(COUNT(*) AS BIGINT) AS n_clicks,
        CAST(COUNT(av) AS BIGINT) AS n_matched,
        CAST(SUM(CAST(av AS DECIMAL(18,2))) AS DOUBLE) AS sum_asof_value,
        CAST(MAX(aid) AS BIGINT) AS last_purchase_id
      FROM c WHERE is_left = 1
      GROUP BY user_id ORDER BY user_id"""),
    covers = Seq("JOIN-asof"))

  // ---------------------------------------------------------------- batch sessionization
  // Gap-based sessions in pure SQL/window form (the batch twin of
  // streaming/EventStreams.sessionize): flag gap > 30 min, running-sum
  // the flags into session ids, aggregate per user.
  private val q42 = QueryDef(
    "q42_sessionize_batch",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val flagged = e.withColumn("new_s",
        when(lag(col("ts"), 1).over(byUser).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(byUser))
            > 30L * 60 * 1000000, 1).otherwise(0))
      val sessions = flagged
        .withColumn("sid", sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(
          count(lit(1)).as("n_events"),
          // exact integer micros — summing fractional seconds would be
          // partial-agg-order dependent in the last ULP
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("duration_us"))
      sessions.groupBy("user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          (sum(col("duration_us")).cast("double") / 1000000d)
            .as("total_session_sec"))
        .orderBy("user_id")
    },
    Some("""WITH ordered AS (
        SELECT user_id, ts, event_id,
          LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events),
      flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 30*60*1000000
               THEN 1 ELSE 0 END AS new_s
        FROM ordered),
      numbered AS (
        SELECT user_id, ts,
          SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged),
      sessions AS (
        SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
          epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
        FROM numbered GROUP BY 1, 2)
      SELECT user_id,
        CAST(COUNT(*) AS BIGINT) AS n_sessions,
        CAST(MAX(n_events) AS BIGINT) AS max_session_events,
        CAST(SUM(duration_us) AS DOUBLE) / 1000000 AS total_session_sec
      FROM sessions GROUP BY user_id ORDER BY user_id"""),
    covers = Seq("SESSION-batch"))

  // ---------------------------------------------------------------- JSON scalar surface
  private val q43 = QueryDef(
    "q43_json_extract",
    (s, dir) => {
      val e = Tables.load(s, dir, "events")
      val k = get_json_object(col("props"), "$.k").cast(IntegerType)
      e.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(k).as("sum_k"),
          countDistinct(k).as("n_distinct_k"),
          max(k).as("max_k"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
      CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS n_distinct_k,
      CAST(MAX(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
      FROM events GROUP BY event_type ORDER BY event_type"""),
    covers = Seq("JSON-extract"))

  // ---------------------------------------------------------------- pivot
  // Spark's relational pivot with a FIXED value list (so both engines
  // agree on columns); DuckDB twin is the conditional-agg expansion.
  private val q44 = QueryDef(
    "q44_pivot",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
        .withColumnRenamed("A", "qty_a")
        .withColumnRenamed("N", "qty_n")
        .withColumnRenamed("R", "qty_r")
        .orderBy("l_linestatus")
    },
    Some("""SELECT l_linestatus,
      CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
      CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
      CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""),
    covers = Seq("AGG-pivot"))

  // ---------------------------------------------------------------- IVF ANN
  // The trained-index similarity path: deterministic k-means IVF with
  // nprobe cluster pruning (graft.similarity.IvfIndex). k-means has no
  // SQL twin, but the TRAINED MODEL is a pure function of the data —
  // so the gate is hash-gated against a dynamic oracle that inlines
  // the centroids as SQL literals (AnnModelOracle.ivfSql) and
  // re-derives assignment + probe + search + baseline + recall
  // independently in DuckDB. The model comes from the per-JVM
  // TrainedModels cache, shared with the oracle generator, so one
  // training run feeds both sides (see TrainedModels scaladoc). The
  // in-query recall floor stays as a semantic catastrophe guard, and
  // IvfIndexSpec additionally asserts run-to-run determinism.
  private val q45 = QueryDef(
    "q45_ivf_ann",
    (s, dir) => {
      // persisted: assign + search + brute-force baseline would
      // otherwise each rescan the parquet
      val emb = Tables.load(s, dir, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .persist()
      val cents = graft.similarity.TrainedModels
        .ivfCentroids(s, dir, k = 16, iters = 3)
      val index = graft.similarity.IvfIndex.assign(emb, cents, "vec_id", "embedding")
      // query pool + brute-force top-3: the AnnBaseline shared path —
      // pool capped at SamplePools.AnnQueryPool (keeps the baseline
      // O(pool · corpus), linear in the corpus) and HASH-GATED as its
      // own sibling gate q45b, so this recall floor measures the IVF
      // index against an oracle-proven baseline
      val queries = AnnBaseline.queryPool(emb, stride = 50L)
      val ivf = graft.similarity.IvfIndex
        .search(index, cents, queries, "vec_id", "embedding", nprobe = 4, topK = 3)
        .localCheckpoint() // O(queries·k) rows; read by recall AND output
      val bf = AnnBaseline
        .bruteForceTopK(s, emb, queries, k = 3, rankName = "bf_rk")
        .localCheckpoint() // O(queries·k) rows
      val recall = ivf
        .join(bf.select(col("q_id"), col("n_id"), lit(1L).as("hit")),
          Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / 3.0)
          .as("recall3"))
        .localCheckpoint() // O(queries) rows; mean gate + output column
      // bounded-collect: one aggregated mean-recall row — the
      // semantic gate. 0.5 is a CATASTROPHE floor (a broken probe or
      // bucket join scores ~0.05), not a quality target: measured
      // means are 0.59-0.63 across SFs at nprobe 4/16; quality at
      // full training is pinned in IvfIndexSpec
      val mean = recall.agg(avg(col("recall3"))).collect()(0).getDouble(0)
      require(mean >= 0.5, f"IVF recall@3 vs brute force = $mean%.3f < 0.5")
      ivf.join(recall, Seq("q_id"))
        .select(col("q_id"), col("rk"), col("n_id"), col("cos"), col("recall3"))
        .orderBy("q_id", "rk")
    },
    None,
    covers = Seq("SIM-ivf"),
    dynOracle = Some((s, dir) => AnnModelOracle.ivfSql(
      graft.similarity.TrainedModels.ivf(s, dir, k = 16, iters = 3),
      stride = 50L, nprobe = 4, topK = 3)))

  val all: Seq[QueryDef] = Seq(q37, q38, q39, q40, q41, q42, q43, q44, q45)
}
