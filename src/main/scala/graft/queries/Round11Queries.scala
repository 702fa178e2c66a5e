package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-11 gate additions (q184+): exact-moment z-score feature
  * standardization, sweep-line interval concurrency, and a lossless
  * length-banded edit-distance similarity join.
  *
  * Determinism rules as everywhere (QueryDef scaladoc): moments from
  * exact DECIMAL sums; sqrt/division are correctly-rounded IEEE ops
  * so ONE shared expression tree is bit-stable across engines;
  * BIGINT casts on the DuckDB side; total ORDER BY.
  */
object Round11Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------- z-score standardization
  // Per-group feature standardization (the ML-prep transform): mean
  // and population variance derive from exact DECIMAL power sums
  // (Σq is 2-decimal, Σq² 4-decimal — both exact), so the moments
  // are independent of partial-aggregation order; the float work is
  // one shared tree of correctly-rounded IEEE ops (÷, ·, sqrt),
  // bit-identical in any engine. Two passes over the fact (moments,
  // then the standardizing join) — the broadcast of per-group
  // moments is O(groups), never data-sized.
  private val q184 = QueryDef(
    "q184_zscore",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity").cast(DecimalType(18, 2)).as("q"))
      val m = li.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("q")).as("s"),
          sum((col("q") * col("q")).cast(DecimalType(38, 4))).as("s2"))
        .select(col("l_returnflag"), col("n"),
          (col("s").cast("double") / col("n").cast("double")).as("mean"),
          sqrt(
            ((col("n") * col("s2") - (col("s") * col("s")).cast(DecimalType(38, 4)))
              .cast("double")) /
              (col("n") * col("n")).cast("double")).as("std"))
      li.filter(col("l_orderkey") % 500 === 0)
        .join(broadcast(m), "l_returnflag")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("q").cast("double").as("quantity"),
          ((col("q").cast("double") - col("mean")) / col("std")).as("z"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    Some("""WITH li AS (
        SELECT l_orderkey, l_linenumber, l_returnflag,
               CAST(l_quantity AS DECIMAL(18,2)) AS q
        FROM lineitem),
      m AS (
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(q) AS s, SUM(CAST(q * q AS DECIMAL(38,4))) AS s2
        FROM li GROUP BY 1),
      mm AS (
        SELECT l_returnflag,
          CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
          sqrt(CAST(n * s2 - CAST(s * s AS DECIMAL(38,4)) AS DOUBLE)
               / CAST(n * n AS DOUBLE)) AS std
        FROM m)
      SELECT l_orderkey, l_linenumber, li.l_returnflag,
        CAST(q AS DOUBLE) AS quantity,
        (CAST(q AS DOUBLE) - mean) / std AS z
      FROM li JOIN mm ON li.l_returnflag = mm.l_returnflag
      WHERE l_orderkey % 500 = 0
      ORDER BY l_orderkey, l_linenumber"""),
    covers = Seq("ML-standardize"))

  // --------------------------------------------- interval concurrency
  // Sweep-line concurrency per user: each event spans [ts, ts +
  // value minutes) (end exact via DECIMAL×60e6 µs); +1/−1 boundary
  // points sorted within the user partition give the running number
  // of simultaneously-open intervals. The window partitions by
  // user_id, so state never concentrates — the per-key sweep-line is
  // the scalable form (a GLOBAL concurrency sweep needs a two-level
  // prefix-sum; per entity it is one partitioned window). Ends sort
  // before starts at the same instant (half-open intervals).
  private val q185 = QueryDef(
    "q185_user_concurrency",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("st"),
          (unix_micros(col("ts")) +
            (col("value").cast(DecimalType(18, 2)) * 60000000L)
              .cast(LongType)).as("en"))
      val pts = ev.select(col("user_id"), col("st").as("t"), lit(1L).as("d"),
          col("event_id"))
        .unionAll(ev.select(col("user_id"), col("en").as("t"), lit(-1L).as("d"),
          col("event_id")))
      val w = Window.partitionBy("user_id").orderBy(col("t"), col("d"), col("event_id"))
      pts.withColumn("open", sum(col("d")).over(w))
        .groupBy("user_id")
        .agg(max(col("open")).as("max_concurrent"),
          count(lit(1)).as("n_points"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
        SELECT user_id, event_id,
          epoch_us(ts) AS st,
          epoch_us(ts) + CAST(CAST(value AS DECIMAL(18,2)) * 60000000 AS BIGINT) AS en
        FROM events),
      pts AS (
        SELECT user_id, st AS t, CAST(1 AS BIGINT) AS d, event_id FROM ev
        UNION ALL
        SELECT user_id, en, CAST(-1 AS BIGINT), event_id FROM ev),
      run AS (
        SELECT user_id,
          CAST(SUM(d) OVER (PARTITION BY user_id
            ORDER BY t, d, event_id) AS BIGINT) AS open
        FROM pts)
      SELECT user_id,
        CAST(MAX(open) AS BIGINT) AS max_concurrent,
        CAST(COUNT(*) AS BIGINT) AS n_points
      FROM run GROUP BY user_id ORDER BY user_id"""),
    covers = Seq("INT-concurrency"))

  // ------------------------------------- banded edit-distance join
  // Edit-distance similarity join over distinct part names with a
  // LOSSLESS candidate band: |len(a) − len(b)| ≤ 2 is implied by
  // levenshtein ≤ 2, so blocking on the three length keys (n−1, n,
  // n+1) generates every qualifying pair as an equi-join — no O(n²)
  // all-pairs, no recall loss (first-letter blocking would silently
  // drop 'kitten'/'mitten' pairs). Exact levenshtein verifies the
  // candidate sliver. The oracle brute-forces all pairs — agreement
  // proves the band lossless.
  private val q186 = QueryDef(
    "q186_editdist_join",
    (s, dir) => {
      val names = t(s, dir, "part").select(col("p_name")).distinct()
      val banded = names.select(col("p_name"),
        explode(array(length(col("p_name")) - 1, length(col("p_name")),
          length(col("p_name")) + 1)).as("lk"))
      // both sides carry keys {n-1, n, n+1}: key sets intersect
      // exactly when |len(a) - len(b)| <= 2, so every lev<=2 pair
      // meets on some key (pairs meeting on several are dropped by
      // the distinct). At corpus scale the band key would compose
      // with a q-gram prefix (length alone over-buckets); the
      // length band is the part that is provably lossless.
      val left = banded.select(col("p_name").as("a"), col("lk"))
      val right = banded.select(col("p_name").as("b"), col("lk"))
      left.join(right, "lk")
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct()
        .filter(abs(length(col("a")) - length(col("b"))) <= 2)
        .withColumn("dist", levenshtein(col("a"), col("b")))
        .filter(col("dist") <= 2)
        .orderBy("a", "b")
    },
    Some("""WITH n AS (SELECT DISTINCT p_name FROM part)
      SELECT a.p_name AS a, b.p_name AS b,
        CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
      FROM n a JOIN n b ON a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 2
      ORDER BY a, b"""),
    covers = Seq("SIM-editdist"))

  val all: Seq[QueryDef] =
    Seq(q184, q185, q186)
}
