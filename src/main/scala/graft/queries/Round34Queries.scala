package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-34 gate additions (q266+): series autocorrelation, the ORC
  * source/sink, and day-of-week seasonal anomalies.
  */
object Round34Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- autocorrelation
  // ACF of the daily order-count series at lags 1, 7 and 14 — THE
  // seasonality diagnostic (a lag-7 spike = weekly rhythm). Pairs
  // (t, t−lag) come from an equi-join of the daily aggregate with
  // itself per lag (explode of a 3-element lag array — no cartesian),
  // and each lag's Pearson runs on the q241 discipline: counts are
  // small integers, all five moments exact LONG sums, one shared IEEE
  // tree at the end. Integer counts keep every moment in range at ANY
  // scale factor (a daily count squares to ≤ ~10⁹ even at sf1000,
  // where cents-based revenue moments would overflow BIGINT).
  private val q266 = QueryDef(
    "q266_autocorrelation",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("x"))
        .withColumn("ed",
          datediff(col("d"), lit("1970-01-01").cast("date")).cast("long"))
        .select("ed", "x")
      val lagged = daily
        .select(col("ed"), col("x"),
          explode(array(lit(1L), lit(7L), lit(14L))).as("lag"))
        .withColumn("ed_prev", col("ed") - col("lag"))
      val pairs = lagged.join(
        daily.select(col("ed").as("ed_prev"), col("x").as("y")), "ed_prev")
      val g = pairs.groupBy("lag").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      val den1 = col("n") * col("sxx") - col("sx") * col("sx")
      val den2 = col("n") * col("syy") - col("sy") * col("sy")
      g.filter(den1 > 0 && den2 > 0)
        .select(col("lag"), col("n").as("n_pairs"),
          (num.cast("double") /
            (sqrt(den1.cast("double")) * sqrt(den2.cast("double"))))
            .as("acf"))
        .orderBy("lag")
    },
    Some("""WITH daily AS (
        SELECT DATE_DIFF('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) AS ed,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY 1),
      pairs AS (
        SELECT l.lag, a.x, b.x AS y
        FROM daily a
        CROSS JOIN (VALUES (CAST(1 AS BIGINT)), (CAST(7 AS BIGINT)),
                           (CAST(14 AS BIGINT))) l(lag)
        JOIN daily b ON b.ed = a.ed - l.lag),
      g AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(x * x) AS BIGINT) AS sxx,
          CAST(SUM(y * y) AS BIGINT) AS syy,
          CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pairs GROUP BY lag)
      SELECT lag, n AS n_pairs,
        CAST(n * sxy - sx * sy AS DOUBLE) /
          (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
           sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS acf
      FROM g
      WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      ORDER BY lag"""),
    covers = Seq("TS-acf"))

  // ------------------------------------------------- ORC round-trip
  // The third file format next to CSV (q204) and JSONL (q219): write
  // the documents table to ORC, read it back, and digest every row —
  // any loss in the write→read cycle (encoding, nulls, column order)
  // changes an md5 and hash-mismatches against the direct-from-parquet
  // oracle. ORC ships in Spark core (native reader/writer, predicate
  // pushdown and column pruning like parquet), so the engine's store
  // can serve either columnar format.
  private val q267 = QueryDef(
    "q267_orc_roundtrip",
    (s, dir) => {
      val path = "/tmp/graft_gate_orc_roundtrip"
      t(s, dir, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").orc(path)
      s.read.orc(path)
        .select(col("doc_id"),
          md5(concat_ws("|", col("text"), col("lang"), col("source"),
            col("n_chars").cast("string")).cast("binary")).as("digest"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
        md5(concat_ws('|', text, lang, source, CAST(n_chars AS VARCHAR)))
          AS digest
      FROM documents ORDER BY doc_id"""),
    covers = Seq("S-orc"))

  // ------------------------------------------------- dow anomalies
  // Seasonal-residual outliers: each day's order count against its
  // day-of-week baseline (the weekly rhythm q04 profiles), keeping the
  // 3 most anomalous days per weekday. The ranking key is the EXACT
  // integer numerator x·n − sx (residual × group size): comparable
  // within a dow partition, and never a float compare — the residual
  // itself is emitted as one double division at the end. Baseline
  // moments are per-dow exact sums over the pre-aggregated daily
  // grain.
  private val q268 = QueryDef(
    "q268_dow_anomalies",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("x"))
        .withColumn("dow", dayofweek(col("d")).cast("long"))
      val wDow = Window.partitionBy("dow")
      val scored = daily
        .withColumn("n", count(lit(1)).over(wDow))
        .withColumn("sx", sum(col("x")).over(wDow))
        .withColumn("num", col("x") * col("n") - col("sx"))
      val ranked = scored.withColumn("rk",
        row_number().over(Window.partitionBy("dow")
          .orderBy(abs(col("num")).desc, col("d").asc)))
      ranked.filter(col("rk") <= 3)
        .select(col("dow"), col("d"), col("x").as("orders"),
          (col("num").cast("double") / col("n").cast("double"))
            .as("residual"),
          col("rk").cast("long").as("rk"))
        .orderBy("dow", "rk")
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY 1),
      dowd AS (SELECT *, CAST(dayofweek(d) AS BIGINT) + 1 AS dow FROM daily),
      scored AS (SELECT *,
          CAST(COUNT(*) OVER (PARTITION BY dow) AS BIGINT) AS n,
          CAST(SUM(x) OVER (PARTITION BY dow) AS BIGINT) AS sx
        FROM dowd),
      ranked AS (SELECT *, x * n - sx AS num,
          ROW_NUMBER() OVER (PARTITION BY dow
            ORDER BY abs(x * n - sx) DESC, d ASC) AS rk
        FROM scored)
      SELECT dow, d, x AS orders,
        CAST(num AS DOUBLE) / CAST(n AS DOUBLE) AS residual,
        rk
      FROM ranked WHERE rk <= 3 ORDER BY dow, rk"""),
    covers = Seq("TS-seasonal-residual"))

  val all: Seq[QueryDef] =
    Seq(q266, q267, q268)
}
