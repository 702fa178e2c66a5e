package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-75 gate additions (q394–q398): rank divergence, boilerplate
  * spectra, customer trajectories, quantile grids, and the brevity
  * law.
  */
object Round75Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- rank divergence
  // Days where order VOLUME and order REVENUE tell different stories:
  // both daily series ranked (unique (value, date) orders), the
  // census of days whose rank difference exceeds a quarter of the
  // calendar — the volume/value decoupling check behind "record
  // traffic, flat revenue" surprises.
  private val q394 = QueryDef(
    "q394_rank_divergence_days",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DecimalType(38, 2)).as("rev"))
      val wN = Window.orderBy(col("n"), col("d"))
      val wR = Window.orderBy(col("rev"), col("d"))
      val ranked = daily
        .withColumn("rk_n", row_number().over(wN).cast(LongType))
        .withColumn("rk_rev", row_number().over(wR).cast(LongType))
        .withColumn("rk_gap", abs(col("rk_n") - col("rk_rev")))
      val tot = ranked.agg(count(lit(1)).as("nd"))
      ranked.crossJoin(broadcast(tot))
        .agg(first(col("nd")).as("n_days"),
          max(col("rk_gap")).as("max_rank_gap"),
          sum(when(col("rk_gap") * 4 > col("nd"), 1L).otherwise(0L))
            .as("n_divergent"))
        .select(col("n_days"), col("max_rank_gap"), col("n_divergent"),
          (col("n_divergent").cast("double") / col("n_days").cast("double"))
            .as("divergent_rate"))
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
            AS rev
        FROM orders GROUP BY d),
      r AS (SELECT d,
          CAST(row_number() OVER (ORDER BY n, d) AS BIGINT) AS rk_n,
          CAST(row_number() OVER (ORDER BY rev, d) AS BIGINT) AS rk_rev
        FROM daily),
      g AS (SELECT abs(rk_n - rk_rev) AS rk_gap FROM r),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM g)
      SELECT nd AS n_days, MAX(rk_gap) AS max_rank_gap,
        CAST(SUM(CASE WHEN rk_gap * 4 > nd THEN 1 ELSE 0 END) AS BIGINT)
          AS n_divergent,
        CAST(SUM(CASE WHEN rk_gap * 4 > nd THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(nd AS DOUBLE) AS divergent_rate
      FROM g, tot GROUP BY nd"""),
    covers = Seq("STAT-rank-divergence"))

  // ------------------------------------------------- shingle df spectrum
  // The boilerplate spectrum: 3-gram shingles by document frequency
  // (1 = unique content, 10+ = template mass), with the share of
  // shingle TYPES in each band — the one-glance answer to "how much
  // of this corpus is copy-paste".
  private val q395 = QueryDef(
    "q395_shingle_df_spectrum",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val sh = d.select(col("doc_id"),
        explode(graft.functions.WordShingles(d.sparkSession, col("text"), 3))
          .as("s")).distinct()
      val df = sh.groupBy("s").agg(count(lit(1)).as("df"))
        .withColumn("band", least(col("df"), lit(10L)))
      val tot = df.agg(count(lit(1)).as("ts"))
      df.groupBy("band")
        .agg(count(lit(1)).as("n_shingles"))
        .crossJoin(broadcast(tot))
        .select(col("band"), col("n_shingles"),
          (col("n_shingles").cast("double") / col("ts").cast("double"))
            .as("type_share"))
        .orderBy("band")
    },
    Some("""WITH toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk
          FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
             FROM toksrc WHERE len(tk) >= 3),
      df AS (SELECT s, LEAST(CAST(COUNT(*) AS BIGINT), 10) AS band
             FROM sh GROUP BY s),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ts FROM df)
      SELECT band, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        CAST(COUNT(*) AS DOUBLE) / CAST(MIN(ts) AS DOUBLE) AS type_share
      FROM df, tot GROUP BY band
      ORDER BY band"""),
    covers = Seq("TXT-df-spectrum"))

  // ------------------------------------------------- customer trajectory
  // Is each customer's spend trending up or down? First vs last
  // order value over the (date, orderkey) total order — the
  // trajectory census (up / down / flat) per market segment, exact
  // DECIMAL comparisons deciding every class.
  private val q396 = QueryDef(
    "q396_customer_trajectory",
    (s, dir) => {
      val v = col("o_totalprice").cast(DecimalType(18, 2))
      val w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
      val o = t(s, dir, "orders")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"),
          col("o_orderkey"), v.as("v"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy("o_custkey")))
      val firstLast = o.filter(col("rn") === 1 || col("rn") === col("cnt"))
        .groupBy("o_custkey")
        .agg(max(col("cnt")).as("n_orders"),
          min(when(col("rn") === 1, col("v"))).as("first_v"),
          min(when(col("rn") === col("cnt"), col("v"))).as("last_v"))
        .filter(col("n_orders") >= 2)
        .withColumn("trajectory",
          when(col("last_v") > col("first_v"), "up")
            .when(col("last_v") < col("first_v"), "down")
            .otherwise("flat"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      firstLast.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("segment", "trajectory")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("segment", "trajectory")
    },
    Some("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
          o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders),
      r AS (SELECT o_custkey, v,
          row_number() OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
            AS rn,
          COUNT(*) OVER (PARTITION BY o_custkey) AS cnt
        FROM o),
      fl AS (SELECT o_custkey, MAX(cnt) AS n_orders,
          MIN(CASE WHEN rn = 1 THEN v END) AS first_v,
          MIN(CASE WHEN rn = cnt THEN v END) AS last_v
        FROM r WHERE rn = 1 OR rn = cnt
        GROUP BY o_custkey),
      cls AS (SELECT o_custkey,
          CASE WHEN last_v > first_v THEN 'up'
               WHEN last_v < first_v THEN 'down'
               ELSE 'flat' END AS trajectory
        FROM fl WHERE n_orders >= 2)
      SELECT c_mktsegment AS segment, trajectory,
        CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM cls JOIN customer ON o_custkey = c_custkey
      GROUP BY segment, trajectory
      ORDER BY segment, trajectory"""),
    covers = Seq("A-trajectory"))

  // ------------------------------------------------- quantile grid
  // Two-dimensional quantile control grid: P90 order value in exact
  // cents for every (segment × priority) cell — the slice-and-dice
  // form of q375's time series, one grouped order statistic.
  private val q397 = QueryDef(
    "q397_quantile_grid",
    (s, dir) => {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("o_orderpriority").as("priority"), cents.as("c"))
        .groupBy("segment", "priority")
        .agg(count(lit(1)).as("n_orders"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("p50_cents"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY c)")
            .cast(LongType).as("p90_cents"))
        .orderBy("segment", "priority")
    },
    Some("""SELECT c_mktsegment AS segment, o_orderpriority AS priority,
        CAST(COUNT(*) AS BIGINT) AS n_orders,
        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
          AS BIGINT) AS p50_cents,
        CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
          AS BIGINT) AS p90_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY segment, priority
      ORDER BY segment, priority"""),
    covers = Seq("A-quantile-grid"))

  // ------------------------------------------------- brevity law
  // Zipf's law of abbreviation: frequent words should be SHORTER.
  // Tokens ranked into frequency quintiles (unique (freq, term)
  // order), each quintile's exact mean character length — the
  // linguistic sanity check that synthetic corpora often fail.
  private val q398 = QueryDef(
    "q398_brevity_law",
    (s, dir) => {
      val tf = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("freq"))
        .withColumn("tlen", length(col("term")).cast(LongType))
      val w = Window.orderBy(desc("freq"), asc("term"))
      tf.withColumn("quintile", ntile(5).over(w).cast(LongType))
        .groupBy("quintile")
        .agg(count(lit(1)).as("n_terms"),
          sum(col("freq")).as("occurrences"),
          sum(col("tlen")).as("slen"))
        .select(col("quintile"), col("n_terms"), col("occurrences"),
          (col("slen").cast("double") / col("n_terms").cast("double"))
            .as("mean_term_len"))
        .orderBy("quintile")
    },
    Some("""WITH tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS freq,
          CAST(length(term) AS BIGINT) AS tlen
        FROM (SELECT unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY term),
      q AS (SELECT *, CAST(ntile(5) OVER (ORDER BY freq DESC, term)
          AS BIGINT) AS quintile FROM tf)
      SELECT quintile, CAST(COUNT(*) AS BIGINT) AS n_terms,
        CAST(SUM(freq) AS BIGINT) AS occurrences,
        CAST(SUM(tlen) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS mean_term_len
      FROM q GROUP BY quintile
      ORDER BY quintile"""),
    covers = Seq("TXT-brevity-law"))

  val all: Seq[QueryDef] =
    Seq(q394, q395, q396, q397, q398)
}
