package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-73 gate additions (q384–q388): supply risk, engagement
  * curves, retention triangles, statistic stability, and seasonal
  * autocorrelation.
  */
object Round73Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- single-source risk
  // Supply-chain fragility: parts by how many distinct suppliers ship
  // them, with the revenue riding on single-sourced parts — the
  // at-risk revenue share procurement watches. Part-level distincts
  // collapse the fact once; revenue stays exact DECIMAL.
  private val q384 = QueryDef(
    "q384_single_source_risk",
    (s, dir) => {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      // pre-aggregate per (part, supplier) so the distinct-supplier
      // count is a plain count over the shrunk frame — the direct
      // countDistinct+sum Expand duplicates every fact row and loses
      // one decade up (same-JVM A/B, sf1: 2.30 s vs 1.87 s; sf0.1 a
      // wash) — the shape that survives the scale-up ships
      val per = t(s, dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum(rev).as("r_ps"))
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(col("r_ps")).cast(DecimalType(38, 4)).as("r"))
      val tot = per.agg(sum(col("r")).cast(DecimalType(38, 4)).as("t"),
        count(lit(1)).as("np"))
      per.groupBy("n_suppliers")
        .agg(count(lit(1)).as("n_parts"),
          sum(col("r")).cast(DecimalType(38, 4)).as("band_rev"))
        .crossJoin(broadcast(tot))
        .select(col("n_suppliers"), col("n_parts"),
          (col("n_parts").cast("double") / col("np").cast("double"))
            .as("part_share"),
          (col("band_rev").cast("double") / col("t").cast("double"))
            .as("revenue_share"))
        .orderBy("n_suppliers")
    },
    Some("""WITH per AS (SELECT l_partkey,
          CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS r
        FROM lineitem GROUP BY l_partkey),
      tot AS (SELECT CAST(SUM(r) AS DECIMAL(38,4)) AS t,
          CAST(COUNT(*) AS BIGINT) AS np FROM per)
      SELECT n_suppliers, CAST(COUNT(*) AS BIGINT) AS n_parts,
        CAST(COUNT(*) AS DOUBLE) / CAST(MIN(np) AS DOUBLE) AS part_share,
        CAST(CAST(SUM(r) AS DECIMAL(38,4)) AS DOUBLE) / CAST(MIN(t) AS DOUBLE)
          AS revenue_share
      FROM per, tot GROUP BY n_suppliers
      ORDER BY n_suppliers"""),
    covers = Seq("A-single-source"))

  // ------------------------------------------------- sequence position
  // Does value grow with engagement? Mean event value by the user's
  // within-sequence position band (events 1–10, 11–20, …): one
  // partitioned row_number, exact DECIMAL sums per band, one division
  // — the engagement-value curve.
  private val q385 = QueryDef(
    "q385_seq_position_value",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val e = t(s, dir, "events")
        .withColumn("pos", row_number().over(w).cast(LongType))
        .withColumn("band", expr("(pos - 1) DIV 10"))
        .select(col("band"), col("value").cast(DecimalType(18, 2)).as("v"))
      e.groupBy("band")
        .agg(count(lit(1)).as("n_events"),
          sum(col("v")).cast(DecimalType(38, 2)).as("sv"))
        .select(col("band"), col("n_events"),
          (col("sv").cast("double") / col("n_events").cast("double"))
            .as("mean_value"))
        .orderBy("band")
    },
    Some("""WITH e AS (SELECT
          (CAST(row_number() OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS BIGINT) - 1) // 10 AS band,
          CAST(value AS DECIMAL(18,2)) AS v
        FROM events)
      SELECT band, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(CAST(SUM(v) AS DECIMAL(38,2)) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS mean_value
      FROM e GROUP BY band
      ORDER BY band"""),
    covers = Seq("A-seq-position"))

  // ------------------------------------------------- retention triangle
  // The classic weekly retention triangle: users cohorted by first-
  // event week, each (cohort, week-index ≤ 7) cell counting distinct
  // returners and the retention rate against the cohort size. Two
  // collapses (first-event, cell distinct) — no window at all.
  private val q386 = QueryDef(
    "q386_retention_triangle",
    (s, dir) => {
      val e = t(s, dir, "events").select(col("user_id"),
        date_trunc("week", to_date(col("ts"))).cast("date").as("wk"))
      val first = e.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      val cells = e.join(first, Seq("user_id"))
        .withColumn("wk_idx",
          expr("datediff(wk, cohort) DIV 7"))
        .filter(col("wk_idx") <= 7)
        .groupBy("cohort", "wk_idx")
        .agg(countDistinct(col("user_id")).as("users"))
      val size = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
      cells.join(broadcast(size), Seq("cohort"))
        .select(col("cohort"), col("wk_idx"), col("users"),
          col("cohort_size"),
          (col("users").cast("double") / col("cohort_size").cast("double"))
            .as("retention"))
        .orderBy("cohort", "wk_idx")
    },
    Some("""WITH e AS (SELECT user_id,
          CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS wk
        FROM events),
      f AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id),
      cells AS (SELECT cohort, CAST(wk - cohort AS BIGINT) // 7 AS wk_idx,
          CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users
        FROM e JOIN f USING (user_id)
        WHERE CAST(wk - cohort AS BIGINT) // 7 <= 7
        GROUP BY cohort, wk_idx),
      sz AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
             FROM f GROUP BY cohort)
      SELECT cohort, wk_idx, users, cohort_size,
        CAST(users AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS retention
      FROM cells JOIN sz USING (cohort)
      ORDER BY cohort, wk_idx"""),
    covers = Seq("A-retention-triangle"))

  // ------------------------------------------------- top-k stability
  // Would the top-20 token list survive resampling? Compute it
  // independently on each md5-parity half of the corpus and report
  // the overlap — the stability check that separates robust
  // statistics from noise. Set overlap via a join of two bounded
  // top-k lists.
  private val q387 = QueryDef(
    "q387_topk_stability",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("arm",
          (conv(substring(md5(col("text")), 1, 8), 16, 10)
            .cast(LongType) % 2).cast(LongType))
      def topk(arm: Int): DataFrame = d.filter(col("arm") === arm)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("f"))
        .orderBy(desc("f"), asc("term")).limit(20)
        .select(col("term"))
      val a = topk(0)
      val b = topk(1)
      val inter = a.join(b, Seq("term")).count()
      import s.implicits._
      Seq((20L, inter, inter.toDouble / (40 - inter).toDouble))
        .toDF("k", "n_overlap", "jaccard")
    },
    Some("""WITH arm AS (SELECT text,
          CAST(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 2
            AS BIGINT) AS arm
        FROM documents),
      ta AS (SELECT term FROM (
          SELECT unnest(string_split(text, ' ')) AS term FROM arm
          WHERE arm = 0)
        GROUP BY term ORDER BY COUNT(*) DESC, term LIMIT 20),
      tb AS (SELECT term FROM (
          SELECT unnest(string_split(text, ' ')) AS term FROM arm
          WHERE arm = 1)
        GROUP BY term ORDER BY COUNT(*) DESC, term LIMIT 20),
      i AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap
            FROM ta JOIN tb USING (term))
      SELECT CAST(20 AS BIGINT) AS k, n_overlap,
        CAST(n_overlap AS DOUBLE) / CAST(40 - n_overlap AS DOUBLE)
          AS jaccard
      FROM i"""),
    covers = Seq("STAT-topk-stability"))

  // ------------------------------------------------- seasonal autocorr
  // Lag-24h autocorrelation of the hourly volume series per event
  // type — does the daily cycle actually repeat? The series joins
  // itself at exactly +24 hours (epoch-hour integers), the
  // correlation comes from the q322 integer-sufficient-statistics
  // pattern over the matched pairs.
  private val q388 = QueryDef(
    "q388_hourly_seasonal_autocorr",
    (s, dir) => {
      val hourly = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) DIV 3600000000").as("h"))
        .agg(count(lit(1)).as("x"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
      val j = hourly.as("a").join(hourly.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.h") === col("a.h") + 24)
        .select(col("a.event_type").as("event_type"),
          col("a.x").as("x"), col("b.x").as("y"))
      val g = j.groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val num = dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))
      val den1 = dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
      val den2 = dec(col("n")) * dec(col("syy")) - dec(col("sy")) * dec(col("sy"))
      g.withColumn("num", num).withColumn("den1", den1).withColumn("den2", den2)
        .filter(col("den1") > 0 && col("den2") > 0)
        .select(col("event_type"), col("n").as("n_pairs"),
          (col("num").cast("double") /
            (sqrt(col("den1").cast("double")) * sqrt(col("den2").cast("double"))))
            .as("autocorr_24h"))
        .orderBy("event_type")
    },
    Some("""WITH hourly AS (SELECT event_type,
          epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, h),
      j AS (SELECT a.event_type, a.x AS x, b.x AS y
        FROM hourly a JOIN hourly b
          ON a.event_type = b.event_type AND b.h = a.h + 24),
      g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(x * y) AS BIGINT) AS sxy,
          CAST(SUM(x * x) AS BIGINT) AS sxx,
          CAST(SUM(y * y) AS BIGINT) AS syy
        FROM j GROUP BY event_type),
      f AS (SELECT event_type, n,
          CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
          CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den1,
          CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den2
        FROM g)
      SELECT event_type, n AS n_pairs,
        CAST(num AS DOUBLE)
          / (sqrt(CAST(den1 AS DOUBLE)) * sqrt(CAST(den2 AS DOUBLE)))
          AS autocorr_24h
      FROM f WHERE den1 > 0 AND den2 > 0
      ORDER BY event_type"""),
    covers = Seq("TS-seasonal-autocorr"))

  val all: Seq[QueryDef] =
    Seq(q384, q385, q386, q387, q388)
}
