package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-70 gate additions (q369–q373): winsorization effects,
  * dimension-text mining, JSON-feature correlation, robust anomaly
  * counting, and confidence intervals.
  */
object Round70Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val Q = 1048576L
  private val Q2 = 1099511627776d

  // ------------------------------------------------- winsorize effect
  // What clipping at P1/P99 does to each probe dimension's variance:
  // the winsorized-to-raw variance ratio. Clipped values stay exact
  // integers (least/greatest on quantized longs), so both variances
  // come from exact sums; thresholds broadcast from an 8-row
  // aggregate.
  private val q369 = QueryDef(
    "q369_winsorize_effect",
    (s, dir) => {
      val dims = 0 until 64 by 8
      val e = t(s, dir, "embeddings").select(
        dims.map(d => floor(element_at(col("embedding"), d + 1).cast("double")
          * lit(Q.toDouble)).cast(LongType).as(s"q$d")): _*)
      val long = e.select(explode(array(dims.map(d =>
        struct(lit(d.toLong).as("dim"), col(s"q$d").as("qv"))): _*)).as("p"))
        .select(col("p.dim"), col("p.qv"))
      val th = long.groupBy("dim").agg(
        expr("percentile_disc(0.01) WITHIN GROUP (ORDER BY qv)")
          .cast(LongType).as("p01"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY qv)")
          .cast(LongType).as("p99"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
      val g = long.join(broadcast(th), Seq("dim"))
        .withColumn("wv", least(greatest(col("qv"), col("p01")), col("p99")))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"),
          sum(col("qv")).as("sx"), sum(col("qv") * col("qv")).as("sxx"),
          sum(col("wv")).as("wx"), sum(col("wv") * col("wv")).as("wxx"))
      g.select(col("dim"),
        ((dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx")))
          .cast("double") /
          ((col("n") * col("n")).cast("double") * lit(Q2))).as("raw_var"),
        ((dec(col("n")) * dec(col("wxx")) - dec(col("wx")) * dec(col("wx")))
          .cast("double") /
          ((col("n") * col("n")).cast("double") * lit(Q2))).as("wins_var"),
        ((dec(col("n")) * dec(col("wxx")) - dec(col("wx")) * dec(col("wx")))
          .cast("double") /
          (dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx")))
            .cast("double")).as("var_ratio"))
        .orderBy("dim")
    },
    Some("""WITH dims AS (SELECT unnest([0,8,16,24,32,40,48,56]) AS d),
      lng AS (SELECT CAST(d AS BIGINT) AS dim,
          CAST(floor(CAST(embedding[d + 1] AS DOUBLE) * 1048576) AS BIGINT)
            AS qv
        FROM embeddings, dims),
      th AS (SELECT dim,
          CAST(percentile_disc(0.01) WITHIN GROUP (ORDER BY qv) AS BIGINT)
            AS p01,
          CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY qv) AS BIGINT)
            AS p99
        FROM lng GROUP BY dim),
      w AS (SELECT lng.dim, qv,
          LEAST(GREATEST(qv, p01), p99) AS wv
        FROM lng JOIN th USING (dim)),
      g AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(qv) AS BIGINT) AS sx, CAST(SUM(qv * qv) AS BIGINT) AS sxx,
          CAST(SUM(wv) AS BIGINT) AS wx, CAST(SUM(wv * wv) AS BIGINT) AS wxx
        FROM w GROUP BY dim)
      SELECT dim,
        CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
          / (CAST(n * n AS DOUBLE) * CAST(1099511627776 AS DOUBLE))
          AS raw_var,
        CAST(CAST(n AS HUGEINT) * wxx - CAST(wx AS HUGEINT) * wx AS DOUBLE)
          / (CAST(n * n AS DOUBLE) * CAST(1099511627776 AS DOUBLE))
          AS wins_var,
        CAST(CAST(n AS HUGEINT) * wxx - CAST(wx AS HUGEINT) * wx AS DOUBLE)
          / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
              AS DOUBLE) AS var_ratio
      FROM g ORDER BY dim"""),
    covers = Seq("SIM-winsorize"))

  // ------------------------------------------------- part-name lift
  // Dimension-text mining: which words in part NAMES associate with
  // higher unit revenue? Token-level mean line revenue vs the global
  // mean (exact DECIMAL sums through one division each), top-15 by
  // support. The name explode happens at part cardinality, then joins
  // the fact once on partkey.
  private val q370 = QueryDef(
    "q370_part_name_lift",
    (s, dir) => {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      val li = t(s, dir, "lineitem").select(col("l_partkey"), rev.as("r"))
      val tok = t(s, dir, "part")
        .select(col("p_partkey"), explode(split(col("p_name"), " "))
          .as("word"))
      val g = li.join(tok, col("l_partkey") === col("p_partkey"))
        .groupBy("word")
        .agg(count(lit(1)).as("n_lines"),
          sum(col("r")).cast(DecimalType(38, 4)).as("wrev"))
      val tot = li.agg(count(lit(1)).as("tn"),
        sum(col("r")).cast(DecimalType(38, 4)).as("tr"))
      g.crossJoin(broadcast(tot))
        .orderBy(desc("n_lines"), asc("word")).limit(15)
        .select(col("word"), col("n_lines"),
          (col("wrev").cast("double") / col("n_lines").cast("double"))
            .as("mean_rev"),
          ((col("wrev").cast("double") / col("n_lines").cast("double")) /
            (col("tr").cast("double") / col("tn").cast("double")))
            .as("lift"))
        .orderBy(desc("n_lines"), asc("word"))
    },
    Some("""WITH li AS (SELECT l_partkey,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4)) AS r
        FROM lineitem),
      tok AS (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
              FROM part),
      g AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_lines,
          CAST(SUM(r) AS DECIMAL(38,4)) AS wrev
        FROM li JOIN tok ON l_partkey = p_partkey
        GROUP BY word),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tn,
          CAST(SUM(r) AS DECIMAL(38,4)) AS tr FROM li),
      top AS (SELECT * FROM g, tot ORDER BY n_lines DESC, word LIMIT 15)
      SELECT word, n_lines,
        CAST(wrev AS DOUBLE) / CAST(n_lines AS DOUBLE) AS mean_rev,
        (CAST(wrev AS DOUBLE) / CAST(n_lines AS DOUBLE))
          / (CAST(tr AS DOUBLE) / CAST(tn AS DOUBLE)) AS lift
      FROM top ORDER BY n_lines DESC, word"""),
    covers = Seq("TXT-dim-mining"))

  // ------------------------------------------------- props correlation
  // Does the JSON payload's k field track the event value? Pearson
  // per event type over (k, value·100) — JSON extraction feeding
  // integer sufficient statistics (the q322 pattern); k parses with
  // get_json_object ↔ json_extract, both exact integers.
  private val q371 = QueryDef(
    "q371_props_value_corr",
    (s, dir) => {
      val e = t(s, dir, "events").select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("x"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("y"))
        .filter(col("x").isNotNull)
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
      val g = e.groupBy("event_type")
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
        .select(col("event_type"), col("n").as("n_events"),
          (col("num").cast("double") /
            (sqrt(col("den1").cast("double")) * sqrt(col("den2").cast("double"))))
            .as("corr"))
        .orderBy("event_type")
    },
    Some("""WITH e AS (SELECT event_type,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS x,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL),
      g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
          CAST(SUM(x * y) AS BIGINT) AS sxy,
          CAST(SUM(x * x) AS BIGINT) AS sxx,
          CAST(SUM(y * y) AS BIGINT) AS syy
        FROM e GROUP BY event_type),
      f AS (SELECT event_type, n,
          CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
          CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den1,
          CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS den2
        FROM g)
      SELECT event_type, n AS n_events,
        CAST(num AS DOUBLE)
          / (sqrt(CAST(den1 AS DOUBLE)) * sqrt(CAST(den2 AS DOUBLE))) AS corr
      FROM f WHERE den1 > 0 AND den2 > 0
      ORDER BY event_type"""),
    covers = Seq("J-json-corr"))

  // ------------------------------------------------- robust anomaly days
  // Robust anomaly census: a day is anomalous for a type when its
  // count deviates from the type's MEDIAN by more than 3× the MAD
  // (both exact order statistics over integer counts — no mean/sd to
  // be dragged by the outliers being hunted). Reports the anomaly
  // count and rate per type.
  private val q372 = QueryDef(
    "q372_robust_anomaly_days",
    (s, dir) => {
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("x"))
      val med = daily.groupBy("event_type")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)")
          .cast(LongType).as("med"))
      val dev = daily.join(broadcast(med), Seq("event_type"))
        .withColumn("ad", abs(col("x") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ad)")
          .cast(LongType).as("mad"))
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          first(col("med")).as("median_daily"),
          first(col("mad")).as("mad"),
          sum(when(col("ad") > col("mad") * 3, 1L).otherwise(0L))
            .as("n_anomalies"))
        .withColumn("anomaly_rate",
          col("n_anomalies").cast("double") / col("n_days").cast("double"))
        .orderBy("event_type")
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, d),
      med AS (SELECT event_type,
          CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY x) AS BIGINT)
            AS med
        FROM daily GROUP BY event_type),
      dev AS (SELECT daily.event_type, x, med, abs(x - med) AS ad
        FROM daily JOIN med USING (event_type)),
      mad AS (SELECT event_type,
          CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ad) AS BIGINT)
            AS mad
        FROM dev GROUP BY event_type)
      SELECT dev.event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        MIN(med) AS median_daily, MIN(mad) AS mad,
        CAST(SUM(CASE WHEN ad > mad * 3 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_anomalies,
        CAST(SUM(CASE WHEN ad > mad * 3 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS anomaly_rate
      FROM dev JOIN mad USING (event_type)
      GROUP BY dev.event_type
      ORDER BY dev.event_type"""),
    covers = Seq("TS-robust-anomaly"))

  // ------------------------------------------------- mean CI
  // Normal-approximation 95% confidence interval for mean document
  // length per source: mean ± 1.96·s/√n, everything from exact
  // integer moments, sqrt IEEE-exact — the uncertainty column every
  // per-source report should carry.
  private val q373 = QueryDef(
    "q373_mean_ci",
    (s, dir) => {
      val g = t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
      val mean = col("sx").cast("double") / col("n").cast("double")
      val se = sqrt(
        (col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) /
          (col("n").cast("double") * col("n").cast("double") *
            (col("n") - 1L).cast("double")))
      g.filter(col("n") > 1)
        .select(col("source"), col("n").as("n_docs"),
          mean.as("mean_chars"),
          (mean - lit(1.96d) * se).as("ci_lo"),
          (mean + lit(1.96d) * se).as("ci_hi"))
        .orderBy("source")
    },
    Some("""WITH g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(n_chars) AS BIGINT) AS sx,
          CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY source)
      SELECT source, n AS n_docs,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_chars,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
          - CAST(1.96 AS DOUBLE) * sqrt(
            (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               * CAST(n - 1 AS DOUBLE))) AS ci_lo,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
          + CAST(1.96 AS DOUBLE) * sqrt(
            (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
               * CAST(n - 1 AS DOUBLE))) AS ci_hi
      FROM g WHERE n > 1
      ORDER BY source"""),
    covers = Seq("STAT-ci"))

  val all: Seq[QueryDef] =
    Seq(q369, q370, q371, q372, q373)
}
