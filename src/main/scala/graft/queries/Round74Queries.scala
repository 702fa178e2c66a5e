package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.Tables

/** Round-74 gate additions (q389–q393): novelty decay, brand
  * seasonality, Poisson checks, outage detection, and activity
  * shape.
  */
object Round74Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- novelty decay
  // Is later-ingested content still new? Per ingestion decile (ntile
  // over doc_id), the share of its 3-gram shingle INSTANCES whose
  // first corpus occurrence (min doc_id) falls in that same decile —
  // the new-content rate a crawl-scheduling decision reads. Shingle
  // first-owners aggregate once; everything else is exact counts.
  private val q389 = QueryDef(
    "q389_novelty_by_ingestion",
    (s, dir) => {
      val d = t(s, dir, "documents")
      // ingestion deciles over ALL DOCUMENTS — row-scale; two-phase
      // GlobalOrder form (round-12 window audit, bit-identical by
      // GlobalOrderSpec)
      val dec = graft.operators.GlobalOrder.ntile(
          d.select(col("doc_id")), 10, col("doc_id"), leadDesc = false,
          Seq(col("doc_id")), "decile")
        .withColumn("decile", col("decile").cast(LongType))
      val sh = d.select(col("doc_id"),
        explode(graft.functions.WordShingles(d.sparkSession, col("text"), 3))
          .as("s")).distinct()
      val firstOwner = sh.groupBy("s").agg(min(col("doc_id")).as("first_doc"))
      val inst = sh.join(firstOwner, Seq("s"))
        .join(dec, Seq("doc_id"))
        .join(dec.select(col("doc_id").as("first_doc"),
          col("decile").as("first_decile")), Seq("first_doc"))
      inst.groupBy("decile")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_decile") === col("decile"), 1L).otherwise(0L))
            .as("novel"))
        .select(col("decile"), col("n_shingles"), col("novel"),
          (col("novel").cast("double") / col("n_shingles").cast("double"))
            .as("novelty_rate"))
        .orderBy("decile")
    },
    Some("""WITH dec AS (SELECT doc_id,
          CAST(ntile(10) OVER (ORDER BY doc_id) AS BIGINT) AS decile
        FROM documents),
      toksrc AS (SELECT doc_id, string_split(text, ' ') AS tk
                 FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
                      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
             FROM toksrc WHERE len(tk) >= 3),
      fo AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s),
      inst AS (SELECT d1.decile, d2.decile AS first_decile
        FROM sh
        JOIN fo USING (s)
        JOIN dec d1 ON sh.doc_id = d1.doc_id
        JOIN dec d2 ON fo.first_doc = d2.doc_id)
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        CAST(SUM(CASE WHEN first_decile = decile THEN 1 ELSE 0 END)
          AS BIGINT) AS novel,
        CAST(SUM(CASE WHEN first_decile = decile THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty_rate
      FROM inst GROUP BY decile
      ORDER BY decile"""),
    covers = Seq("DD-novelty-decay"))

  // ------------------------------------------------- brand seasonality
  // Brand revenue-share swing across quarters: each brand's min and
  // max quarterly share of total revenue and the swing between them —
  // which brands are seasonal. Shares are rational doubles, but only
  // order-free summaries (min/max) aggregate them.
  private val q390 = QueryDef(
    "q390_brand_seasonal_swing",
    (s, dir) => {
      val rev = (col("l_extendedprice").cast(DecimalType(18, 2)) *
        (lit(1).cast(DecimalType(18, 2)) -
          col("l_discount").cast(DecimalType(18, 2)))).cast(DecimalType(18, 4))
      val q = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"),
          quarter(to_date(col("l_shipdate"))).cast(LongType).as("qtr"),
          rev.as("r"))
      val cell = q.groupBy("brand", "qtr")
        .agg(sum(col("r")).cast(DecimalType(38, 4)).as("br"))
      val qtot = q.groupBy("qtr")
        .agg(sum(col("r")).cast(DecimalType(38, 4)).as("qt"))
      val shares = cell.join(broadcast(qtot), Seq("qtr"))
        .withColumn("share",
          col("br").cast("double") / col("qt").cast("double"))
      shares.groupBy("brand")
        .agg(count(lit(1)).as("n_quarters"),
          min(col("share")).as("min_share"),
          max(col("share")).as("max_share"))
        .withColumn("swing", col("max_share") - col("min_share"))
        .orderBy("brand")
    },
    Some("""WITH li AS (SELECT p_brand AS brand,
          CAST(EXTRACT(quarter FROM CAST(l_shipdate AS DATE)) AS BIGINT)
            AS qtr,
          CAST(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
            AS DECIMAL(18,4)) AS r
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      cell AS (SELECT brand, qtr, CAST(SUM(r) AS DECIMAL(38,4)) AS br
               FROM li GROUP BY brand, qtr),
      qtot AS (SELECT qtr, CAST(SUM(r) AS DECIMAL(38,4)) AS qt
               FROM li GROUP BY qtr),
      sh AS (SELECT brand, cell.qtr,
          CAST(br AS DOUBLE) / CAST(qt AS DOUBLE) AS share
        FROM cell JOIN qtot USING (qtr))
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_quarters,
        MIN(share) AS min_share, MAX(share) AS max_share,
        MAX(share) - MIN(share) AS swing
      FROM sh GROUP BY brand
      ORDER BY brand"""),
    covers = Seq("A-brand-seasonality"))

  // ------------------------------------------------- Fano factor
  // Poisson sanity check on daily order arrivals per segment: the
  // variance-to-mean ratio (n·Σx² − S²)/(n·S) from exact integer
  // moments — ≈1 for Poisson arrivals, ≫1 for bursty/overdispersed
  // demand (which breaks naive capacity planning).
  private val q391 = QueryDef(
    "q391_fano_factor",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("x"))
      daily.groupBy("segment")
        .agg(count(lit(1)).as("n_days"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
        .select(col("segment"), col("n_days"),
          (col("sx").cast("double") / col("n_days").cast("double"))
            .as("mean_daily"),
          ((col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double") /
            (col("n_days") * col("sx")).cast("double")).as("fano"))
        .orderBy("segment")
    },
    Some("""WITH daily AS (SELECT c_mktsegment AS segment,
          CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY segment, d),
      g AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_days,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM daily GROUP BY segment)
      SELECT segment, n_days,
        CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_daily,
        CAST(n_days * sxx - sx * sx AS DOUBLE)
          / CAST(n_days * sx AS DOUBLE) AS fano
      FROM g ORDER BY segment"""),
    covers = Seq("STAT-fano"))

  // ------------------------------------------------- longest quiet period
  // Outage / data-loss detector: per event type, the longest run of
  // consecutive missing days between active days (max lag gap − 1)
  // and when it started — one lag window over the active-day set, no
  // calendar spine needed.
  private val q392 = QueryDef(
    "q392_longest_quiet_period",
    (s, dir) => {
      val days = t(s, dir, "events")
        .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      val w = Window.partitionBy("event_type").orderBy("d")
      val gaps = days
        .withColumn("prev", lag(col("d"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("quiet", datediff(col("d"), col("prev")).cast(LongType) - 1L)
      val pick = Window.partitionBy("event_type")
        .orderBy(desc("quiet"), asc("d"))
      gaps.withColumn("rn", row_number().over(pick)).filter(col("rn") === 1)
        .select(col("event_type"), col("quiet").as("max_quiet_days"),
          col("prev").as("quiet_started_after"),
          col("d").as("resumed_on"))
        .orderBy("event_type")
    },
    Some("""WITH days AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS d
          FROM events),
      g AS (SELECT event_type, d,
          lag(d) OVER (PARTITION BY event_type ORDER BY d) AS prev
        FROM days),
      q AS (SELECT event_type, d, prev,
          CAST(d - prev AS BIGINT) - 1 AS quiet
        FROM g WHERE prev IS NOT NULL),
      pick AS (SELECT *, row_number() OVER (PARTITION BY event_type
          ORDER BY quiet DESC, d) AS rn FROM q)
      SELECT event_type, quiet AS max_quiet_days,
        prev AS quiet_started_after, d AS resumed_on
      FROM pick WHERE rn = 1
      ORDER BY event_type"""),
    covers = Seq("TS-quiet-period"))

  // ------------------------------------------------- activity histogram
  // The shape of user activity: users bucketed by event count
  // (DIV 25), with each bucket's user count and share of total events
  // — the participation-inequality chart (a few users usually carry
  // most of the log).
  private val q393 = QueryDef(
    "q393_activity_histogram",
    (s, dir) => {
      val per = t(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .withColumn("bucket", expr("n DIV 25"))
      val tot = per.agg(sum(col("n")).as("te"), count(lit(1)).as("tu"))
      per.groupBy("bucket")
        .agg(count(lit(1)).as("n_users"), sum(col("n")).as("events"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_users"),
          (col("n_users").cast("double") / col("tu").cast("double"))
            .as("user_share"),
          (col("events").cast("double") / col("te").cast("double"))
            .as("event_share"))
        .orderBy("bucket")
    },
    Some("""WITH per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY user_id),
      b AS (SELECT n // 25 AS bucket, n FROM per),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS te,
          CAST(COUNT(*) AS BIGINT) AS tu FROM per)
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(COUNT(*) AS DOUBLE) / CAST(MIN(tu) AS DOUBLE) AS user_share,
        CAST(SUM(n) AS DOUBLE) / CAST(MIN(te) AS DOUBLE) AS event_share
      FROM b, tot GROUP BY bucket
      ORDER BY bucket"""),
    covers = Seq("A-activity-shape"))

  val all: Seq[QueryDef] =
    Seq(q389, q390, q391, q392, q393)
}
