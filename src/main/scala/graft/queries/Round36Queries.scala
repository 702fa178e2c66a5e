package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-36 gate additions (q271+): cross-source vocabulary overlap,
  * arrival burstiness, and the trimmed mean.
  */
object Round36Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- vocab overlap
  // Pairwise Jaccard overlap of the SOURCES' vocabularies — which
  // corpora speak the same language? (q22 compares documents; this
  // compares collections.) Distinct (source, term) postings self-join
  // on term to count intersections; unions come from the exact
  // inclusion-exclusion |A|+|B|−|A∩B|, so the similarity is ONE
  // division of exact longs. The join key is the term — vocabulary-
  // sized, not corpus-sized — and the pair grid is sources², tiny at
  // any data scale. Pairs emit once (a < b).
  private val q271 = QueryDef(
    "q271_source_vocab_overlap",
    (s, dir) => {
      val posts = t(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
        .distinct()
      val sizes = posts.groupBy("source").agg(count(lit(1)).as("nv"))
      val inter = posts.as("a")
        .join(posts.as("b"), Seq("term"))
        .filter(col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("source").as("src_a"), col("nv").as("na")), "src_a")
        .join(sizes.select(col("source").as("src_b"), col("nv").as("nb")), "src_b")
        .select(col("src_a"), col("src_b"), col("na"), col("nb"), col("inter"),
          (col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double"))
            .as("jaccard"))
        .orderBy("src_a", "src_b")
    },
    Some("""WITH posts AS (SELECT DISTINCT source, t.term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
        WHERE length(t.term) > 0),
      sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nv
                FROM posts GROUP BY 1),
      inter AS (SELECT a.source AS src_a, b.source AS src_b,
                  CAST(COUNT(*) AS BIGINT) AS inter
        FROM posts a JOIN posts b USING (term)
        WHERE a.source < b.source GROUP BY 1, 2)
      SELECT src_a, src_b, sa.nv AS na, sb.nv AS nb, inter,
        CAST(inter AS DOUBLE) / CAST(sa.nv + sb.nv - inter AS DOUBLE) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.source = src_a
      JOIN sizes sb ON sb.source = src_b
      ORDER BY src_a, src_b"""),
    covers = Seq("TEXT-vocab-overlap"))

  // ------------------------------------------------- inter-arrival CV
  // Burstiness per user: the coefficient of variation of inter-event
  // gaps (CV ≈ 1 = Poisson, > 1 = bursty, < 1 = regular). Gaps are
  // integer SECONDS from lag() on unix_micros (µs div 10⁶ — q248's
  // pinned truncating div); a month of events bounds Σgap by the
  // month span, so with the moment products in DECIMAL(38,0) the
  // variance numerator n·Σx² − (Σx)² is exact at ANY event density.
  // One shared IEEE tree at the end: cv = √(num/(n(n−1))) · n / Σx.
  private val q272 = QueryDef(
    "q272_interarrival_cv",
    (s, dir) => {
      val d38 = DecimalType(38, 0)
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gaps = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("prev_us").isNotNull)
        .withColumn("gap_s",
          expr("(unix_micros(ts) - prev_us) div 1000000"))
      val g = gaps.groupBy("user_id").agg(
        count(lit(1)).as("n"),
        sum(col("gap_s")).as("sx"),
        sum(col("gap_s") * col("gap_s")).as("sxx"))
      val num = (col("n").cast(d38) * col("sxx").cast(d38)) -
        (col("sx").cast(d38) * col("sx").cast(d38))
      g.filter(col("n") >= 2 && col("sx") > 0)
        .select(col("user_id"), col("n").as("n_gaps"),
          (col("sx").cast("double") / col("n").cast("double"))
            .as("mean_gap_s"),
          (sqrt(num.cast("double") /
            (col("n").cast("double") * (col("n") - 1L).cast("double")))
            * col("n").cast("double") / col("sx").cast("double")).as("cv"))
        .orderBy("user_id")
    },
    Some("""WITH gaps AS (
        SELECT user_id,
          (epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
             ORDER BY ts, event_id)) // 1000000 AS gap_s
        FROM events),
      g AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(gap_s) AS BIGINT) AS sx,
          CAST(SUM(gap_s * gap_s) AS BIGINT) AS sxx
        FROM gaps WHERE gap_s IS NOT NULL GROUP BY 1)
      SELECT user_id, n AS n_gaps,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_s,
        sqrt(CAST(n::HUGEINT * sxx::HUGEINT - sx::HUGEINT * sx::HUGEINT AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
          * CAST(n AS DOUBLE) / CAST(sx AS DOUBLE) AS cv
      FROM g WHERE n >= 2 AND sx > 0 ORDER BY user_id"""),
    covers = Seq("TS-burstiness"))

  // ------------------------------------------------- trimmed mean
  // 10%-trimmed mean of order value per priority: DROP the bottom and
  // top decile by rank and average the interior — the robust mean
  // that q146's winsorize approximates by clamping. Row selection is
  // by row_number over a TOTAL order (value, then orderkey), so the
  // kept SET is engine-independent even with duplicate values; the
  // interior mean is an exact DECIMAL sum over that set with one
  // final cast. Trim boundaries use the pinned integer `div`.
  private val q273 = QueryDef(
    "q273_trimmed_mean",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority").as("p"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("x"),
          col("o_orderkey"))
      val w = Window.partitionBy("p").orderBy(col("x"), col("o_orderkey"))
      val ranked = o
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("p")))
      ranked
        .filter(col("i") > expr("n div 10") &&
          col("i") <= col("n") - expr("n div 10"))
        .groupBy("p")
        .agg(first(col("n")).as("n_total"),
          count(lit(1)).as("n_kept"),
          sum(col("x")).as("kept_sum"))
        .select(col("p"), col("n_total"), col("n_kept"),
          (col("kept_sum").cast("double") / col("n_kept").cast("double"))
            .as("trimmed_mean"))
        .orderBy("p")
    },
    Some("""WITH o AS (SELECT o_orderpriority AS p,
          CAST(o_totalprice AS DECIMAL(18,2)) AS x, o_orderkey
        FROM orders),
      ranked AS (SELECT *,
          CAST(ROW_NUMBER() OVER (PARTITION BY p ORDER BY x, o_orderkey)
            AS BIGINT) AS i,
          CAST(COUNT(*) OVER (PARTITION BY p) AS BIGINT) AS n
        FROM o)
      SELECT p, MIN(n) AS n_total, CAST(COUNT(*) AS BIGINT) AS n_kept,
        CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS trimmed_mean
      FROM ranked
      WHERE i > n // 10 AND i <= n - n // 10
      GROUP BY p ORDER BY p"""),
    covers = Seq("STAT-trimmed-mean"))

  val all: Seq[QueryDef] =
    Seq(q271, q272, q273)
}
