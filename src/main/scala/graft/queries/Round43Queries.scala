package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-43 gate additions (q286+): burst detection and sketch
  * calibration.
  */
object Round43Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- peak rate
  // Peak 60-second burst per user: the max number of events any
  // sliding minute contains — the rate-limit/abuse metric. The
  // sliding count is ONE time-RANGE window frame ((us−60s, us], an
  // integer-µs frame so both engines cut it identically), the peak
  // and its first achieving instant come from a max + filtered min
  // over the user partition. No self-join, no per-second explode:
  // O(events) with two shared-sort windows, user-partitioned at any
  // scale.
  private val q286 = QueryDef(
    "q286_peak_rate",
    (s, dir) => {
      val wSlide = Window.partitionBy("user_id").orderBy("us")
        .rangeBetween(-59999999L, 0)
      val wUser = Window.partitionBy("user_id")
      t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .withColumn("cnt", count(lit(1)).over(wSlide))
        .withColumn("peak", max(col("cnt")).over(wUser))
        .withColumn("n_events", count(lit(1)).over(wUser))
        .filter(col("cnt") === col("peak"))
        .groupBy("user_id")
        .agg(first(col("n_events")).as("n_events"),
          first(col("peak")).as("peak_60s"),
          min(col("us")).as("peak_at_us"))
        .orderBy("user_id")
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      w AS (SELECT *,
          CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY us
            RANGE BETWEEN 59999999 PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cnt,
          CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
        FROM e),
      p AS (SELECT *, MAX(cnt) OVER (PARTITION BY user_id) AS peak FROM w)
      SELECT user_id, MIN(n_events) AS n_events,
        CAST(MIN(peak) AS BIGINT) AS peak_60s,
        MIN(us) AS peak_at_us
      FROM p WHERE cnt = peak GROUP BY user_id ORDER BY user_id"""),
    covers = Seq("TS-peak-rate"))

  // ------------------------------------------------- sketch calibration
  // How good is the MinHash estimate? For a deterministic sample of
  // adjacent-id document pairs, compare the sketch estimate (equal
  // signature components / 16 — an integer ratio) against the EXACT
  // shingle Jaccard (distinct-set intersection over union, also
  // integers), and emit the absolute error. This is the calibration
  // audit that sizes nHashes before trusting the q23 LSH pipeline on
  // a corpus — and it is fully deterministic, so it hash-gates. The
  // signature compare is in-row (zip_with); the exact side is an
  // equi-join on shingles, postings-shaped like q22.
  private val q287 = QueryDef(
    "q287_minhash_calibration",
    (s, dir) => {
      val nH = 16
      val d = t(s, dir, "documents")
      // distinct at the array (per-row, in the scan task) instead of a
      // shuffle-level .distinct() — same rows, one exchange less per
      // evaluation. (Materializing sh/sig here measured WORSE: the
      // postings re-derive from a 1-task scan faster than checkpoint
      // blocks store + re-read, r11 A/B.)
      val sh = d.select(col("doc_id"),
          explode(array_distinct(
            graft.functions.WordShingles(s, col("text"), 3))).as("sh"))
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      val sig = sh.groupBy("doc_id")
        .agg(graft.functions.MinHashSignature(s, col("sh"), nH).as("sig"))
      val a = sig.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      val b = sig.select((col("doc_id") - 1).as("doc_a"),
        col("doc_id").as("doc_b"), col("sig").as("sig_b"))
      val matched = a.join(b, "doc_a")
      val est = aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, lit(1L)).otherwise(lit(0L))),
        lit(0L), (acc, x) => acc + x)
      val inter = sh.select(col("doc_id").as("doc_a"), col("sh"))
        .join(sh.select((col("doc_id") - 1).as("doc_a"), col("sh")), Seq("doc_a", "sh"))
        .groupBy("doc_a").agg(count(lit(1)).as("ninter"))
      matched
        .withColumn("n_eq", est)
        .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")),
          "doc_a")
        .join(sizes.select((col("doc_id") - 1).as("doc_a"), col("nsh").as("nb")),
          "doc_a")
        .join(inter, Seq("doc_a"), "left")
        .withColumn("ninter", coalesce(col("ninter"), lit(0L)))
        .select(col("doc_a"), col("doc_b"), col("n_eq"),
          (col("n_eq").cast("double") / lit(nH.toDouble)).as("est_jaccard"),
          (col("ninter").cast("double") /
            (col("na") + col("nb") - col("ninter")).cast("double"))
            .as("exact_jaccard"),
          abs(col("n_eq").cast("double") / lit(nH.toDouble) -
            col("ninter").cast("double") /
              (col("na") + col("nb") - col("ninter")).cast("double"))
            .as("abs_err"))
        .orderBy("doc_a")
    },
    Some {
      val hs = (0 until 16)
        .map(j => s"min(substr(md5('$j:' || sh), 1, 15)) AS h$j")
        .mkString(", ")
      val eqs = (0 until 16)
        .map(j => s"CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk
             FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh
             FROM tok, unnest(range(1, greatest(len(tk) - 1, 1))) r(i)
             WHERE len(tk) >= 3),
      sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh
                FROM sh GROUP BY 1),
      sig AS (SELECT doc_id, $hs FROM sh GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST($eqs AS BIGINT) AS n_eq
        FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id % 10 = 0),
      inter AS (SELECT a.doc_id AS doc_a, CAST(COUNT(*) AS BIGINT) AS ninter
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1 AND a.sh = b.sh
        WHERE a.doc_id % 10 = 0 GROUP BY 1)
      SELECT p.doc_a, p.doc_b, p.n_eq,
        CAST(p.n_eq AS DOUBLE) / CAST(16 AS DOUBLE) AS est_jaccard,
        CAST(COALESCE(i.ninter, 0) AS DOUBLE)
          / CAST(sa.nsh + sb.nsh - COALESCE(i.ninter, 0) AS DOUBLE)
          AS exact_jaccard,
        abs(CAST(p.n_eq AS DOUBLE) / CAST(16 AS DOUBLE)
          - CAST(COALESCE(i.ninter, 0) AS DOUBLE)
            / CAST(sa.nsh + sb.nsh - COALESCE(i.ninter, 0) AS DOUBLE))
          AS abs_err
      FROM pairs p
      JOIN sizes sa ON sa.doc_id = p.doc_a
      JOIN sizes sb ON sb.doc_id = p.doc_b
      LEFT JOIN inter i ON i.doc_a = p.doc_a
      ORDER BY p.doc_a"""
    },
    covers = Seq("DEDUP-calibration"))

  val all: Seq[QueryDef] =
    Seq(q286, q287)
}
