package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Round-40 gate additions (q280+): categorical target encoding and
  * the vocabulary growth curve.
  */
object Round40Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------- target encoding
  // Smoothed mean-target encoding of a categorical feature: each
  // market segment encodes as (Σy + m·prior)/(n + m) with m = 10 and
  // the global mean as prior — the leakage-resistant categorical
  // encoder of gradient-boosting pipelines. The prior is itself a
  // ratio, so the encode is computed from the EXACT common-denominator
  // form (Σy·N + m·S)/(N·(n + m)): DECIMAL(38,2) products of exact
  // sums, ONE closing division. Per-category aggregation is one
  // map-side-combined shuffle; the global scalar broadcasts.
  private val q280 = QueryDef(
    "q280_target_encoding",
    (s, dir) => {
      val d38 = DecimalType(38, 2)
      val o = t(s, dir, "orders").join(
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      val per = o.groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("sy"))
      val glob = per.agg(sum(col("n")).as("nn"),
        sum(col("sy")).cast(d38).as("ss"))
      per.crossJoin(broadcast(glob))
        .select(col("segment"), col("n"),
          (col("sy").cast("double") / col("n").cast("double")).as("raw_mean"),
          ((col("sy").cast(d38) * col("nn") + lit(10L) * col("ss"))
            .cast("double") /
            (col("nn") * (col("n") + lit(10L))).cast("double"))
            .as("encoded"))
        .orderBy("segment")
    },
    Some("""WITH o AS (SELECT c_mktsegment AS segment,
          CAST(o_totalprice AS DECIMAL(18,2)) AS y
        FROM orders JOIN customer ON o_custkey = c_custkey),
      per AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(y) AS sy FROM o GROUP BY 1),
      g AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
          CAST(SUM(sy) AS DECIMAL(38,2)) AS ss FROM per)
      SELECT segment, n,
        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS raw_mean,
        CAST(CAST(sy AS DECIMAL(38,2)) * nn + 10 * ss AS DOUBLE)
          / CAST(nn * (n + 10) AS DOUBLE) AS encoded
      FROM per CROSS JOIN g ORDER BY segment"""),
    covers = Seq("ML-target-encoding"))

  // ------------------------------------------------- vocab growth
  // Heaps'-law curve: how fast does the SHINGLE vocabulary grow as
  // documents stream in doc_id order? (Word unigrams saturate within
  // the first handful of docs on this corpus — trigram shingles, the
  // dedup family's unit, keep growing and show the real curve.) Each
  // shingle's FIRST document (an exact min() — duplicate-insensitive)
  // assigns it to a 25-doc bucket; new-shingle counts per bucket plus
  // a running window give the cumulative vocabulary — all integers,
  // and the running sum is over the bucket grain, not the corpus. The
  // curve flattening is the diminishing-returns signal data curation
  // reads before adding more of a source.
  private val q281 = QueryDef(
    "q281_vocab_growth",
    (s, dir) => {
      val sh = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.WordShingles(s, col("text"), 3)).as("sh"))
      val firstDoc = sh.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
      val buckets = firstDoc
        .groupBy(expr("first_doc div 25").as("bucket"))
        .agg(count(lit(1)).as("new_shingles"))
      val w = Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
      buckets
        .withColumn("cum_vocab", sum(col("new_shingles")).over(w))
        .select(col("bucket"), col("new_shingles"), col("cum_vocab"))
        .orderBy("bucket")
    },
    Some("""WITH sh AS (
        SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
             unnest(range(1, greatest(len(tk) - 1, 1))) r(i)
        WHERE len(tk) >= 3),
      firstdoc AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
      buckets AS (SELECT first_doc // 25 AS bucket,
          CAST(COUNT(*) AS BIGINT) AS new_shingles
        FROM firstdoc GROUP BY 1)
      SELECT bucket, new_shingles,
        CAST(SUM(new_shingles) OVER (ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_vocab
      FROM buckets ORDER BY bucket"""),
    covers = Seq("TEXT-vocab-growth"))

  val all: Seq[QueryDef] =
    Seq(q280, q281)
}
