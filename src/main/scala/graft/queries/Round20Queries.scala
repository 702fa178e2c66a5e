package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-20 gate additions (q217+): schema-evolution reads, sequence
  * gap detection, and nested-JSON sink fidelity.
  */
object Round20Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------- schema-evolution read
  // The S6 posture under the oracle: two parquet batches whose schemas
  // drifted (the newer one adds a column) land in one directory; a
  // mergeSchema read reconciles them by NAME — early rows surface the
  // missing column as NULL — and aggregates both eras. Losing a
  // column, misaligning by position, or dropping either batch
  // hash-mismatches against an oracle that rebuilds the union from
  // the source table. (q89 gates the in-memory unionByName twin.)
  private val q217 = QueryDef(
    "q217_merge_schema_read",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val path = "/tmp/graft_gate_merge_schema"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("append").parquet(path)
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
        .write.mode("append").parquet(path)
      s.read.option("mergeSchema", "true").parquet(path)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("price").isNull, 1L).otherwise(0L)).as("n_pre_schema"),
          sum(col("price")).cast("double").as("revenue_post"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_pre_schema,
        CAST(SUM(CASE WHEN o_orderkey % 2 = 1
          THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS revenue_post
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    covers = Seq("SRC-merge-schema"))

  // ------------------------------------------- sequence gap detection
  // Completeness QA for an id-keyed feed: which order-key ranges are
  // missing per 4096-wide page? Gaps surface from ONE lag window over
  // the sorted distinct keys — lead-minus-current > 1 marks a hole
  // with exact integer bounds — never from a generate_series
  // anti-join, whose spine is O(key range) instead of O(rows).
  // doc_id-keyed tables gate the same shape via q183's date spine.
  private val q218 = QueryDef(
    "q218_sequence_gaps",
    (s, dir) => {
      // the open-status feed: a non-contiguous key subset, so holes
      // actually occur at every scale
      val keys = t(s, dir, "orders")
        .filter(col("o_orderstatus") === "O")
        .select((col("o_orderkey") % 65536).as("k")).distinct()
      val w = Window.orderBy("k")
      keys
        .withColumn("nxt", lead(col("k"), 1).over(w))
        .filter(col("nxt") - col("k") > 1)
        .select(
          (col("k") + 1).as("gap_start"),
          (col("nxt") - 1).as("gap_end"),
          (col("nxt") - col("k") - 1).as("gap_len"))
        .orderBy("gap_start")
    },
    Some("""WITH keys AS (SELECT DISTINCT o_orderkey % 65536 AS k FROM orders
        WHERE o_orderstatus = 'O'),
      g AS (SELECT k, lead(k) OVER (ORDER BY k) AS nxt FROM keys)
      SELECT k + 1 AS gap_start, nxt - 1 AS gap_end, nxt - k - 1 AS gap_len
      FROM g WHERE nxt - k > 1 ORDER BY gap_start"""),
    covers = Seq("QA-sequence-gaps"))

  // ------------------------------------------- nested JSONL fidelity
  // The S4 JSONL sink with NESTED payloads: each document wraps into
  // a struct with an array field and a sub-struct, writes through
  // Spark's JSON sink (its native output is JSONL), reads back with
  // an explicit schema, and digests the reassembled fields. Nesting
  // loss, array reordering, or unicode mangling in the write→read
  // cycle hash-mismatches the no-I/O oracle. (q204 pins the CSV twin;
  // MalformedJsonSpec covers the corrupt-input side.)
  private val q219 = QueryDef(
    "q219_jsonl_roundtrip",
    (s, dir) => {
      val src = t(s, dir, "documents").select(
        col("doc_id"),
        struct(
          col("source"),
          split(col("text"), " ").as("tokens"),
          struct(col("lang"), col("n_chars")).as("meta")).as("payload"))
      val path = "/tmp/graft_gate_jsonl_roundtrip"
      src.write.mode("overwrite").json(path)
      s.read
        .schema("doc_id LONG, payload STRUCT<source: STRING, " +
          "tokens: ARRAY<STRING>, meta: STRUCT<lang: STRING, n_chars: LONG>>")
        .json(path)
        .select(col("doc_id"),
          col("payload.source").as("source"),
          size(col("payload.tokens")).as("n_tokens"),
          md5(array_join(col("payload.tokens"), " ").cast("binary")).as("tok_digest"),
          col("payload.meta.lang").as("lang"),
          col("payload.meta.n_chars").as("n_chars"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, source,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        md5(array_to_string(string_split(text, ' '), ' ')) AS tok_digest,
        lang, n_chars
      FROM documents ORDER BY doc_id"""),
    covers = Seq("SRC-jsonl-nested"))

  val all: Seq[QueryDef] =
    Seq(q217, q218, q219)
}
