package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-20 gate queries. */
class Round20QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("merge-schema read: both eras land, pre-schema rows null the new column") {
    val out = graft.SparkEntry.queries("q217_merge_schema_read")(spark, dir).cache()
    val o = graft.Tables.load(spark, dir, "orders")
    assert(out.agg(sum("n")).head().getLong(0) === o.count(),
      "no row may be lost across the schema boundary")
    val pre = out.agg(sum("n_pre_schema")).head().getLong(0)
    assert(pre === o.filter(col("o_orderkey") % 2 === 0).count(),
      "every pre-evolution row must surface the new column as NULL")
    out.unpersist()
  }

  test("sequence gaps: disjoint, ordered, and length-consistent") {
    val out = graft.SparkEntry.queries("q218_sequence_gaps")(spark, dir).cache()
    assert(out.count() > 0, "the open-status subset must contain holes")
    assert(out.filter(col("gap_end") < col("gap_start")).isEmpty)
    assert(out.filter(col("gap_len") =!= col("gap_end") - col("gap_start") + 1).isEmpty)
    // no reported gap may contain an existing key
    val keys = graft.Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select((col("o_orderkey") % 65536).as("k")).distinct()
    val overlap = out.join(keys,
      col("k") >= col("gap_start") && col("k") <= col("gap_end"))
    assert(overlap.isEmpty, "a gap may never contain a present key")
    out.unpersist()
  }

  test("jsonl round-trip: nested payloads survive bit-exact") {
    val out = graft.SparkEntry.queries("q219_jsonl_roundtrip")(spark, dir).cache()
    val d = graft.Tables.load(spark, dir, "documents")
    assert(out.count() === d.count())
    val direct = d.select(col("doc_id"),
      md5(array_join(split(col("text"), " "), " ").cast("binary")).as("d2"),
      col("n_chars").as("c2"))
    val j = out.join(direct, "doc_id")
    assert(j.filter(col("tok_digest") =!= col("d2")).isEmpty)
    assert(j.filter(col("n_chars") =!= col("c2")).isEmpty)
    out.unpersist()
  }
}
