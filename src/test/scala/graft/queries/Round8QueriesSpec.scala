package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-8 gate queries (the DuckDB gate
  * hash-checks exact values at sf0.01; these pin the properties that
  * must hold at ANY scale).
  */
class Round8QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tpch q7: only the two nations appear, never as a self-pair") {
    val out = graft.SparkEntry.queries("q169_tpch_q7")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(!col("supp_nation").isin("NATION_3", "NATION_8") ||
      !col("cust_nation").isin("NATION_3", "NATION_8")).isEmpty)
    assert(out.filter(col("supp_nation") === col("cust_nation")).isEmpty)
    assert(out.filter(col("revenue") <= 0).isEmpty)
    out.unpersist()
  }

  test("tpch q8: market share is a fraction of the year's total") {
    val out = graft.SparkEntry.queries("q170_tpch_q8")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("mkt_share") < 0 || col("mkt_share") > 1).isEmpty)
    assert(out.filter(col("total_rev") <= 0).isEmpty)
    out.unpersist()
  }

  test("tpch q14: promo share is a percentage") {
    val out = graft.SparkEntry.queries("q171_tpch_q14")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("promo_share") < 0 || col("promo_share") > 100).isEmpty)
    out.unpersist()
  }

  test("map hofs: filtered size bounded, squared mass dominates term count") {
    val out = graft.SparkEntry.queries("q172_map_hofs")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_repeated") > col("n_terms")).isEmpty)
    // each count >= 1 so sum of squares >= number of terms
    assert(out.filter(col("sq_mass") < col("n_terms")).isEmpty)
    out.unpersist()
  }

  test("url parse: host/path/query reconstruct from the raw columns") {
    val out = graft.SparkEntry.queries("q173_url_hash")(spark, dir).cache()
    val docs = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("source"), col("lang"))
    val joined = out.join(docs, "doc_id")
    assert(joined.filter(col("host") =!=
      concat(col("source"), lit(".example.org"))).isEmpty)
    assert(joined.filter(col("path") =!=
      concat(lit("/d/"), col("doc_id"))).isEmpty)
    assert(joined.filter(col("lang_q") =!= col("lang")).isEmpty)
    // sha2 emits lowercase 64-hex
    assert(out.filter(!col("sha256_text").rlike("^[0-9a-f]{64}$")).isEmpty)
    out.unpersist()
  }

  test("span removal: kept + removed partitions the tokens; untouched docs keep their text") {
    val out = graft.SparkEntry.queries("q174_span_removal")(spark, dir).cache()
    assert(out.count() ===
      graft.Tables.load(spark, dir, "documents").count())
    assert(out.filter(col("n_kept") + col("n_removed") =!= col("n_tok")).isEmpty)
    assert(out.filter(col("n_removed") < 0).isEmpty)
    // a doc with nothing removed must digest to md5 of its original text
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("orig"))
    val untouched = out.filter(col("n_removed") === 0).join(docs, "doc_id")
    assert(untouched.filter(col("digest") =!= col("orig")).isEmpty)
    out.unpersist()
  }

  test("bpe pairs: top-30, descending, all 2-char") {
    val out = graft.SparkEntry.queries("q175_bpe_pairs")(spark, dir).cache()
    assert(out.count() === 30)
    assert(out.filter(length(col("pair")) =!= 2).isEmpty)
    val ns = out.select("n").collect().map(_.getLong(0)).toSeq
    assert(ns == ns.sorted.reverse, "pair counts not descending")
    out.unpersist()
  }
}
