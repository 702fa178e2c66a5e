package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-53 gate queries. */
class Round53QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("catalog coverage: dead stock bounded by brand totals") {
    val out = graft.SparkEntry.queries("q299_catalog_coverage")(spark, dir)
      .cache()
    val parts = graft.Tables.load(spark, dir, "part").count()
    assert(out.agg(sum("n_parts")).head().getLong(0) === parts,
      "every part belongs to exactly one brand row")
    assert(out.filter(col("n_dead") > col("n_parts")).isEmpty)
    assert(out.filter(col("dead_share") < 0.0 || col("dead_share") > 1.0)
      .isEmpty)
    out.unpersist()
  }

  test("corpus datasheet: one row per source, ratios consistent") {
    val out = graft.SparkEntry.queries("q300_corpus_datasheet")(spark, dir)
      .cache()
    val sources = graft.Tables.load(spark, dir, "documents")
      .select("source").distinct().count()
    assert(out.count() === sources)
    assert(out.filter(col("dup_rate") < 0.0 || col("dup_rate") >= 1.0)
      .isEmpty, "a source cannot be 100% duplicates of itself")
    assert(out.filter(col("lang_purity") <= 0.0 ||
      col("lang_purity") > 1.0).isEmpty)
    assert(out.filter(col("simpson") < 0.0 || col("simpson") > 1.0).isEmpty)
    assert(out.filter(col("n_terms") > col("n_tokens")).isEmpty)
    // datasheet volume agrees with the raw table
    val docs = graft.Tables.load(spark, dir, "documents").count()
    assert(out.agg(sum("n_docs")).head().getLong(0) === docs)
    out.unpersist()
  }
}
