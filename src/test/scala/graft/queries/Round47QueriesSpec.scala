package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-47 gate queries. */
class Round47QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("filter clause: filtered counts partition the group totals") {
    val out = graft.SparkEntry.queries("q292_filter_clause")(spark, dir)
      .cache()
    assert(out.count() === 5)
    assert(out.filter(col("n_final") + col("n_open") > col("n")).isEmpty,
      "status-filtered counts can never exceed the group size")
    assert(out.filter(col("final_share") < 0.0 || col("final_share") > 1.0)
      .isEmpty)
    out.unpersist()
  }

  test("star except: drops exactly the named column, keeps order") {
    val out = graft.SparkEntry.queries("q293_star_except")(spark, dir)
    assert(out.columns.toSeq === Seq("doc_id", "lang", "source", "n_chars"),
      "remaining columns keep declaration order")
    assert(out.count() > 0)
  }
}
