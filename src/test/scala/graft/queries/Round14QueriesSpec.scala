package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-14 gate queries. */
class Round14QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("canonicalize: one kept doc per cluster, canonical is the kept doc, full corpus covered") {
    val out = graft.SparkEntry.queries("q192_dedup_canonicalize")(spark, dir).cache()
    assert(out.count() ===
      graft.Tables.load(spark, dir, "documents").count())
    val perCluster = out.groupBy("cluster_id")
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("n_kept"))
    assert(perCluster.filter(col("n_kept") =!= 1).isEmpty,
      "cluster without exactly one canonical doc")
    // kept rows point at themselves; dropped rows at their cluster's kept doc
    assert(out.filter(col("kept") && col("canonical_id") =!= col("doc_id")).isEmpty)
    val canon = out.filter(col("kept"))
      .select(col("cluster_id"), col("doc_id").as("expected"))
    assert(out.join(canon, "cluster_id")
      .filter(col("canonical_id") =!= col("expected")).isEmpty)
    out.unpersist()
  }

  test("wilson bound: strictly below the raw rate, within [0, 1]") {
    val out = graft.SparkEntry.queries("q193_wilson_bound")(spark, dir).cache()
    assert(out.count() > 0)
    assert(out.filter(col("wilson_low") < 0 || col("wilson_low") > 1).isEmpty)
    assert(out.filter(col("purchases") > 0 &&
      col("wilson_low") >= col("rate")).isEmpty)
    out.unpersist()
  }
}
