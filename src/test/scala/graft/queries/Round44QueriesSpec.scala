package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-44 gate queries. */
class Round44QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("clustering coefficient: a probability, zero iff no triangles") {
    val out = graft.SparkEntry.queries("q288_clustering_coeff")(spark, dir)
      .cache()
    assert(out.count() > 0)
    assert(out.filter(col("coeff") < 0.0 || col("coeff") > 1.0).isEmpty,
      "2T can never exceed deg(deg-1) neighbor pairs")
    assert(out.filter(col("coeff") === 0.0 && col("tri") =!= 0L).isEmpty)
    assert(out.filter(col("deg") < 2).isEmpty)
    // triangles through a node are at most C(deg, 2)
    assert(out.filter(lit(2L) * col("tri") >
      col("deg") * (col("deg") - 1L)).isEmpty)
    out.unpersist()
  }

  test("cluster size distribution: conserves the corpus") {
    val out = graft.SparkEntry.queries("q289_cluster_size_dist")(spark, dir)
      .cache()
    val docs = graft.Tables.load(spark, dir, "documents").count()
    val covered = out.agg(sum(col("size") * col("n_clusters")))
      .head().getLong(0)
    assert(covered === docs,
      "singletons plus clustered docs account for every document")
    assert(out.filter(col("size") < 1 || col("n_clusters") < 1).isEmpty)
    // every non-singleton cluster holds at least 2 docs by construction
    assert(out.filter(col("size") === 1).count() <= 1)
    out.unpersist()
  }
}
