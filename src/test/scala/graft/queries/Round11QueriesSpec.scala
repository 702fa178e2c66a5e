package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-11 gate queries. */
class Round11QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("zscore: groupwise z has |z| bounded by (n-1)/sqrt(n) and matches sign of deviation") {
    val out = graft.SparkEntry.queries("q184_zscore")(spark, dir).cache()
    assert(out.count() > 0)
    // quantities are 1..50 with std >> 0: z stays in single digits
    assert(out.filter(abs(col("z")) > 10).isEmpty)
    out.unpersist()
  }

  test("user concurrency: at least 1, bounded by the user's event count; points = 2x events") {
    val out = graft.SparkEntry.queries("q185_user_concurrency")(spark, dir).cache()
    val perUser = graft.Tables.load(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n_ev"))
    val j = out.join(perUser, "user_id")
    assert(j.filter(col("max_concurrent") < 1).isEmpty)
    assert(j.filter(col("max_concurrent") > col("n_ev")).isEmpty)
    assert(j.filter(col("n_points") =!= col("n_ev") * 2).isEmpty)
    out.unpersist()
  }

  test("edit-distance join: banding is lossless vs brute force") {
    val out = graft.SparkEntry.queries("q186_editdist_join")(spark, dir).cache()
    val names = graft.Tables.load(spark, dir, "part")
      .select("p_name").distinct()
    val brute = names.as("x").crossJoin(names.as("y"))
      .filter(col("x.p_name") < col("y.p_name"))
      .filter(levenshtein(col("x.p_name"), col("y.p_name")) <= 2)
    assert(out.count() === brute.count(), "banded join missed or invented pairs")
    assert(out.filter(col("dist") > 2 || col("dist") < 1).isEmpty)
    out.unpersist()
  }
}
