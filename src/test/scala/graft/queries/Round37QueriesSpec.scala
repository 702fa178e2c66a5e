package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-37 gate queries. */
class Round37QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("kendall: bounded tau, pair accounting closes") {
    val out = graft.SparkEntry.queries("q274_kendall_tau")(spark, dir).cache()
    assert(out.count() >= 5, "one row per year with untied pairs")
    assert(out.filter(col("tau_b") < -1.0 || col("tau_b") > 1.0).isEmpty)
    assert(out.filter(col("concordant") + col("discordant") > col("n_pairs"))
      .isEmpty, "C + D can never exceed the pair count")
    // n_pairs really is n(n-1)/2 for the year's day count
    val days = graft.Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d")).count()
      .groupBy(year(col("d")).cast("long").as("yr"))
      .agg(count(lit(1)).as("nd"))
    assert(out.join(days, "yr")
      .filter(col("n_pairs") =!= col("nd") * (col("nd") - 1) / 2).isEmpty)
    out.unpersist()
  }

  test("runs test: run count bounded by sign changes possible") {
    // sf0.001's daily counts are so sparse the median equals the
    // minimum and whole years drop (n2 = 0) — the gate scale has the
    // signal, so this invariant runs there
    val out = graft.SparkEntry.queries("q275_runs_test")(
      spark, "/root/testdata/sf0.01").cache()
    assert(out.count() >= 5)
    assert(out.filter(col("runs") < 1).isEmpty, "at least one run exists")
    assert(out.filter(col("runs") > col("n1") + col("n2")).isEmpty,
      "cannot have more runs than observations")
    // max possible runs = 2*min(n1,n2)+1
    assert(out.filter(col("runs") >
      lit(2L) * least(col("n1"), col("n2")) + 1L).isEmpty)
    assert(out.filter(col("expected_runs") < 1.0).isEmpty)
    out.unpersist()
  }
}
