package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-34 gate queries. */
class Round34QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("acf: one bounded coefficient per requested lag") {
    val out = graft.SparkEntry.queries("q266_autocorrelation")(spark, dir)
      .cache()
    assert(out.select("lag").collect().map(_.getLong(0)).toSet
      .subsetOf(Set(1L, 7L, 14L)))
    assert(out.count() === 3, "a multi-year daily series pairs at every lag")
    assert(out.filter(col("acf") < -1.0 || col("acf") > 1.0).isEmpty)
    assert(out.filter(col("n_pairs") < 30).isEmpty,
      "each lag correlates a real pair population")
    out.unpersist()
  }

  test("orc round-trip: every document survives with a digest") {
    val out = graft.SparkEntry.queries("q267_orc_roundtrip")(spark, dir).cache()
    val docs = graft.Tables.load(spark, dir, "documents")
    assert(out.count() === docs.count(), "no row lost in the ORC cycle")
    assert(out.filter(col("digest").isNull).isEmpty)
    assert(out.select("doc_id").distinct().count() === docs.count())
    out.unpersist()
  }

  test("dow anomalies: top-3 per weekday with exact residual math") {
    val out = graft.SparkEntry.queries("q268_dow_anomalies")(spark, dir).cache()
    assert(out.select("dow").distinct().count() === 7)
    assert(out.filter(col("rk") < 1 || col("rk") > 3).isEmpty)
    // residual really is count-minus-dow-mean: recompute independently
    val daily = graft.Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dow", dayofweek(col("d")).cast("long"))
    val base = daily.groupBy("dow")
      .agg(sum("x").as("sx"), count(lit(1)).as("n"))
    val check = out.join(base, "dow")
      .filter(abs(col("residual") -
        (col("orders").cast("double") -
          col("sx").cast("double") / col("n").cast("double"))) > 1e-9)
    assert(check.isEmpty, "residual must equal x - dow mean")
    out.unpersist()
  }
}
