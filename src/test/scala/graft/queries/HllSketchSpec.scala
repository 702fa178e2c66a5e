package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Mergeable-sketch properties behind `q96_hll_incremental_distinct`:
  * the sketch of a union equals the union of the sketches, so an
  * incrementally-maintained distinct-count view is batching-invariant
  * — the same guarantee q94's decimal sums give for algebraic
  * aggregates, extended to the one aggregate that has no exact
  * mergeable state.
  */
class HllSketchSpec extends SparkSpec {

  test("3-batch hll_union_agg fold matches the one-shot sketch within bounds") {
    import spark.implicits._
    val rows = (1 to 3000).map(i => (i.toLong % 7, s"user_${i % 911}"))
    val df = rows.toDF("g", "u")
    val oneShot = df.groupBy("g").agg(hll_sketch_agg(col("u")).as("sk"))
      .select(col("g"), hll_sketch_estimate(col("sk")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val parts = (0 until 3).map(i =>
      df.filter(col("u").substr(lit(6), lit(10)).cast("long") % 3 === i)
        .groupBy("g").agg(hll_sketch_agg(col("u")).as("sk")))
    val folded = parts.reduce(_ unionByName _)
      .groupBy("g").agg(hll_union_agg(col("sk")).as("sk"))
      .select(col("g"), hll_sketch_estimate(col("sk")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a union densifies the sketch (sparse -> HLL array), so folded
    // estimates can drift a few counts from the one-shot sketch —
    // bounded by the sketch's error, never unbounded by batching
    assert(folded.keySet == oneShot.keySet)
    folded.foreach { case (k, v) =>
      assert(math.abs(v - oneShot(k)).toDouble / oneShot(k) < 0.01,
        s"group $k: folded $v vs one-shot ${oneShot(k)}")
    }
  }

  test("estimate tracks the exact distinct count closely at this cardinality") {
    import spark.implicits._
    val df = (1 to 5000).map(i => s"u${i % 1234}").toDF("u")
    val est = df.agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("e"))
      .collect()(0).getLong(0).toDouble
    assert(math.abs(est - 1234.0) / 1234.0 < 0.05)
  }
}
