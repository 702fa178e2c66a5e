package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  test("salted join ≡ plain join on skewed data") {
    import spark.implicits._
    // 90% of left rows share one hot key.
    val left = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, i.toLong)).toDF("k", "v")
    val right = (0L to 49L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = left.join(right, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", saltFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("hot key actually spreads across salts") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = (1 to 1000).map(i => (7L, i.toLong)).toDF("k", "v")
    val nSalts = left
      .withColumn("__salt", pmod(hash(left.columns.map(col): _*), lit(8)))
      .select("__salt").distinct().count()
    assert(nSalts >= 6) // all-same-key rows land in (nearly) all 8 salts
  }
}
