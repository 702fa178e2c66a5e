package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

class QuantizedL2Spec extends SparkSpec {

  /** The posexplode → join-on-dim → grouped-sum form q473 used
    * before the codegen expression — the parity reference.
    */
  private def explodeForm = {
    def q(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") * lit(QuantizedL2.Q)).cast(LongType)
    aggregate(
      zip_with(col("a"), col("b"), (x, y) => {
        val d = q(x) - q(y)
        d * d
      }),
      lit(0L), (acc, v) => acc + v)
  }

  private def vectors = {
    import spark.implicits._
    Seq(
      (Seq(1f, 0f, 2f), Seq(1f, 0f, 2f)),
      (Seq(1f, 0f, 0f), Seq(0f, 1f, 0f)),
      (Seq(0.3f, -0.7f, 0.11f), Seq(-0.25f, 0.44f, 0.9f)),
      (Seq(-1e-8f, 2e-8f, 1e-8f), Seq(5f, -3f, 2f)))
      .toDF("a", "b")
  }

  test("bit-identical to the floor-lattice HOF form") {
    vectors.select(
        QuantizedL2(spark, col("a"), col("b")).as("native"),
        explodeForm.as("hof"))
      .collect().foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("bit-identical on real embeddings (codegen path, 64 dims)") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val pairs = e.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(e.limit(5).select(col("embedding").as("b")))
    val out = pairs.select(
      QuantizedL2(spark, col("a"), col("b")).as("native"),
      explodeForm.as("hof")).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("identical vectors → 0; null input → null; negative floors") {
    import spark.implicits._
    val z = Seq((Seq(0.5f, -0.25f), Seq(0.5f, -0.25f))).toDF("a", "b")
      .select(QuantizedL2(spark, col("a"), col("b"))).collect()(0).getLong(0)
    assert(z == 0L)
    // ⌊−0.3·Q⌋ = −314573 (floor, not truncation): d = ⌊0.3Q⌋ − ⌊−0.3Q⌋
    val m = Seq((Seq(0.3f), Seq(-0.3f))).toDF("a", "b")
      .select(QuantizedL2(spark, col("a"), col("b"))).collect()(0).getLong(0)
    val qa = math.floor(0.3f.toDouble * QuantizedL2.Q).toLong
    val qb = math.floor(-0.3f.toDouble * QuantizedL2.Q).toLong
    assert(m == (qa - qb) * (qa - qb))
    val n = Seq((Some(Seq(1f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(QuantizedL2(spark, col("a"), col("b"))).collect()(0)
    assert(n.isNullAt(0))
  }
}
