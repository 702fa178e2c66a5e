package graft.plans

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-based check: TopKPerKey must match the row_number window
  * form on random data for every (ordering, k) — including NULL order
  * values (asc → nulls first, desc → nulls last, as SortOrder
  * defaults) and duplicate order values broken by a unique tiebreak.
  * Fixed seeds reproduce failures.
  */
class TopKPerKeyPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // few keys + coarse values force collisions; ~15% null order values
  private val genRow: Gen[(Long, Option[Double])] = for {
    k <- Gen.chooseNum(0, 7)
    v <- Gen.frequency(
      17 -> Gen.chooseNum(0, 9).map(d => Some(d.toDouble)),
      3 -> Gen.const(Option.empty[Double]))
  } yield (k.toLong, v)

  private def run(
      rows: Seq[(Long, Option[Double], Long)],
      order: Seq[Column],
      k: Int): (Set[(Long, Long, Long)], Set[(Long, Long, Long)]) = {
    val df = rows.toDF("key", "v", "tb")
    val got = TopKPerKey.perKey(df, Seq("key"), order, k)
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("tb"),
        r.getAs[Long]("rk"))).toSet
    val w = Window.partitionBy("key").orderBy(order: _*)
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("tb"),
        r.getAs[Long]("rk"))).toSet
    (got, want)
  }

  test("matches row_number on random data with nulls, both directions, k in {1,3,7}") {
    val orderings: Seq[(String, Seq[Column])] = Seq(
      "v asc, tb" -> Seq(asc("v"), asc("tb")),
      "v desc, tb" -> Seq(desc("v"), asc("tb")),
      "v desc nulls first, tb" -> Seq(col("v").desc_nulls_first, asc("tb")),
      "v asc nulls last, tb" -> Seq(col("v").asc_nulls_last, asc("tb")))
    samples(Gen.listOfN(60, genRow), 4, seed = 58100L).foreach { base =>
      val rows = base.zipWithIndex.map { case ((key, v), i) =>
        (key, v, i.toLong) // unique tiebreak → total order per key
      }
      for ((label, order) <- orderings; k <- Seq(1, 3, 7)) {
        val (got, want) = run(rows, order, k)
        assert(got == want,
          s"diverged for ordering=$label k=$k rows=$rows")
      }
    }
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(Long, Option[Double], Long)].toDF("key", "v", "tb")
    assert(TopKPerKey.perKey(df, Seq("key"), Seq(asc("v")), 3).count() == 0)
  }
}
