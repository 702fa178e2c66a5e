package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check for [[GridJoin.radiusSelfJoin]]: on random
  * point clouds (uniform scatter + deliberate tight clusters so
  * cell-boundary and exact-radius cases occur) the pair set must
  * equal a driver-side brute-force O(n²) sweep using the identical
  * IEEE expression — zero lost pairs, zero phantoms, for several
  * radii. Fixed seeds reproduce failures.
  */
class GridJoinPropertiesSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // scatter over [-1, 1]² with quantized coords so exact ties and
  // on-boundary distances actually happen
  private val genPoint: Gen[(Double, Double)] = for {
    xi <- Gen.chooseNum(-100, 100)
    yi <- Gen.chooseNum(-100, 100)
  } yield (xi / 100.0, yi / 100.0)

  private def reference(
      pts: Seq[(Long, Double, Double)], r: Double): Set[(Long, Long)] = {
    val r2 = r * r
    (for {
      a <- pts; b <- pts
      if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r2
    } yield (a._1, b._1)).toSet
  }

  test("grid join equals brute force on random clouds across radii") {
    import spark.implicits._
    for (seed <- Seq(5L, 77L); r <- Seq(0.05, 0.13)) {
      val scatter = samples(genPoint, 150, seed)
      // a tight cluster straddling a cell boundary of every tested
      // radius (coords near 0) — the corner the 3×3 probe must cover
      val cluster = Seq((-0.01, -0.01), (0.0, 0.0), (0.01, 0.01), (0.01, -0.01))
      val pts = (scatter ++ cluster).zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }
      val got = GridJoin
        .radiusSelfJoin(pts.toDF("vec_id", "x", "y"), "vec_id", "x", "y", r)
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
      assert(got == reference(pts, r), s"seed=$seed r=$r")
    }
  }
}
