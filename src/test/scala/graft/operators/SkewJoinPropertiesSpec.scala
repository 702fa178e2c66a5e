package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check: the salted join must be multiset-identical
  * to the plain inner join on random data — duplicate rows on both
  * sides (salting hashes the whole row, so identical rows share a
  * salt and must still multiply correctly), null keys (inner-join
  * dropped on both paths), keys present on only one side, and every
  * saltFactor. Fixed seeds reproduce failures.
  */
class SkewJoinPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // ~20% null keys, heavy collisions, and repeated (k, v) rows
  private val genLeft: Gen[List[(Option[Long], Long)]] =
    Gen.listOfN(80, for {
      k <- Gen.frequency(
        4 -> Gen.chooseNum(0, 6).map(x => Some(x.toLong)),
        1 -> Gen.const(Option.empty[Long]))
      v <- Gen.chooseNum(0, 4)
    } yield (k, v.toLong))

  private val genRight: Gen[List[(Option[Long], String)]] =
    Gen.listOfN(15, for {
      k <- Gen.frequency(
        4 -> Gen.chooseNum(0, 9).map(x => Some(x.toLong)),
        1 -> Gen.const(Option.empty[Long]))
      s <- Gen.chooseNum(0, 2)
    } yield (k, s"d$s"))

  test("salted inner join is multiset-equal to the plain join") {
    val lefts = samples(genLeft, 3, seed = 59100L)
    val rights = samples(genRight, 3, seed = 59200L)
    for (((l, r), i) <- lefts.zip(rights).zipWithIndex) {
      val left = l.toDF("k", "v")
      val right = r.toDF("k", "name")
      val plain = left.join(right, Seq("k")).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
        .groupBy(identity).view.mapValues(_.size).toMap
      for (saltFactor <- Seq(1, 3, 8)) {
        val salted = SkewJoin.saltedInnerJoin(left, right, "k", saltFactor)
          .collect()
          .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
          .groupBy(identity).view.mapValues(_.size).toMap
        assert(salted == plain,
          s"sample $i saltFactor=$saltFactor diverged: left=$l right=$r")
      }
    }
  }
}
