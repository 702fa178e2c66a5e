package graft.queries

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The ANN oracles' bit-exactness rests on one invariant: every model
  * double inlined as a SQL literal parses back to the identical bits
  * (Java's Double.toString emits the shortest round-trip repr; DuckDB
  * parses decimal text to nearest-double, which by the shortest-repr
  * property is the original). This spec fuzzes the Scala half of that
  * contract across magnitudes, signs, and subnormals; the DuckDB half
  * is proven empirically by the q45/q106 hash gates at three SFs.
  */
class AnnModelOracleSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  test("dlit round-trips arbitrary finite doubles bit-exactly") {
    val genD: Gen[Double] = for {
      mantissa <- Gen.chooseNum(-1e6, 1e6)
      exp <- Gen.chooseNum(-300, 300)
    } yield mantissa * math.pow(10, exp)
    val fuzz = samples(genD, 500, seed = 4500L)
    val edges = Seq(0.0, 1.0, -1.0, Double.MinPositiveValue,
      java.lang.Double.MIN_NORMAL, Double.MaxValue, -Double.MaxValue,
      1.0 / 3.0, 0.1 + 0.2, 2.5e-3, 7.2e18, -1.5e-17)
    (fuzz ++ edges).filter(d => !d.isNaN && !d.isInfinite).foreach { d =>
      val lit = AnnModelOracle.dlit(d)
      val back = java.lang.Double.parseDouble(lit)
      assert(java.lang.Double.doubleToLongBits(back) ==
        java.lang.Double.doubleToLongBits(d),
        s"$d -> '$lit' -> $back does not round-trip")
    }
  }

  test("dlit normalizes -0.0 to 0.0 (DuckDB drops the sign) and rejects non-finite") {
    assert(AnnModelOracle.dlit(-0.0) == "0.0")
    assert(AnnModelOracle.dlit(0.0) == "0.0")
    intercept[IllegalArgumentException](AnnModelOracle.dlit(Double.NaN))
    intercept[IllegalArgumentException](
      AnnModelOracle.dlit(Double.PositiveInfinity))
  }
}
