package graft.operators

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based exactness checks for the binned range joins:
  * random interval sets (zero-length, bin-straddling, duplicated
  * endpoints) must produce exactly the pairs the O(n²) predicate
  * produces, for bin widths far smaller and far larger than typical
  * interval length. Fixed seeds reproduce failures.
  */
class RangeJoinPropertiesSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private def ts(min: Int) = Timestamp.from(
    java.time.Instant.parse("2026-03-01T00:00:00Z").plusSeconds(min * 60L))

  // intervals inside a two-day span, length 0–36 h: many straddle
  // bins at any tested width, some are points (start == end)
  private val genIv: Gen[(Int, Int)] = for {
    s <- Gen.chooseNum(0, 2880)
    len <- Gen.chooseNum(0, 2160)
  } yield (s, s + len)

  test("overlapSelfJoin equals the brute-force theta join at any bin width") {
    import spark.implicits._
    for (seed <- Seq(10L, 20L); binMinutes <- Seq(30, 360, 10080)) {
      val rows = samples(genIv, 50, seed).zipWithIndex
        .map { case ((s, e), i) => (i.toLong, ts(s), ts(e)) }
      val df = rows.toDF("id", "start_ts", "end_ts")
      val got = RangeJoin.overlapSelfJoin(df, "id", "start_ts", "end_ts", binMinutes)
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (ia, sa, ea) <- rows; (ib, sb, eb) <- rows
        if ia < ib && sa.before(eb) && sb.before(ea)
      } yield (ia, ib)).toSet
      assert(got == want, s"seed=$seed bin=$binMinutes: " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("pointInInterval equals the brute-force containment join at any bin width") {
    import spark.implicits._
    for (binMinutes <- Seq(30, 1440)) {
      val ivs = samples(genIv, 30, 77L).zipWithIndex
        .map { case ((s, e), i) => (i.toLong, ts(s), ts(e)) }
      val pts = samples(Gen.chooseNum(0, 5040), 60, 88L).zipWithIndex
        .map { case (m, i) => (1000L + i, ts(m)) }
      val got = RangeJoin.pointInInterval(
          pts.toDF("pid", "ts"), "ts",
          ivs.toDF("iid", "start_ts", "end_ts"), "start_ts", "end_ts",
          binMinutes = binMinutes)
        .select("pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pid, t) <- pts; (iid, s, e) <- ivs
        if !t.before(s) && t.before(e)
      } yield (pid, iid)).toSet
      assert(got == want, s"bin=$binMinutes: " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }
}
