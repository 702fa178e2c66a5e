package graft.operators

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check for AsOfJoin: on random event streams (dense
  * timestamp collisions, keys missing on either side), every
  * direction and tolerance must agree with the obvious per-row
  * reference semantics computed in plain Scala. Fixed seeds make
  * failures reproduce.
  */
class AsOfJoinPropertiesSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // seconds offsets drawn from a tiny range so ties and exact-equal
  // timestamps are common — the fiddly cases
  private val genRow: Gen[(Long, Int)] = for {
    key <- Gen.chooseNum(1, 4)
    sec <- Gen.chooseNum(0, 50)
  } yield (key.toLong, sec)

  private def ts(sec: Int) = Timestamp.valueOf(f"2026-01-01 10:00:${0}%02d").toInstant
    .plusSeconds(sec.toLong)

  /** Reference semantics: for one left row, the matching right id. */
  private def expected(
      key: Long, t: Int, rights: Seq[(Long, Int, Long)],
      direction: String, tolSec: Long): Option[Long] = {
    val mine = rights.filter(_._1 == key)
    def inTol(g: Long) = tolSec == 0 || g <= tolSec
    // AsOfJoin contract: backward takes the LARGEST tiebreak among
    // equal-time rights (latest-wins), forward the SMALLEST
    // (earliest-wins) — the symmetric mirror documented in asof()
    val back = mine.filter(_._2 <= t).sortBy(r => (r._2, r._3)).lastOption
      .filter(r => inTol((t - r._2).toLong))
    val fwd = mine.filter(_._2 >= t).sortBy(r => (r._2, r._3)).headOption
      .filter(r => inTol((r._2 - t).toLong))
    direction match {
      case "backward" => back.map(_._3)
      case "forward"  => fwd.map(_._3)
      case "nearest"  =>
        (back, fwd) match {
          case (Some(b), Some(f)) =>
            if ((t - b._2) <= (f._2 - t)) Some(b._3) else Some(f._3)
          case (b, f) => b.orElse(f).map(_._3)
        }
    }
  }

  test("all directions and tolerances match reference semantics on random streams") {
    import spark.implicits._
    for (seed <- Seq(1000L, 2000L); direction <- Seq("backward", "forward", "nearest");
         tolSec <- Seq(0L, 7L)) {
      val leftRows = samples(genRow, 40, seed).zipWithIndex
        .map { case ((k, s), i) => (k, ts(s), 1000L + i) }
      val rightRows = samples(genRow, 30, seed + 500).zipWithIndex
        .map { case ((k, s), i) => (k, ts(s), 2000L + i) }
      val left = leftRows.map { case (k, t, id) => (k, Timestamp.from(t), id) }
        .toDF("k", "ts", "lid")
      val right = rightRows.map { case (k, t, id) => (k, Timestamp.from(t), id) }
        .toDF("k", "ts", "rid")

      val got = AsOfJoin.asof(left, right, "k", "ts", "ts",
          Seq("rid"), tiebreak = "rid",
          toleranceMs = tolSec * 1000L, direction = direction)
        .collect()
        .map(r => r.getAs[Long]("lid") -> Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong))
        .toMap

      val rightsSec = rightRows.map { case (k, t, id) =>
        (k, java.time.Duration.between(ts(0), t).getSeconds.toInt, id) }
      leftRows.foreach { case (k, t, lid) =>
        val sec = java.time.Duration.between(ts(0), t).getSeconds.toInt
        val want = expected(k, sec, rightsSec, direction, tolSec)
        assert(got(lid) == want,
          s"$direction tol=$tolSec seed=$seed left=$lid key=$k t=$sec: got ${got(lid)}, want $want")
      }
    }
  }
}
