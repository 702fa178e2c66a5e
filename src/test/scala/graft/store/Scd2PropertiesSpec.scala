package graft.store

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check of the SCD2 upsert: random attribute
  * histories, split into random batches with repeats, unchanged
  * re-sends and stale late arrivals, must produce exactly the
  * reference version history — changed attributes close the current
  * version at the new timestamp and open a fresh one; unchanged or
  * stale rows do nothing; history stays monotone with one open
  * version per key. Fixed seeds reproduce failures.
  */
class Scd2PropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // few keys, few attribute values (unchanged re-sends common),
  // coarse timestamps (stale arrivals common after the split)
  private val genRow: Gen[(Long, Long, Long)] = for {
    k <- Gen.chooseNum(0, 3)
    v <- Gen.chooseNum(0, 2)
    ts <- Gen.chooseNum(0, 30)
  } yield (k.toLong, v.toLong, ts.toLong)

  private case class Version(v: Long, from: Long, to: Option[Long])

  /** Reference fold over batches of at-most-one-row-per-key. */
  private def refFold(
      batches: Seq[Seq[(Long, Long, Long)]]): Map[Long, List[Version]] =
    batches.foldLeft(Map.empty[Long, List[Version]]) { (state, batch) =>
      state ++ batch.map { case (k, v, ts) =>
        val hist = state.getOrElse(k, Nil)
        k -> (hist match {
          case Nil => List(Version(v, ts, None))
          case cur :: closed =>
            if (cur.v != v && ts > cur.from)
              Version(v, ts, None) :: cur.copy(to = Some(ts)) :: closed
            else cur :: closed // unchanged attrs or stale ts: no-op
        })
      }
    }

  test("random histories under any batch split match the reference versions") {
    samples(Gen.listOfN(26, genRow), 3, seed = 20200L).zipWithIndex
      .foreach { case (raw, i) =>
        // one row per key per batch (scd2Upsert dedups to the latest
        // in-batch row; keep the generator unambiguous instead)
        def dedupBatch(b: Seq[(Long, Long, Long)]) =
          b.groupBy(_._1).map(_._2.maxBy(_._3)).toSeq
        val cuts = Seq(4 + i, 9, 14 + i, 21, raw.size)
        val batches = cuts.distinct.sorted
          .foldLeft((Seq.empty[Seq[(Long, Long, Long)]], 0)) {
            case ((acc, from), to) =>
              (acc :+ dedupBatch(raw.slice(from, to)), to)
          }._1.filter(_.nonEmpty)
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_scd2_prop$i").toString
        val store = new TableStore(spark, root)
        batches.foreach(b =>
          store.scd2Upsert("s", b.toDF("k", "v", "ts"), "k", "ts"))

        def snapshot(): Set[(Long, Long, Long, Option[Long], Boolean)] =
          store.read("s").get.collect().map(r =>
            (r.getAs[Long]("k"), r.getAs[Long]("v"),
              r.getAs[Long]("valid_from"),
              Option(r.getAs[java.lang.Long]("valid_to")).map(_.toLong),
              r.getAs[Boolean]("is_current"))).toSet
        val want = refFold(batches).flatMap { case (k, versions) =>
          versions.map(ver =>
            (k, ver.v, ver.from, ver.to, ver.to.isEmpty))
        }.toSet
        val got = snapshot()
        assert(got == want, s"sample $i diverged: batches=$batches")
        // invariants: one open version per key, monotone intervals
        val byKey = got.groupBy(_._1)
        byKey.foreach { case (k, rows) =>
          assert(rows.count(_._4.isEmpty) == 1, s"key $k open-version count")
          rows.foreach { r =>
            r._4.foreach(to => assert(r._3 < to, s"key $k interval order"))
          }
        }
        // replaying the final batch is a no-op
        store.scd2Upsert("s", batches.last.toDF("k", "v", "ts"), "k", "ts")
        assert(snapshot() == got, s"sample $i: replay changed history")
      }
  }
}
