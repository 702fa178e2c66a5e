package graft.store

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check of the latest-wins upsert contract: any
  * random event log, split into upsert batches at any points, must
  * end at the same table as a driver-side fold of the rule "highest
  * version wins; on a version tie the incoming batch beats the
  * stored row". This is the idempotent-re-run contract (§2.10b) the
  * daily pipeline leans on — replaying a batch must also be a no-op.
  * Fixed seeds reproduce failures.
  */
class UpsertPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // events: few keys, coarse versions (cross-batch ties likely),
  // payload distinguishes writers
  private val genEvents: Gen[List[(Long, Long)]] =
    Gen.listOfN(30, for {
      k <- Gen.chooseNum(0, 5)
      ver <- Gen.chooseNum(0, 9)
    } yield (k.toLong, ver.toLong))

  /** In-batch duplicates of (key, version) are dropped keeping the
    * first, so each batch has at most one row per (key, version) —
    * the in-batch tiebreak among identical versions is otherwise
    * unspecified (a real changelog has unique versions per key).
    */
  private def dedupBatch(b: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
    b.groupBy(e => (e._1, e._2)).map(_._2.head).toSeq

  private def refFold(
      batches: Seq[Seq[(Long, Long, String)]]): Map[Long, (Long, String)] =
    batches.foldLeft(Map.empty[Long, (Long, String)]) { (state, batch) =>
      val bestInBatch = batch.groupBy(_._1).view.mapValues(
        _.maxBy(_._2)).toMap
      state ++ bestInBatch.collect {
        case (k, (_, ver, payload))
            if state.get(k).forall(_._1 <= ver) => // tie -> incoming wins
          k -> (ver, payload)
      }
    }

  test("any batch split folds to the reference latest-wins state; replay is a no-op") {
    samples(genEvents, 3, seed = 10800L).zipWithIndex.foreach {
      case (raw, i) =>
        val events = raw.zipWithIndex.map { case ((k, v), j) =>
          (k, v, s"w$j") // payload identifies which event won
        }
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_upsert_prop$i").toString
        val store = new TableStore(spark, root)
        // uneven batch split derived from the sample index
        val cuts = Seq(4 + i, 11, 19 + i, events.size)
        val batches = cuts.distinct.sorted
          .foldLeft((Seq.empty[Seq[(Long, Long, String)]], 0)) {
            case ((acc, from), to) =>
              (acc :+ dedupBatch(events.slice(from, to)), to)
          }._1.filter(_.nonEmpty)
        batches.foreach { b =>
          store.upsert("t", b.toDF("k", "ver", "payload"), "k", "ver")
        }
        def snapshot(): Map[Long, (Long, String)] =
          store.read("t").get.select("k", "ver", "payload").collect()
            .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
        val got = snapshot()
        assert(got == refFold(batches),
          s"sample $i diverged from reference fold: batches=$batches")
        // idempotent re-run: replaying the last batch changes nothing
        store.upsert("t", batches.last.toDF("k", "ver", "payload"), "k", "ver")
        assert(snapshot() == got, s"sample $i: replaying a batch changed state")
    }
  }
}
