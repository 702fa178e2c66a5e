package graft.store

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check of exactly-once corpus admission: random
  * documents with heavy text collisions, admitted in arbitrary batch
  * splits, must land exactly the first-seen-wins corpus — per text
  * the lowest-ordered row of the earliest batch — with replayed batch
  * ids admitting nothing, matching a driver-side fold. This fuzzes
  * the q113 gate's fixed three-way split. Fixed seeds reproduce
  * failures.
  */
class DedupStorePropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // 6 distinct texts over 24 docs: cross-batch and in-batch dups
  private val genText: Gen[String] =
    Gen.chooseNum(0, 5).map(t => s"text body number $t")

  test("random batch splits admit exactly the first-seen-wins corpus") {
    samples(Gen.listOfN(24, genText), 3, seed = 61130L).zipWithIndex
      .foreach { case (texts, i) =>
        val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_dsprop$i").toString
        val ds = new DedupStore(
          new TableStore(spark, root), "corpus", "text", 10000L)
        val cuts = (Seq(5 + i, 11, 17 + i) :+ docs.size).distinct.sorted
        val batches = cuts.foldLeft((Seq.empty[Seq[(Long, String)]], 0)) {
            case ((acc, from), to) => (acc :+ docs.slice(from, to), to)
          }._1.filter(_.nonEmpty)
        val added = batches.zipWithIndex.map { case (b, j) =>
          ds.admit(s"b$j", b.toDF("doc_id", "text"))
        }
        // reference fold: first batch to carry a text wins; within a
        // batch the lowest (doc_id, text) row wins
        val want = batches.foldLeft(Map.empty[String, Long]) { (seen, b) =>
          val inBatch = b.groupBy(_._2).view.mapValues(_.map(_._1).min)
          seen ++ inBatch.filterKeys(k => !seen.contains(k)).toMap
        }
        val got = ds.corpus.get.select("doc_id", "text").collect()
          .map(r => r.getString(1) -> r.getLong(0)).toMap
        assert(got == want, s"sample $i corpus diverged: batches=$batches")
        assert(added.sum == want.size, s"sample $i added-count mismatch")
        // replayed batch id (even with novel data) admits nothing
        assert(ds.admit("b0", Seq((999L, "brand new text"))
          .toDF("doc_id", "text")) == 0L)
        assert(ds.corpus.get.count() == want.size)
      }
  }

  test("a fully-duplicate batch leaves the bloom usable (regression)") {
    // BloomFilterAggregate over zero fresh rows yields NULL; before
    // the guard this poisoned the stored filter and the NEXT admit
    // crashed in BloomFilter.readFrom
    val root = java.nio.file.Files
      .createTempDirectory("graft_dsprop_dup").toString
    val ds = new DedupStore(new TableStore(spark, root), "c", "text", 1000L)
    assert(ds.admit("b0", Seq((1L, "t1")).toDF("doc_id", "text")) == 1L)
    assert(ds.admit("b1", Seq((2L, "t1")).toDF("doc_id", "text")) == 0L)
    assert(ds.admit("b2", Seq((3L, "t2")).toDF("doc_id", "text")) == 1L)
    assert(ds.corpus.get.select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    // empty-corpus empty-batch corner: first batch entirely empty
    val ds2 = new DedupStore(new TableStore(spark, root), "c2", "text", 1000L)
    assert(ds2.admit("b0",
      Seq.empty[(Long, String)].toDF("doc_id", "text")) == 0L)
    assert(ds2.admit("b1", Seq((1L, "t1")).toDF("doc_id", "text")) == 1L)
  }
}
