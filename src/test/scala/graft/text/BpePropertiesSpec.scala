package graft.text

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check: the distributed BPE learner must produce the
  * same merge sequence as a driver-side reference learner — greedy
  * most-frequent adjacent pair, ties broken (a, b)-lexicographically,
  * non-overlapping left-to-right fusion — on random corpora where
  * ties and overlapping pairs (e.g. "aaa") are common. Fixed seeds
  * reproduce failures.
  */
class BpePropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // tiny alphabet + short words maximize pair ties and self-overlaps
  private val genDoc: Gen[String] = Gen.listOfN(12,
    Gen.listOfN(4, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    .map(_.mkString(" "))

  private def refLearn(docs: Seq[String], nMerges: Int): Seq[(String, String)] = {
    def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    var vocab = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val counts = vocab.flatMap { case (syms, f) =>
        syms.indices.dropRight(1).map(j => (syms(j), syms(j + 1)) -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      if (counts.isEmpty) done = true
      else {
        val ((a, b), _) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((a, b))
        vocab = vocab.map { case (syms, f) => (mergeOnce(syms, a, b), f) }
        i += 1
      }
    }
    merges.result()
  }

  test("distributed learn equals the reference learner on random corpora") {
    samples(Gen.listOfN(6, genDoc), 3, seed = 17500L).foreach { docs =>
      val got = BpeMerges.learn(docs.toDF("text"), "text", nMerges = 6)
      val want = refLearn(docs, nMerges = 6)
      assert(got == want, s"merge sequences diverged for docs=$docs")
      // tokenize with the learned merges must reproduce each word's
      // final vocabulary state
      val vocabAfter = docs.flatMap(_.split(" ")).filter(_.nonEmpty).distinct
        .map(w => w -> BpeMerges.tokenize(w, got)).toMap
      val refAfter = {
        var v = vocabAfter.keys.map(w => w -> (w.map(_.toString): Seq[String])).toMap
        want.foreach { case (a, b) =>
          v = v.view.mapValues { syms =>
            val out = Seq.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.result()
          }.toMap
        }
        v
      }
      assert(vocabAfter == refAfter, s"tokenize diverged for docs=$docs")
    }
  }
}
