package graft.pipelines

import graft.SparkSpec
import graft.pipelines.CorpusCuration.{Config, NearDupCandidates}

/** The LSH-backed near-dup candidate stage vs the exact-postings
  * default, on the gate corpus: stages 1-3 must be bit-identical (the
  * candidate source only affects stage 4), every LSH near-dup must
  * also be an exact near-dup (precision exactly 1 — banded candidates
  * pass the same exact-Jaccard verification, so false positives are
  * impossible by construction), and the measured recall on the gate
  * corpus is pinned with a floor.
  */
class CurationLshSpec extends SparkSpec {

  private lazy val docs =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  private val lshCfg =
    Config(candidates = NearDupCandidates.MinHashLsh(nHashes = 8, bandSize = 2))

  private def flags(cfg: Config): Map[Long, (Boolean, Boolean, Boolean, Boolean)] =
    CorpusCuration.audit(docs, cfg).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))))
      .toMap

  test("LSH variant: stages 1-3 identical, precision 1, recall floor on gate corpus") {
    val exact = flags(Config())
    val lsh = flags(lshCfg)
    assert(exact.keySet == lsh.keySet)

    // stages 1-3 (quality, exact dedup) are candidate-source-independent
    exact.foreach { case (id, (qk, ed, _, _)) =>
      assert(lsh(id)._1 == qk && lsh(id)._2 == ed, s"doc $id stage-1-3 drift")
    }

    val exactNear = exact.collect { case (id, (_, _, true, _)) => id }.toSet
    val lshNear = lsh.collect { case (id, (_, _, true, _)) => id }.toSet

    // precision: banded candidates can only MISS pairs, never invent
    assert(lshNear.subsetOf(exactNear),
      s"LSH flagged non-near-dups: ${lshNear.diff(exactNear)}")

    // recall on the gate corpus. The corpus' near-dup pairs sit well
    // above the 0.5 threshold, where the 8-hash/4-band collision
    // probability 1-(1-s^2)^4 is high (s=0.7 → 0.96, s=0.9 → 0.9998);
    // the floor is set below the measured value so hash-construction
    // regressions fail while seed-free MinHash determinism keeps the
    // measurement itself stable run to run.
    if (exactNear.nonEmpty) {
      val recall = lshNear.intersect(exactNear).size.toDouble / exactNear.size
      info(f"LSH near-dup recall on gate corpus: $recall%.3f " +
        s"(${lshNear.size}/${exactNear.size})")
      assert(recall >= 0.75, f"LSH recall $recall%.3f below floor 0.75")
    } else fail("gate corpus has no exact near-dups; recall unmeasurable")
  }

  test("planted high-similarity dups are caught by the LSH path") {
    import spark.implicits._
    val base = "a quick brown fox jumps over one lazy dog near this river " +
      "bank today while distant trains carry heavy freight across the plain"
    val planted = Seq(
      (1L, base),
      (2L, base + " extra trailing clause appended here"), // high-Jaccard near-dup
      (3L, "many small tables join into wide plans when keys align across " +
        "stages and partitions flow through exchanges without skew"))
      .toDF("doc_id", "text")
    val a = CorpusCuration.audit(planted, lshCfg).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(a(1L) == ((false, true)))  // blocker survives
    assert(a(2L)._1 && !a(2L)._2)     // near-dup dropped via LSH candidates
    assert(a(3L) == ((false, true)))  // unrelated doc untouched
  }
}
