package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the shared hot-bucket pair expansion's two contracts:
  * LOSSLESSNESS (the chunked union is exactly the i<j pair multiset of
  * the naive per-bucket expansion, hot buckets included) and the
  * BOUND (no collected chunk array ever exceeds the cap — the whole
  * point of the split; a plain band/posting self-join or a monolithic
  * OrderedPairs row has no such bound, so these tests are RED under
  * either reversion).
  */
class BucketedPairsSpec extends SparkSpec {

  import spark.implicits._

  private def bucketFrame(bs: Seq[(String, Seq[Long])]): DataFrame =
    bs.toDF("k", "ids").select(col("k"), sort_array(col("ids")).as("ds"))

  private def naivePairs(bs: Seq[(String, Seq[Long])]): Seq[(Long, Long)] =
    bs.flatMap { case (_, ids) =>
      val s = ids.distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.size) yield (s(i), s(j))
    }

  private def collected(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("lossless across light, hot, and mixed buckets (multiplicity preserved)") {
    val rnd = new scala.util.Random(41)
    // sizes straddle the cap (8): light buckets, exactly-cap, one-over,
    // and a 60-id hot bucket (8 chunks incl. a short tail chunk);
    // overlapping ids across buckets exercise the multiplicity contract
    val bs = Seq(4, 7, 8, 9, 17, 60).zipWithIndex.map { case (n, i) =>
      s"b$i" -> Seq.fill(n * 2)(rnd.nextInt(300).toLong).distinct.take(n).toSeq
    }.filter(_._2.size >= 2)
    val got = collected(BucketedPairs.expand(bucketFrame(bs), "k", "ds", cap = 8))
    val want = naivePairs(bs)
    assert(got.sorted == want.sorted,
      s"pair multiset drift: got ${got.size}, want ${want.size}")
    // and every emitted pair is ordered
    assert(got.forall { case (a, b) => a < b })
  }

  test("one hot bucket: full quadratic pair set survives the split exactly") {
    val ids = (1L to 300L).map(_ * 7L) // sorted, distinct, non-contiguous
    val bs = Seq("hot" -> ids)
    val got = collected(BucketedPairs.expand(bucketFrame(bs), "k", "ds", cap = 16))
    assert(got.size == 300 * 299 / 2, s"lost pairs: ${got.size}")
    assert(got.distinct.size == got.size, "duplicated pairs within one bucket")
    assert(got.toSet == naivePairs(bs).toSet)
  }

  test("the chunk bound holds: no collected array exceeds the cap") {
    // RED under the plain expansion: a monolithic OrderedPairs row (or
    // a plain self-join key) carries the WHOLE 300-id bucket; the
    // operator's contract is that past the cap every collected array —
    // the unit one task materializes — stays ≤ cap, and the chunks
    // reassemble the original bucket exactly
    val ids = (1L to 300L)
    val chunks = BucketedPairs.chunkFrame(
      bucketFrame(Seq("hot" -> ids, "cold" -> Seq(1L, 2L))), "k", "ds", cap = 16)
    val rows = chunks.select(col("k"), col("chunk"), col("cds")).collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0) == "hot"),
      "cold buckets must never enter the chunk path")
    assert(rows.forall(_.getSeq[Long](2).size <= 16),
      "a chunk exceeded the cap — the single-task bound is gone")
    assert(rows.length == math.ceil(300.0 / 16).toInt)
    val reassembled = rows.sortBy(_.getLong(1)).flatMap(_.getSeq[Long](2)).toSeq
    assert(reassembled == ids, "chunks must reassemble the sorted bucket")
  }

  test("scalacheck-style fuzz: random bucket sets at several caps") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 5; cap <- Seq(2, 3, 8)) {
      val bs = (0 until 6).map { i =>
        val n = 1 + rnd.nextInt(25)
        s"t$trial-b$i" -> Seq.fill(n)(rnd.nextInt(40).toLong).distinct
      }.filter(_._2.size >= 2)
      val got = collected(BucketedPairs.expand(bucketFrame(bs), "k", "ds", cap))
      assert(got.sorted == naivePairs(bs).sorted, s"trial=$trial cap=$cap")
    }
  }
}
