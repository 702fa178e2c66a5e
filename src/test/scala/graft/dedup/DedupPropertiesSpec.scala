package graft.dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check for Dedup.clusters: random graphs (long
  * chains, stars, isolated pairs, dense cliques) must label every
  * node with the min id of its component — on BOTH execution paths
  * (driver-side union-find and distributed label propagation), which
  * must also agree with each other. Fixed seeds reproduce failures.
  */
class DedupPropertiesSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // 40 nodes, random edges: super-critical enough for a giant
  // component plus stragglers
  private val genEdge: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(0, 39)
    b <- Gen.chooseNum(0, 39)
    if a != b
  } yield (math.min(a, b).toLong, math.max(a, b).toLong)

  /** Reference components: plain union-find in Scala. */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // min id of the component = the root under min-union
    nodes.map(n => n -> find(n)).toMap
  }

  test("both cluster paths equal union-find on random graphs") {
    import spark.implicits._
    for (seed <- Seq(7L, 42L, 99L)) {
      // a long chain is the worst case for label propagation depth —
      // always include one alongside the random edges
      val chain = (20 to 35).map(i => (i.toLong, (i + 1).toLong))
      val edges = (samples(genEdge, 25, seed) ++ chain).distinct
      val df = edges.toDF("doc_a", "doc_b")
      val want = reference(edges)

      val local = Dedup.clusters(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == want, s"seed=$seed local path diverges from union-find")

      // cap 0 forces the distributed label-propagation loop
      val dist = Dedup.clusters(df, maxIters = 12, localEdgeCap = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == want, s"seed=$seed distributed path diverges from union-find")
    }
  }
}
