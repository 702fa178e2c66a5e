package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based checks for the iterative graph operators against
  * straightforward driver-side reference implementations on random
  * graphs. The operators claim EXACT partition-invariant integer
  * results (fixed-point PageRank, integer peel/frontier rules), so
  * the comparison is equality of full result sets, not tolerance.
  * Fixed seeds reproduce failures.
  */
class GraphOperatorPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // directed edges over 20 nodes; dense enough for multi-hop
  // structure, sparse enough for isolated nodes and danglers
  private val genEdge: Gen[(String, String)] = for {
    a <- Gen.chooseNum(0, 19)
    b <- Gen.chooseNum(0, 19)
    if a != b
  } yield (s"n$a", s"n$b")

  // ---------------------------------------------------------- PageRank
  /** Driver-side mirror of PageRank.ranks' exact integer semantics:
    * teleport = ((den−num)·(scale DIV n)) DIV den, contrib via floor
    * division by out-degree, dangling mass dropped.
    */
  private def refRanks(
      edges: Seq[(String, String)], iters: Int,
      scale: Long = 1000000000000L, num: Int = 85, den: Int = 100)
      : Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val teleport = ((den - num) * (scale / n)) / den
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (s, d) => d -> r(s) / outdeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(v => v -> (teleport + (num * contrib.getOrElse(v, 0L)) / den)).toMap
    }
    r
  }

  test("PageRank equals the integer reference on random digraphs") {
    samples(Gen.listOfN(50, genEdge), 4, seed = 15100L).foreach { es =>
      val edges = es.distinct
      val got = PageRank.ranks(edges.toDF("src", "dst"), iters = 2)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == refRanks(edges, iters = 2),
        s"PageRank diverged for edges=$edges")
    }
  }

  // ------------------------------------------------------------ k-core
  /** Reference peel: drop nodes with degree < k until fixpoint;
    * returns each survivor with its in-core degree.
    */
  private def refCore(
      edges: Seq[(String, String)], k: Int): Map[String, Long] = {
    var und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1))).distinct
    var changed = true
    while (changed) {
      val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = und.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != und.size
      und = next
    }
    und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
  }

  test("KCore equals the reference peel on random graphs, k in {2,3}") {
    samples(Gen.listOfN(40, genEdge), 4, seed = 15200L).foreach { es =>
      val edges = es.distinct
      for (k <- Seq(2, 3)) {
        val got = KCore.core(edges.toDF("u", "v"), k)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == refCore(edges, k),
          s"KCore diverged for k=$k edges=$edges")
      }
    }
  }

  // --------------------------------------------------------------- BFS
  private def refBfs(
      edges: Seq[(String, String)], seeds: Seq[String], maxHops: Int)
      : Map[String, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = seeds.distinct.map(_ -> 0L).toMap
    var frontier = seeds.distinct.toSet
    for (h <- 1 to maxHops) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Nil))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  test("Bfs.distances equals the reference frontier on random digraphs") {
    samples(Gen.listOfN(45, genEdge), 4, seed = 15300L).foreach { es =>
      val edges = es.distinct
      val seeds = edges.map(_._1).distinct.take(3)
      for (hops <- Seq(0, 2, 3)) {
        val got = Bfs.distances(
            edges.toDF("src", "dst"), seeds.toDF("node"), hops)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == refBfs(edges, seeds, hops),
          s"Bfs diverged for hops=$hops seeds=$seeds edges=$edges")
      }
    }
  }
}
