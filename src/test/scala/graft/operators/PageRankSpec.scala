package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  private def ranksMap(edges: Seq[(String, String)], iters: Int, scale: Long) = {
    import spark.implicits._
    PageRank.ranks(edges.toDF("src", "dst"), iters, scale)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  // hand-computed: N=3, r0 = 1000 DIV 3 = 333,
  // teleport = (15·333) DIV 100 = 49, r1 = 49 + (85·333) DIV 100 = 332
  test("symmetric cycle keeps all ranks equal (hand-computed fixed point)") {
    val got = ranksMap(Seq(("a", "b"), ("b", "c"), ("c", "a")), iters = 1, scale = 1000L)
    assert(got == Map("a" -> 332L, "b" -> 332L, "c" -> 332L))
  }

  // hub h, spokes x/y, bidirected. contrib(h)=333+333, contrib(x)=333 DIV 2=166
  // r1(h) = 49 + (85·666) DIV 100 = 615; r1(x) = 49 + (85·166) DIV 100 = 190
  test("hub accumulates spoke mass (hand-computed)") {
    val got = ranksMap(
      Seq(("h", "x"), ("h", "y"), ("x", "h"), ("y", "h")), iters = 1, scale = 1000L)
    assert(got == Map("h" -> 615L, "x" -> 190L, "y" -> 190L))
  }

  // a→b only: b is dangling, its mass drops; a keeps only teleport
  test("dangling mass is dropped, not redistributed") {
    val got = ranksMap(Seq(("a", "b")), iters = 1, scale = 1000L)
    assert(got == Map("a" -> 75L, "b" -> 500L))
  }

  test("result is identical under different input partitioning") {
    import spark.implicits._
    val edges = (1 to 200).map(i => (s"n${i % 20}", s"n${(i * 7) % 20}"))
    val a = PageRank.ranks(edges.toDF("src", "dst").repartition(1), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = PageRank.ranks(edges.toDF("src", "dst").repartition(13), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
