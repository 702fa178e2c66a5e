package graft.operators

import graft.SparkSpec

class BfsSpec extends SparkSpec {

  // path graph a-b-c-d-e (bidirected) plus isolated island x-y
  private def graph = {
    import spark.implicits._
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y"))
    (und ++ und.map(_.swap)).toDF("src", "dst")
  }

  private def dists(seedNames: String*): Map[String, Long] = {
    import spark.implicits._
    Bfs.distances(graph, seedNames.toDF("node"), maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("hop-bounded distances from a single seed") {
    assert(dists("a") == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("multi-source takes the minimum over seeds") {
    assert(dists("a", "d") ==
      Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 0L, "e" -> 1L))
  }

  test("disconnected components stay unreached") {
    assert(!dists("a").contains("x"))
    assert(dists("x") == Map("x" -> 0L, "y" -> 1L))
  }

  test("seed not present in the graph reaches only itself") {
    assert(dists("zz") == Map("zz" -> 0L))
  }

  test("perSeedDistances matches single-seed runs for every seed") {
    import spark.implicits._
    val multi = Bfs.perSeedDistances(graph, Seq("a", "d", "x").toDF("node"),
        maxHops = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    for (sd <- Seq("a", "d", "x")) {
      val single = dists(sd)
      assert(multi.collect { case ((s, n), v) if s == sd => n -> v }.toMap
        == single, s"seed $sd")
    }
  }
}
