package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  // triangle a-b-c, pendant chain c-d-e, and a 4-clique f-g-h-i
  // sharing no nodes with the rest
  private def graph = {
    import spark.implicits._
    Seq(
      ("a", "b"), ("b", "c"), ("a", "c"),
      ("c", "d"), ("d", "e"),
      ("f", "g"), ("f", "h"), ("f", "i"),
      ("g", "h"), ("g", "i"), ("h", "i")
    ).toDF("u", "v")
  }

  private def coreMap(k: Int): Map[String, Long] =
    KCore.core(graph, k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("2-core drops the pendant chain, keeps triangle and clique") {
    val c = coreMap(2)
    assert(c.keySet == Set("a", "b", "c", "f", "g", "h", "i"))
    assert(c("a") == 2L && c("c") == 2L) // c's chain edges are gone
  }

  test("3-core keeps only the 4-clique at full degree") {
    val c = coreMap(3)
    assert(c.keySet == Set("f", "g", "h", "i"))
    assert(c.values.forall(_ == 3L))
  }

  test("4-core of this graph is empty") {
    assert(KCore.core(graph, 4).isEmpty)
  }

  test("result is a fixpoint: every core member keeps >= k neighbors") {
    val c = KCore.core(graph, 2)
    assert(c.filter(col("deg") < 2).isEmpty)
    // one more peel over the induced subgraph changes nothing
    val nodes = c.select(col("node").as("u"))
    val sym = {
      import spark.implicits._
      val e = graph
      e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    }
    val induced = sym.join(nodes, Seq("u"))
      .join(nodes.select(col("u").as("v")), Seq("v"))
    val redeg = induced.groupBy("u").agg(count(lit(1)).as("d"))
    assert(redeg.filter(col("d") < 2).isEmpty)
  }

  test("self-loops are ignored") {
    import spark.implicits._
    val g = Seq(("a", "a"), ("a", "b")).toDF("u", "v")
    assert(KCore.core(g, 1).count() == 2) // a-b survives, loop doesn't
    assert(KCore.core(g, 2).isEmpty)
  }
}
