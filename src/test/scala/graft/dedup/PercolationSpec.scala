package graft.dedup

import graft.SparkSpec

class PercolationSpec extends SparkSpec {

  // weighted graph:
  //   w=3: 1-2, 2-3            → {1,2,3}
  //   w=2: 3-4, 10-11          → {1,2,3,4}, {10,11}
  //   w=1: 4-10, 20-21         → {1..4,10,11}, {20,21}
  private def weighted = {
    import spark.implicits._
    Seq(
      (1L, 2L, 3L), (2L, 3L, 3L),
      (3L, 4L, 2L), (10L, 11L, 2L),
      (4L, 10L, 1L), (20L, 21L, 1L))
      .toDF("u", "v", "w")
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("threshold").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("incremental census matches hand-computed components per threshold") {
    val got = rowsOf(Dedup.percolation(weighted, Seq(1L, 2L, 3L)))
    assert(got == Seq(
      (1L, 8L, 2L, 6L),   // {1,2,3,4,10,11} + {20,21}
      (2L, 6L, 2L, 4L),   // {1,2,3,4} + {10,11}
      (3L, 3L, 1L, 3L))) // {1,2,3}
  }

  test("one-pass driver path and per-threshold distributed fallback agree") {
    val local = rowsOf(Dedup.percolation(weighted, Seq(1L, 2L, 3L)))
    val dist = rowsOf(
      Dedup.percolation(weighted, Seq(1L, 2L, 3L), localEdgeCap = 0))
    assert(local == dist)
  }

  test("threshold above every weight yields an empty census row") {
    val got = rowsOf(Dedup.percolation(weighted, Seq(5L)))
    assert(got == Seq((5L, 0L, 0L, 0L)))
  }
}
