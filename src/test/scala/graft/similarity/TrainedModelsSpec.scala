package graft.similarity

import graft.SparkSpec
import graft.queries.AnnModelOracle

class TrainedModelsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ivf cache returns the same model instance per (dir, params)") {
    val a = TrainedModels.ivf(spark, dir, k = 16, iters = 3)
    val b = TrainedModels.ivf(spark, dir, k = 16, iters = 3)
    assert(a eq b, "second lookup must hit the JVM cache, not retrain")
    assert(a.size <= 16 && a.nonEmpty)
    assert(a.map(_._1) == a.map(_._1).sorted, "cids must be ascending")
    assert(a.forall(_._2.size == a.head._2.size), "uniform dimension")
  }

  test("pq cache returns the same codebook instance per (dir, params)") {
    val a = TrainedModels.pq(spark, dir, m = 8, k = 16, iters = 1)
    val b = TrainedModels.pq(spark, dir, m = 8, k = 16, iters = 1)
    assert(a eq b)
    assert(a.size == 8 && a.forall(_.size == 16))
  }

  test("ivfCentroids DataFrame mirrors the cached model") {
    val model = TrainedModels.ivf(spark, dir, k = 16, iters = 3)
    val df = TrainedModels.ivfCentroids(spark, dir, k = 16, iters = 3)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    assert(df.toSeq == model)
  }

  test("generated IVF oracle SQL inlines every centroid and is finite") {
    val model = TrainedModels.ivf(spark, dir, k = 16, iters = 3)
    val sql = AnnModelOracle.ivfSql(model, stride = 50L, nprobe = 4, topK = 3)
    // one VALUES row per centroid, recall alias matches the gate's
    assert(model.forall { case (cid, _) => sql.contains(s"($cid, CAST([") })
    assert(sql.contains("recall3"))
    assert(!sql.contains("NaN") && !sql.contains("Infinity"))
    // literals round-trip: first centroid's first component appears
    // via Double.toString (the repr DuckDB parses back to the bits)
    val d0 = model.head._2.head
    assert(sql.contains(if (d0 == 0.0) "0.0" else d0.toString))
  }

  test("generated PQ oracle SQL inlines every codebook cell with its norm") {
    val book = TrainedModels.pq(spark, dir, m = 8, k = 16, iters = 1)
    val sql = AnnModelOracle.pqSql(book, stride = 100L, refine = 40, topK = 5)
    for (j <- 0 until 8; c <- 0 until 16)
      assert(sql.contains(s"($j, $c, CAST(["), s"missing cell ($j,$c)")
    // driver-side cell norm of cell (0,0) inlined exactly as the
    // sequential Scala fold PqIndex.encode uses
    val n00 = book.head.head.map(x => x * x).sum
    assert(sql.contains(n00.toString))
    assert(sql.contains("recall5"))
    assert(!sql.contains("NaN") && !sql.contains("Infinity"))
  }
}
