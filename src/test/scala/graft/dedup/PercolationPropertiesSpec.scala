package graft.dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based check for Dedup.percolation: on random weighted
  * graphs, the one-pass incremental census must equal (a) a plain
  * per-threshold reference union-find computed independently per
  * cutoff, and (b) the distributed per-threshold fallback path.
  * Fixed seeds reproduce failures.
  */
class PercolationPropertiesSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // 30 nodes, weights 1–4: all thresholds populated with high
  // probability, components change shape between cutoffs
  private val genEdge: Gen[(Long, Long, Long)] = for {
    a <- Gen.chooseNum(0, 29)
    b <- Gen.chooseNum(0, 29)
    if a != b
    w <- Gen.chooseNum(1, 4)
  } yield (math.min(a, b).toLong, math.max(a, b).toLong, w.toLong)

  /** Reference census: an independent union-find per threshold. */
  private def reference(
      edges: Seq[(Long, Long, Long)],
      thresholds: Seq[Long]): Seq[(Long, Long, Long, Long)] =
    thresholds.sorted.map { thr =>
      val kept = edges.filter(_._3 >= thr)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      kept.foreach { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = kept.flatMap(e => Seq(e._1, e._2)).distinct
      val comps = nodes.groupBy(find).values.map(_.size.toLong).toSeq
      (thr, nodes.size.toLong, comps.size.toLong,
        if (comps.isEmpty) 0L else comps.max)
    }

  private def censusOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("threshold").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("incremental census equals per-threshold reference union-find") {
    import spark.implicits._
    val thresholds = Seq(1L, 2L, 3L, 4L)
    samples(Gen.listOfN(45, genEdge), 6, seed = 9100L).foreach { es =>
      val edges = es.distinct
      val got = censusOf(
        Dedup.percolation(edges.toDF("u", "v", "w"), thresholds))
      assert(got == reference(edges, thresholds),
        s"incremental census diverged for edges=$edges")
    }
  }

  test("fallback path returns exact zeros for a threshold keeping no edges") {
    import spark.implicits._
    // weights are 1–4, so threshold 9 keeps zero edges: the fallback
    // aggregate runs over an empty grouped frame and must coalesce
    // sum/max to 0 (not NULL) to match the driver fast path
    val thresholds = Seq(1L, 9L)
    samples(Gen.listOfN(20, genEdge), 3, seed = 9300L).foreach { es =>
      val df = es.distinct.toDF("u", "v", "w")
      val local = censusOf(Dedup.percolation(df, thresholds))
      val dist = censusOf(
        Dedup.percolation(df, thresholds, maxIters = 12, localEdgeCap = 0))
      assert(local == dist, s"paths diverged for edges=${es.distinct}")
      assert(dist.exists { case (t, n, c, g) => t == 9L && n == 0L && c == 0L && g == 0L },
        s"threshold-9 row must be exact zeros, got $dist")
    }
  }

  test("driver fast path and distributed fallback produce identical rows") {
    import spark.implicits._
    val thresholds = Seq(1L, 3L)
    samples(Gen.listOfN(30, genEdge), 3, seed = 9200L).foreach { es =>
      val df = es.distinct.toDF("u", "v", "w")
      val local = censusOf(Dedup.percolation(df, thresholds))
      val dist = censusOf(
        Dedup.percolation(df, thresholds, maxIters = 12, localEdgeCap = 0))
      assert(local == dist, s"paths diverged for edges=${es.distinct}")
    }
  }
}
