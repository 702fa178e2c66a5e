package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed overlap join must produce exactly the pairs of the
  * naive theta join, for every bin width.
  */
class RangeJoinSpec extends SparkSpec {

  private def mkDf() = {
    import spark.implicits._
    // Deterministic pseudo-random intervals, including exact-touching
    // endpoints (no overlap under strict inequality) and containment.
    val base = 1700000000000L
    (1 to 60).map { i =>
      val start = base + (i * 7919L % 97) * 60000L
      val len = (i * 104729L % 50 + 1) * 60000L
      (i.toLong, new Timestamp(start), new Timestamp(start + len))
    }.toDF("id", "start_ts", "end_ts")
  }

  private def naivePairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val a = df.as("a")
    val b = df.as("b")
    a.join(b,
        col("a.id") < col("b.id") &&
        col("a.start_ts") < col("b.end_ts") &&
        col("a.end_ts") > col("b.start_ts"))
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("bucketed join ≡ theta join for several bin widths") {
    val df = mkDf()
    val expected = naivePairs(df)
    assert(expected.nonEmpty)
    for (bin <- Seq(1, 7, 30, 120)) {
      val got = RangeJoin.overlapSelfJoin(df, "id", "start_ts", "end_ts", bin)
        .select(col("a_id"), col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"bin=$bin")
    }
  }

  test("no duplicate pairs emitted across bins") {
    val df = mkDf()
    val out = RangeJoin.overlapSelfJoin(df, "id", "start_ts", "end_ts", 5)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.toSet.size)
  }

  test("pointInInterval equals the theta join, once per pair, at any bin width") {
    import spark.implicits._
    val base = 1700000000000L
    val points = (1 to 200).map { i =>
      (i.toLong % 7, new java.sql.Timestamp(base + i * 3600000L), i.toLong)
    }.toDF("k", "ts", "pid")
    val ivs = (1 to 30).map { j =>
      val s0 = base + (j * 37 % 120) * 3600000L
      (j.toLong % 7, new java.sql.Timestamp(s0),
        new java.sql.Timestamp(s0 + (j % 5 + 1) * 7200000L), j.toLong)
    }.toDF("k", "s", "e", "iid")
    val naive = points.as("p").join(ivs.as("i"),
        $"p.k" === $"i.k" && $"p.ts" >= $"i.s" && $"p.ts" < $"i.e")
      .select($"p.pid", $"i.iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(naive.nonEmpty && naive.length == naive.toSet.size)
    Seq(30, 360, 1440).foreach { bm =>
      val got = graft.operators.RangeJoin
        .pointInInterval(points, "ts", ivs, "s", "e", keys = Seq("k"), binMinutes = bm)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == naive.length && got.toSet == naive.toSet, s"binMinutes=$bm")
    }
  }
}
