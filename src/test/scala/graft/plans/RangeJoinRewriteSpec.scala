package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The optimizer rule must (a) turn the nested-loop overlap join into
  * an equi-join physically, (b) keep results pair-identical, (c) leave
  * joins that already have equi keys untouched.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeJoinRewrite)
  }

  private def intervals: DataFrame = {
    import spark.implicits._
    val base = 1700000000000L
    (1 to 80).map { i =>
      val start = base + (i * 7919L % 131) * 60000L
      val len = (i * 104729L % 45 + 1) * 60000L
      (i.toLong, new Timestamp(start), new Timestamp(start + len))
    }.toDF("id", "start_ts", "end_ts")
  }

  private def overlapJoin(df: DataFrame): DataFrame = {
    val a = df.as("a")
    val b = df.as("b")
    a.join(b,
        col("a.id") < col("b.id") &&
        col("a.start_ts") < col("b.end_ts") &&
        col("a.end_ts") > col("b.start_ts"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
  }

  test("rewrites the theta join to a physical equi-join with identical pairs") {
    val df = intervals
    val baseline = overlapJoin(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(baseline.nonEmpty)

    withRule {
      val rewritten = overlapJoin(df)
      val physical = rewritten.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"), physical)
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == baseline)
    }
  }

  test("joins that already have an equi key are left untouched") {
    import spark.implicits._
    val df = intervals.withColumn("k", col("id") % 5)
    withRule {
      val j = df.as("a").join(df.as("b"),
        col("a.k") === col("b.k") && col("a.start_ts") < col("b.end_ts") &&
          col("a.end_ts") > col("b.start_ts"))
      // no Generate injected → no __graft_bin attribute anywhere
      assert(!j.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      j.count() // still runs
    }
  }

  test("a corrupt open-ended interval cannot explode the fan-out") {
    import spark.implicits._
    val base = 1700000000000L
    // one row whose end_time is ~40 years after start (corrupt), at a
    // 1-minute bin width → would be ~21M generated rows without a cap
    val df = (Seq((1L, base, base + 40L * 365 * 24 * 3600 * 1000)) ++
      (2 to 6).map(i => (i.toLong, base + i * 60000L, base + i * 60000L + 120000L)))
      .map { case (id, s, e) => (id, new Timestamp(s), new Timestamp(e)) }
      .toDF("id", "start_ts", "end_ts")
    spark.conf.set(RangeJoinRewrite.binMinutesKey, "1")
    spark.conf.set(RangeJoinRewrite.maxBinsKey, "100")
    spark.conf.set(RangeJoinRewrite.onClampKey, "silent")
    try withRule {
      val rewritten = overlapJoin(df)
      assert(rewritten.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      // the corrupt row still pairs with every nearby short interval
      // (they all start within the 100-bin horizon), the consecutive
      // 2-minute intervals still pair with each other, and it's fast
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (2 to 6).map(i => (1L, i.toLong)).toSet ++
        (2 to 5).map(i => (i.toLong, i + 1L))
      assert(got == expected)
    } finally {
      spark.conf.unset(RangeJoinRewrite.binMinutesKey)
      spark.conf.unset(RangeJoinRewrite.maxBinsKey)
      spark.conf.unset(RangeJoinRewrite.onClampKey)
    }
  }

  test("by default an interval exceeding maxBins fails loudly, never silently drops") {
    import spark.implicits._
    val base = 1700000000000L
    // row 1 spans 200 one-minute bins — over the 100-bin bound, small
    // enough that the unbounded re-run stays fast
    val df = (Seq((1L, base, base + 200L * 60000)) ++
      (2 to 4).map(i => (i.toLong, base + i * 60000L, base + i * 60000L + 120000L)))
      .map { case (id, s, e) => (id, new Timestamp(s), new Timestamp(e)) }
      .toDF("id", "start_ts", "end_ts")
    spark.conf.set(RangeJoinRewrite.binMinutesKey, "1")
    spark.conf.set(RangeJoinRewrite.maxBinsKey, "100")
    try withRule {
      val err = intercept[Exception](overlapJoin(df).collect())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(err).exists(_.contains("graft range-join rewrite")), err)
      // maxBins=0 unbounds the explode: same query then succeeds exactly
      spark.conf.set(RangeJoinRewrite.maxBinsKey, "0")
      val got = overlapJoin(df).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == ((2 to 4).map(i => (1L, i.toLong)).toSet ++
        (2 to 3).map(i => (i.toLong, i + 1L))))
    } finally {
      spark.conf.unset(RangeJoinRewrite.binMinutesKey)
      spark.conf.unset(RangeJoinRewrite.maxBinsKey)
    }
  }

  test("respects the enabled flag") {
    spark.conf.set(RangeJoinRewrite.enabledKey, "false")
    try withRule {
      val j = overlapJoin(intervals)
      assert(!j.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    } finally spark.conf.unset(RangeJoinRewrite.enabledKey)
  }
}
