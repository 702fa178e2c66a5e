package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {

  private lazy val events =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_id"), col("value"))

  test("matches the row_number window form exactly") {
    val got = TopKPerKey.perKey(events, Seq("user_id"),
        Seq(desc("value"), asc("event_id")), k = 3, rankName = "rk")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("rk"))).toSet

    val w = Window.partitionBy("user_id").orderBy(desc("value"), asc("event_id"))
    val expected = events
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("rk"))).toSet

    assert(got == expected && got.nonEmpty)
  }

  test("plans partial before the exchange and final after it") {
    val plan = TopKPerKey.perKey(events, Seq("user_id"),
        Seq(desc("value"), asc("event_id")), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyExec") ||
      plan.split("TopKPerKeyPartial").head.contains("TopKPerKey"), plan)
    // partial feeds the shuffle: exchange sits between the two phases
    val idxFinal = plan.indexOf("TopKPerKey ")
    val idxEx = plan.indexOf("Exchange hashpartitioning(user_id")
    val idxPartial = plan.indexOf("TopKPerKeyPartial")
    assert(idxEx >= 0, plan)
    assert(idxPartial > idxEx, s"partial must be below the exchange\n$plan")
  }

  test("keys with fewer than k rows keep all rows; ranks are 1..n") {
    import spark.implicits._
    val df = Seq((1L, 10L, 5.0), (1L, 11L, 4.0), (2L, 20L, 1.0))
      .toDF("user_id", "event_id", "value")
    val got = TopKPerKey.perKey(df, Seq("user_id"),
        Seq(desc("value"), asc("event_id")), k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rk"))).toSet
    assert(got == Set((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L)))
  }

  test("downstream operations compose over the custom node") {
    val agg = TopKPerKey.perKey(events, Seq("user_id"),
        Seq(desc("value"), asc("event_id")), k = 3)
      .groupBy("user_id").agg(count(lit(1)).as("n"), max("rk").as("maxrk"))
    val rows = agg.collect()
    assert(rows.forall(r => r.getAs[Long]("n") <= 3))
    assert(rows.forall(r => r.getAs[Long]("n") == r.getAs[Long]("maxrk")))
  }
}
