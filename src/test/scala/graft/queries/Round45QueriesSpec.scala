package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-45 gate query. */
class Round45QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("temporal split: partitions the log, train self-overlap is total") {
    val out = graft.SparkEntry.queries("q290_temporal_split")(spark, dir)
      .cache()
    assert(out.count() === 3, "train, val, test")
    val events = graft.Tables.load(spark, dir, "events").count()
    assert(out.agg(sum("n_events")).head().getLong(0) === events,
      "every event lands in exactly one split")
    val train = out.filter(col("split") === "train").head()
    assert(train.getAs[Long]("train_overlap_users") ===
      train.getAs[Long]("n_users"), "train overlaps itself completely")
    assert(out.filter(col("train_overlap_users") > col("n_users")).isEmpty)
    assert(out.filter(col("overlap_share") < 0.0 ||
      col("overlap_share") > 1.0).isEmpty)
    out.unpersist()
  }
}
