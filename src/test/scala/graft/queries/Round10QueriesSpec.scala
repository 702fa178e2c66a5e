package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-10 gate queries. */
class Round10QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sql unpivot: one row per measure, counts equal the part count") {
    val out = graft.SparkEntry.queries("q181_sql_unpivot")(spark, dir).cache()
    assert(out.count() === 2)
    val parts = graft.Tables.load(spark, dir, "part").count()
    assert(out.filter(col("n") =!= parts).isEmpty)
    assert(out.filter(col("mn") > col("mx")).isEmpty)
    out.unpersist()
  }

  test("array setops: intersect plus except partition the left set") {
    val out = graft.SparkEntry.queries("q182_array_setops")(spark, dir).cache()
    assert(out.count() > 0)
    // |A| = |A∩B| + |A\B| over distinct elements: rebuild sizes from
    // the joined strings
    def nOf(c: String) = when(col(c) === "", 0)
      .otherwise(size(split(col(c), ",")))
    val d = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"),
        size(array_distinct(slice(split(col("text"), " "), 1, 10))).as("na"))
    val j = out.join(d, "doc_id")
    assert(j.filter(nOf("i") + nOf("x") =!= col("na")).isEmpty)
    out.unpersist()
  }

  test("date spine: no calendar gaps, zero-count days present") {
    val out = graft.SparkEntry.queries("q183_date_spine")(spark, dir).cache()
    assert(out.count() > 0)
    // day 1 and day 2 of every month inside the bounds appear
    val perMonth = out.groupBy(trunc(col("d"), "month").as("m"))
      .agg(count(lit(1)).as("c"))
    assert(perMonth.filter(col("c") =!= 2).count() <= 2) // first/last partial months
    assert(out.filter(col("n") === 0).count() > 0, "no gap days found")
    out.unpersist()
  }
}
