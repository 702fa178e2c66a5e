package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema evolution at the storage boundary: a long-lived table whose
  * writers gain columns over time must stay readable as one frame —
  * `mergeSchema` unions the per-file schemas and back-fills typed
  * nulls, the same absent-column tolerance the cleaner applies at the
  * API boundary (SURVEY §1.4).
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unions old and new file schemas with typed nulls") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_evo").toString

    // v1 writer: two columns
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.parquet(s"$base/t")
    // v2 writer: adds a score column
    Seq((3L, "c", 1.5), (4L, "d", 2.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(s"$base/t")

    val merged = spark.read.option("mergeSchema", true).parquet(s"$base/t")
    assert(merged.columns.sorted.toSeq == Seq("id", "name", "score"))

    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getAs[java.lang.Double]("score")).map(_.toDouble)))
    assert(rows.toSeq == Seq(
      (1L, "a", None), (2L, "b", None),
      (3L, "c", Some(1.5)), (4L, "d", Some(2.5))))

    // old-schema readers keep working against the evolved table
    val narrow = spark.read.schema("id LONG, name STRING").parquet(s"$base/t")
    assert(narrow.count() == 4)
  }
}
