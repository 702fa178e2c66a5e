package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden end-to-end test against the reference's real capture:
  * `data/raw/disruptions_20260214_111810.json` →
  * `data/processed/cleaned_20260214_111810.csv` (125 records, clock
  * pinned — FIXTURES.md §2 invariants). Skipped when the reference
  * checkout isn't present.
  */
class GoldenCleanSpec extends SparkSpec {

  private val goldenRaw =
    "/root/reference/data/raw/disruptions_20260214_111810.json"

  private def available: Boolean = Files.exists(Paths.get(goldenRaw))

  private lazy val cleaned = {
    val raw = graft.sources.RawSource.readRawJsonArray(spark, goldenRaw)
    DisruptionCleaner.clean(raw, Clock.golden).cache()
  }

  test("golden: 125 rows survive cleaning") {
    assume(available)
    assert(cleaned.count() == 125)
  }

  test("golden: type distribution maintenance=118 disruption=5 calamity=2") {
    assume(available)
    val counts = cleaned.groupBy("type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("maintenance" -> 118L, "disruption" -> 5L, "calamity" -> 2L))
  }

  test("golden: impact distribution 4→107, 3→16, 5→2") {
    assume(available)
    val counts = cleaned.groupBy("impact_level").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(4 -> 107L, 3 -> 16L, 5 -> 2L))
  }

  test("golden: affected_stations all null (the reference's faithful-but-odd paths)") {
    assume(available)
    assert(cleaned.filter(col("affected_stations").isNotNull).count() == 0)
  }

  test("golden: no null disruption_id, impact within [1,5]") {
    assume(available)
    assert(cleaned.filter(col("disruption_id").isNull).count() == 0)
    assert(cleaned.filter(col("impact_level") < 1 || col("impact_level") > 5).count() == 0)
  }
}
