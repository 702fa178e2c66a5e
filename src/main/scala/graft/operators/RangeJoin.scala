package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval-overlap self-join.
  *
  * The reference's overlap query (`aggregators.py:298-325`) is a pure
  * theta join — Catalyst can only plan that as a nested-loop join,
  * which is O(n²) and falls over far below 100 TB (SURVEY §4.2 marks
  * this as the one operator where a custom strategy pays off).
  *
  * This rewrite time-bins every interval and joins on bin equality, so
  * Spark plans a shuffled equi-join: shuffle volume is O(rows ×
  * bins-per-interval) and each bin's pairs are produced independently
  * — the 1000-executor-safe shape. A pair spanning several shared
  * bins would match more than once; the `dedupBin` predicate keeps
  * exactly the bin containing the later interval start, so no
  * distinct pass is needed.
  */
object RangeJoin {

  /** All (a, b) pairs with `a.id < b.id` whose [start, end) intervals
    * overlap. Output columns are the input's, prefixed `a_` / `b_`.
    *
    * @param binMinutes bucket width — choose ≥ the typical interval
    *                   length so most intervals land in 1-2 bins.
    */
  def overlapSelfJoin(
      df: DataFrame,
      idCol: String,
      startCol: String,
      endCol: String,
      binMinutes: Int): DataFrame = {
    require(binMinutes > 0, "binMinutes must be positive")
    val binMicros = binMinutes * 60000000L

    val binned = df.withColumn("__bin",
      explode(sequence(
        floor(unix_micros(col(startCol)) / binMicros),
        floor(unix_micros(col(endCol)) / binMicros))))

    val a = binned.as("a")
    val b = binned.as("b")
    val dedupBin = col("a.__bin") ===
      floor(greatest(unix_micros(col(s"a.$startCol")),
        unix_micros(col(s"b.$startCol"))) / binMicros)

    val joined = a.join(b,
      col("a.__bin") === col("b.__bin") &&
      col(s"a.$idCol") < col(s"b.$idCol") &&
      col(s"a.$startCol") < col(s"b.$endCol") &&
      col(s"a.$endCol") > col(s"b.$startCol") &&
      dedupBin)

    val projected = df.columns.flatMap(c =>
      Seq(col(s"a.$c").as(s"a_$c"), col(s"b.$c").as(s"b_$c")))
    joined.select(projected.toSeq: _*)
  }

  /** Point-in-interval join: every `points` row pairs with each
    * `intervals` row (matching on `keys`, if any) whose
    * `[startCol, endCol)` contains its `tsCol`. Equi-shaped the same
    * way as [[overlapSelfJoin]] — intervals explode into their covered
    * bins, points carry exactly ONE bin, so each qualifying pair
    * arises exactly once and no dedup predicate is needed. The
    * event-to-enclosing-window assignment join (sessionless
    * attribution, disruption-window tagging) that a raw theta join
    * would plan as a nested loop.
    *
    * Output: the point row's columns plus `intervals`' non-key columns.
    */
  def pointInInterval(
      points: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keys: Seq[String] = Nil,
      binMinutes: Int = 360): DataFrame = {
    require(binMinutes > 0, "binMinutes must be positive")
    val binMicros = binMinutes * 60000000L
    val p = points.withColumn("__bin",
      floor(unix_micros(col(tsCol)) / binMicros).cast("long"))
    val i = intervals.withColumn("__bin",
      explode(sequence(
        floor(unix_micros(col(startCol)) / binMicros),
        floor(unix_micros(col(endCol)) / binMicros))))
    p.join(i, keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
