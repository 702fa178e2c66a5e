package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe` (CollectMetrics):
  * quality counters computed INSIDE whatever job already runs — no
  * second scan, exact even under retries, and streaming-safe (per
  * micro-batch). The runtime twin of the q110 constraint suite: q110
  * audits a table at rest, these metrics watch rows as they flow
  * through a load, which is how the reference's per-run record counts
  * (`src/pipeline.py:304-342`) scale without re-reading the input.
  */
object Metrics {

  /** Attach row/null/violation counters to `df` under metric `name`.
    * `checks` are predicate columns counted when FALSE (violations).
    * Read the results from a `QueryExecutionListener` after any action
    * (see PipelineMetricsSpec).
    */
  def observeQuality(
      df: DataFrame,
      name: String,
      nullCols: Seq[String],
      checks: Map[String, Column] = Map.empty): DataFrame = {
    val nullCounters = nullCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
    val checkCounters = checks.toSeq.sortBy(_._1).map { case (n, pred) =>
      sum(when(pred, 0L).otherwise(1L)).as(s"n_bad_$n")
    }
    df.observe(name, count(lit(1)).as("n_rows"), nullCounters ++ checkCounters: _*)
  }
}
