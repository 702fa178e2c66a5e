package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Mergeable partial-aggregate state for incremental aggregate
  * maintenance ("materialized view" refresh): per group the stored
  * state is (row count, per-measure DECIMAL sum / min / max) — all
  * algebraic, so batches combine by re-aggregating the union of
  * partials. Derived finals (avg) are computed only at read time.
  *
  * The reference recomputes its `daily_stats` rollup from the full
  * cleaned table on every run (`src/pipeline.py:236-298`); at 100 TB
  * the only refresh that survives is O(new batch + touched groups),
  * which is exactly what [[partial]] + [[merge]] cost — the corpus is
  * never rescanned. Sums are exact DECIMAL(18,2) (the engine-wide
  * determinism rule), so the incrementally-maintained result is
  * bit-identical to a from-scratch aggregation regardless of how the
  * data was batched — gated as `q94_incremental_agg`.
  *
  * Append-only: count/sum subtract, but min/max are not invertible,
  * so deletes require recomputing the touched groups (or a CDC-driven
  * per-group rebuild) — the same restriction every incremental-view
  * engine documents for MIN/MAX.
  */
final case class AggSpec(keys: Seq[String], measures: Seq[String]) {

  private val dec = DecimalType(18, 2)
  private def stateAggs(sumOf: String => Column): Seq[Column] =
    measures.flatMap { m =>
      Seq(
        // re-cast per level so the state schema is closed under merge
        // (Spark widens sum(DECIMAL) precision each aggregation)
        sum(sumOf(m)).cast(dec).as(s"sum_$m"),
        min(col(s"min_$m")).as(s"min_$m"),
        max(col(s"max_$m")).as(s"max_$m"))
    }

  /** Aggregate one batch of raw rows to mergeable per-group state. */
  def partial(batch: DataFrame): DataFrame =
    batch
      .select(keys.map(col) ++ measures.flatMap(m =>
        Seq(col(m).cast(dec).as(s"sum_$m"), col(m).as(s"min_$m"), col(m).as(s"max_$m"))): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), stateAggs(m => col(s"sum_$m")): _*)

  /** Combine two partial states (associative + commutative). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"), stateAggs(m => col(s"sum_$m")): _*)

  /** Final aggregates from a state: exact sums surface as double, avg
    * from one shared IEEE tree (sum-as-double / count).
    */
  def finish(state: DataFrame): DataFrame =
    state.select(keys.map(col) ++ Seq(col("cnt").as("n_rows")) ++ measures.flatMap { m =>
      val sumD = col(s"sum_$m").cast("double")
      Seq(
        sumD.as(s"sum_$m"),
        (sumD / col("cnt")).as(s"avg_$m"),
        col(s"min_$m").as(s"min_$m"),
        col(s"max_$m").as(s"max_$m"))
    }: _*)
}

/** Store-backed incrementally-maintained aggregate table. Each
  * `accumulate(batchId, batch)` folds one batch's [[AggSpec.partial]]
  * into the persisted state; already-applied batch ids are skipped, so
  * re-running a batch (the reference's "safe to re-run" contract) is a
  * no-op. The state and the applied-ids ledger live under ONE table
  * directory (`<table>/state`, `<table>/ledger`) installed by a single
  * atomic rename ([[TableStore.swapWriteParts]]), so a crash can never
  * persist one without the other — on retry the batch either replays
  * cleanly (neither landed) or is skipped (both landed). Exactly-once
  * is therefore as strong as the filesystem's rename; on a store
  * without atomic rename (S3), use a transactional table format.
  */
final class AggTable(store: TableStore, table: String, spec: AggSpec) {

  private val statePart = s"$table/state"
  private val ledgerPart = s"$table/ledger"

  def state: Option[DataFrame] = store.read(statePart)

  /** Final aggregates of everything accumulated so far. */
  def result: Option[DataFrame] = state.map(spec.finish)

  // Driver-side mirror of the applied-ids ledger, lazily seeded from
  // the store (the DedupStore pattern): the ledger stays the
  // crash-safe record — it lands in every atomic swap and a fresh
  // instance re-reads it — but this instance stops paying a
  // ledger-scan job per accumulate. O(batches) ids by construction.
  private var appliedMemo: Option[scala.collection.mutable.Set[String]] = None

  private def appliedIds: scala.collection.mutable.Set[String] =
    appliedMemo.getOrElse {
      val s = scala.collection.mutable.Set.empty[String]
      // bounded-collect: O(batches) ids — the ledger's documented size
      store.read(ledgerPart).foreach(
        _.select("batch_id").collect().foreach(r => s += r.getString(0)))
      appliedMemo = Some(s)
      s
    }

  /** Fold one batch into the state; false if batchId was already
    * applied (nothing happens).
    */
  def accumulate(batchId: String, batch: DataFrame): Boolean = {
    val spark = batch.sparkSession
    import spark.implicits._
    if (appliedIds.contains(batchId)) false
    else {
      val p = spec.partial(batch)
      val ids = (appliedIds.toSeq :+ batchId).sorted.toDF("batch_id")
        .coalesce(1)
      state match {
        case None =>
          store.swapWriteParts(table, Seq("state" -> p, "ledger" -> ids))
        case Some(st) =>
          // no pre-swap materialization: swapWriteParts writes both
          // parts into `<table>__tmp` before the one rename, so the
          // merge plan still reads the live state files while writing
          store.swapWriteParts(table,
            Seq("state" -> spec.merge(st, p), "ledger" -> ids))
      }
      appliedIds += batchId
      true
    }
  }
}
