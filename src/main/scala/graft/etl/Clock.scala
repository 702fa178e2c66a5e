package graft.etl

import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Injectable clock: the reference calls wall-clock in five places
  * (imputed end_time `cleaners.py:104`, created/updated_at
  * `cleaners.py:251-252`, the "today" / "-30 days" / "-7 days"
  * filters `pipeline.py:313-316`, `aggregators.py:29,245,322`).
  * Routing them through a fixed clock keeps golden tests
  * deterministic (SURVEY §7.4.1).
  */
final case class Clock(now: Instant) {
  /** The current instant as a literal timestamp column (UTC). */
  def ts: Column = lit(java.sql.Timestamp.from(now))

  /** The current UTC date as a literal date column. */
  def date: Column =
    lit(java.sql.Date.valueOf(now.atZone(ZoneOffset.UTC).toLocalDate))
}

object Clock {
  def system: Clock = Clock(Instant.now())

  /** Clock pinned to the reference's golden capture
    * (`data/processed/cleaned_20260214_111810.csv`).
    */
  def golden: Clock = Clock(Instant.parse("2026-02-14T11:18:10.996856Z"))
}
