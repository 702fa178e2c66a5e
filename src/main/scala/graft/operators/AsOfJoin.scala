package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for every left row, attach the most recent right row
  * with the same key and `rightTime <= leftTime` (within an optional
  * tolerance).
  *
  * Implemented as the union + last-non-null-window trick rather than a
  * range join: tag both sides, union by (key, time), and carry the
  * last seen right row forward as ONE struct(rightTime, payload...)
  * with a single `last(_, ignoreNulls)` over an ordered frame — so all
  * payload columns and the freshness timestamp always come from the
  * same matched right row (a right row whose payload column is null
  * yields null for that column, never an older row's value). One
  * shuffle on the key (the same shuffle a sort-merge join would need),
  * no quadratic candidate stage, no per-key driver loop — the shape
  * that survives 100 TB, where a nested-loop or exploded-range join
  * would not.
  *
  * Determinism: the frame is ordered by (time, tag, tiebreak) so
  * same-timestamp collisions resolve identically everywhere: a right
  * row at exactly leftTime IS visible to that left row (<=), and among
  * equal right timestamps the largest tiebreak value wins.
  */
object AsOfJoin {

  /** @param left       rows to enrich
    * @param right      rows providing the as-of payload
    * @param key        equi key column name (present in both)
    * @param leftTime   event-time column in `left`
    * @param rightTime  event-time column in `right`
    * @param payload    right columns to carry (renamed as-is onto the output)
    * @param tiebreak   right column ordering same-timestamp rights
    *                   (backward: larger wins; forward: smaller wins)
    * @param toleranceMs max time gap between the left row and the
    *                    matched right row; a farther match yields
    *                    nulls (0 = unbounded)
    * @param direction  "backward" (default): latest right at-or-before
    *                   leftTime; "forward": earliest right at-or-after;
    *                   "nearest": whichever of the two is closer in
    *                   time (tie → the backward match)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String],
      tiebreak: String,
      toleranceMs: Long = 0L,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward, forward or nearest, got $direction")
    val fwd = direction == "forward"
    val lCols = left.columns.toSeq

    // The whole right row rides in one struct so `last(ignoreNulls)`
    // is all-or-nothing: either the packet of the matched right row
    // (null payload fields included) or null — per-column carries
    // could otherwise mix fields from different right rows.
    val packet = struct(
      (col(rightTime).as("__rt") +: payload.map(c => col(c).as(c))): _*)
    val packetType = right.select(packet).schema.head.dataType

    val l = left.select(
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__is_left"),
        lit(null).cast("long").as("__rtb"),
        lit(null).cast(packetType).as("__pkt")) ++
        lCols.filter(_ != key).map(c => col(c).as(s"__l_$c")): _*)

    val r = right.select(
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__is_left"),
        col(tiebreak).cast("long").as("__rtb"),
        packet.as("__pkt")) ++
        lCols.filter(_ != key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    // Backward: rights sort BEFORE lefts at equal time (__is_left
    // 0 < 1) and the frame looks back — an exactly-simultaneous right
    // is visible, and among equal-time rights the largest tiebreak is
    // last, hence the one carried by last(). Forward mirrors it:
    // rights sort AFTER lefts (ascending on 1 - __is_left), the frame
    // looks ahead, and first() picks the earliest right (smallest
    // tiebreak at equal times).
    val wBack = Window.partitionBy(key)
      .orderBy(col("__t"), col("__is_left"), col("__rtb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(key)
      .orderBy(col("__t"), lit(1) - col("__is_left"), col("__rtb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pktBack = last(col("__pkt"), ignoreNulls = true).over(wBack)
    val pktFwd = first(col("__pkt"), ignoreNulls = true).over(wFwd)

    // micro precision: a millis comparison would mis-pick the nearest
    // side when the two gaps differ only below the millisecond
    def backGap(p: Column) = unix_micros(col("__t")) - unix_micros(p.getField("__rt"))
    def fwdGap(p: Column) = unix_micros(p.getField("__rt")) - unix_micros(col("__t"))
    def inTol(g: Column) = if (toleranceMs > 0) g <= toleranceMs * 1000L else lit(true)

    // "nearest" evaluates both one-sided carries over the SAME key
    // partitioning — two window sorts, still exactly one shuffle —
    // and keeps the closer in-tolerance match (tie → backward).
    val carried = direction match {
      case "backward" => l.unionByName(r).withColumn("__pkt", pktBack)
      case "forward"  => l.unionByName(r).withColumn("__pkt", pktFwd)
      case _ =>
        val validB = col("__pb").isNotNull && inTol(backGap(col("__pb")))
        val validF = col("__pf").isNotNull && inTol(fwdGap(col("__pf")))
        l.unionByName(r)
          .withColumn("__pb", pktBack)
          .withColumn("__pf", pktFwd)
          .withColumn("__pkt",
            when(validB && validF,
              when(backGap(col("__pb")) <= fwdGap(col("__pf")), col("__pb"))
                .otherwise(col("__pf")))
              .when(validB, col("__pb"))
              .when(validF, col("__pf")))
          .drop("__pb", "__pf")
    }

    // Freshness is judged on the matched row's own timestamp — the
    // same row every payload value comes from. (For "nearest" the
    // tolerance was already applied when choosing the side.)
    val fresh = direction match {
      case "nearest" => col("__pkt").isNotNull
      case _ =>
        val gapMs =
          if (fwd) fwdGap(col("__pkt")) else backGap(col("__pkt"))
        col("__pkt").isNotNull && inTol(gapMs)
    }

    carried.filter(col("__is_left") === 1)
      .select(
        Seq(col(key), col("__t").as(leftTime)) ++
          lCols.filter(_ != key).filter(_ != leftTime).map(c => col(s"__l_$c").as(c)) ++
          payload.map(c => when(fresh, col("__pkt").getField(c)).as(s"asof_$c")): _*)
  }
}
