package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite interval-overlap theta joins into binned
  * equi-joins.
  *
  * An inner join whose condition is only `a.start < b.end AND a.end >
  * b.start` (no cross-side equality) can reach the physical planner
  * solely as a BroadcastNestedLoop/Cartesian join — O(|L|·|R|), the
  * one scale hazard SURVEY §4.2 flags. This rule inserts a time-bin
  * `Generate` (explode of the bin range) on both sides and joins on
  * bin equality, so `ExtractEquiJoinKeys` later finds a hash/sort-merge
  * key; a dedup predicate keeps exactly the bin holding the later
  * interval start, making the rewrite pair-exact (same algorithm as
  * [[graft.operators.RangeJoin]], proven in RangeJoinSpec — this rule
  * applies it automatically to any matching logical join).
  *
  * Inner-join-safe with null timestamps: a null endpoint makes the
  * original predicate non-true (row never matches), and here makes
  * the bin array null so `Generate` emits nothing — same result.
  *
  * Activate per session via `spark.experimental.extraOptimizations
  * +:= RangeJoinRewrite` or cluster-wide with
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Bin width:
  * `spark.graft.rangeJoin.binMinutes` (default 360).
  *
  * Fan-out bound: each row may explode into at most
  * `spark.graft.rangeJoin.maxBins` (default 2048) bins, so one
  * corrupt or open-ended interval (an end_time years after start)
  * cannot generate millions of rows. An optimizer rule must never
  * silently change results, so by default an interval that EXCEEDS
  * the bound fails the query with a clear runtime error naming the
  * confs (`spark.graft.rangeJoin.onClamp=error`); within the bound
  * the rewrite is pair-exact. Users who prefer the old
  * drop-the-far-match clamp set `onClamp=silent` (the original
  * overlap predicate is still kept, so false POSITIVES are impossible
  * either way — a truncated interval can only lose pairs whose other
  * interval starts beyond the clamp horizon, ≈512 days at defaults);
  * `maxBins=0` removes the bound entirely.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val binMinutesKey = "spark.graft.rangeJoin.binMinutes"
  val maxBinsKey = "spark.graft.rangeJoin.maxBins"
  val enabledKey = "spark.graft.rangeJoin.enabled"
  val onClampKey = "spark.graft.rangeJoin.onClamp"

  /** (aStart, aEnd, bStart, bEnd): a.start < b.end && a.end > b.start
    * with `a` side referencing only `left` and `b` only `right`.
    */
  private def findOverlap(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Expression)] = {
    def leftOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet) &&
        e.dataType == TimestampType && e.deterministic
    def rightOnly(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet) &&
        e.dataType == TimestampType && e.deterministic

    // normalize every strict comparison to (leftSideExpr op rightSideExpr)
    val lt = conjuncts.collect {                      // aStart < bEnd
      case LessThan(l, r) if leftOnly(l) && rightOnly(r) => (l, r)
      case GreaterThan(l, r) if leftOnly(r) && rightOnly(l) => (r, l)
    }
    val gt = conjuncts.collect {                      // aEnd > bStart
      case GreaterThan(l, r) if leftOnly(l) && rightOnly(r) => (l, r)
      case LessThan(l, r) if leftOnly(r) && rightOnly(l) => (r, l)
    }
    for ((aStart, bEnd) <- lt.headOption; (aEnd, bStart) <- gt.headOption)
      yield (aStart, aEnd, bStart, bEnd)
  }

  private def hasCrossSideEquality(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
          (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(enabledKey, "true") != "true") return plan
    val binMicros =
      conf.getConfString(binMinutesKey, "360").toLong * 60000000L
    val maxBins = conf.getConfString(maxBinsKey, "2048").toLong
    val onClamp = conf.getConfString(onClampKey, "error")
    if (maxBins > 0 && onClamp == "silent")
      logWarning(s"$onClampKey=silent: overlap-join pairs whose intervals span " +
        s"more than $maxBins bins may be silently dropped (set $onClampKey=error " +
        s"to fail instead, or $maxBinsKey=0 to unbound the explode)")

    plan.transform {
      case j @ Join(left, right, Inner | Cross, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        if (hasCrossSideEquality(conjuncts, left, right)) j
        else findOverlap(conjuncts, left, right) match {
          case None => j
          case Some((aStart, aEnd, bStart, bEnd)) =>
            def binOf(e: Expression) =
              new IntegralDivide(UnixMicros(e), Literal(binMicros))
            def binned(child: LogicalPlan, s: Expression, e: Expression) = {
              val attr = AttributeReference("__graft_bin", LongType)()
              // Bound the explode to maxBins bins per row so corrupt
              // intervals stay bounded (doc above). onClamp=error
              // (default) fails loudly when the bound would actually
              // truncate — an optimizer rule must not silently drop
              // matches; onClamp=silent keeps the old clamp; maxBins=0
              // means unbounded. Sequence is TimeZoneAwareExpression;
              // the analyzer that normally fills timeZoneId has
              // already run, so set it.
              val rawEnd = binOf(e)
              val limit = Add(binOf(s), Literal(maxBins))
              val endBin =
                if (maxBins <= 0) rawEnd
                else if (onClamp == "silent") Least(Seq(rawEnd, limit))
                else If(GreaterThan(rawEnd, limit),
                  Cast(new RaiseError(Literal(
                    s"graft range-join rewrite: interval spans more than $maxBins " +
                      s"bins of ${binMicros / 60000000L} minutes; raise $maxBinsKey " +
                      s"or $binMinutesKey, set $onClampKey=silent to drop such " +
                      s"matches, or $maxBinsKey=0 to unbound the explode")),
                    LongType),
                  rawEnd)
              val gen = Explode(Sequence(binOf(s), endBin, None,
                Some(conf.sessionLocalTimeZone)))
              (Generate(gen, Nil, outer = false, None, Seq(attr), child), attr)
            }
            val (lGen, lBin) = binned(left, aStart, aEnd)
            val (rGen, rBin) = binned(right, bStart, bEnd)
            val dedup = EqualTo(lBin,
              new IntegralDivide(
                Greatest(Seq(UnixMicros(aStart), UnixMicros(bStart))),
                Literal(binMicros)))
            val newCond = (EqualTo(lBin, rBin) +: conjuncts :+ dedup).reduce(And)
            Project(j.output.toSeq, Join(lGen, rGen, Inner, Some(newCond), hint))
        }
    }
  }
}

/** `spark.sql.extensions` entry point registering the overlap-join
  * rewrite rule and the per-key top-k planner strategy.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinRewrite)
    ext.injectOptimizerRule(_ => MatViewRewrite)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}
