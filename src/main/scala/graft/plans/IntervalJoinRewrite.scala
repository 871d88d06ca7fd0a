package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Catalyst optimizer rule: rewrite a point-in-interval INEQUALITY join
  * (`i.start <= p.ts AND p.ts < i.end`) into the bucketized equi-join of
  * [[graft.ts.IntervalJoin]] — automatically, for any user who writes the
  * natural `points.join(intervals, pointInRange)` form.
  *
  * Why a Rule and not just the library function: Spark plans the raw
  * inequality join as BroadcastNestedLoopJoin (O(points × intervals) —
  * reference semantics can't be composed out of built-ins here without
  * the user knowing the bucket trick). This is the brief's case (c):
  * whole-operator semantics the planner needs help with, registered via
  * `SparkSessionExtensions` ([[GraftExtensions]]) or installed on a live
  * session with [[GraftExtensions.install]].
  *
  * Rewrite (guarded by `spark.graft.intervalJoin.bucketSeconds` > 0),
  * shown for the half-open spelling — ALL four bound combinations fire
  * (`s <= ts`/`s < ts` crossed with `ts < e`/`ts <= e`, each in either
  * operand order), so the whole range-join family a user can write lands
  * on the same bucketized plan:
  *
  *   Join(P, I, Inner, s <= ts && ts < e && rest)
  *   ==>
  *   Project(P.out ++ I.out,
  *     Join(Project(P.out :+ __b = µs(ts) div B),
  *          Generate(explode(sequence(µs(s) div B, (µs(e)-1) div B)),
  *                   Filter(s < e, I)),
  *          Inner, __b = __rb && s <= ts && ts < e && rest))
  *
  * Out of scope, deliberately: OPEN-ended intervals (`e IS NULL OR ts <
  * e`, the SCD2 current row in `rel_pit_join`'s raw shape) have no finite
  * bucket range to enumerate — that family is an as-of lookup, served by
  * [[graft.ts.AsOf]]/[[graft.ts.IntervalJoin]] directly. A PIT workload
  * whose open rows are closed out first (or guarded `e IS NOT NULL`)
  * presents this rule with its closed residue, which does fire
  * (spec-pinned).
  *
  * A point carries ONE bucket, so each (point, interval) pair meets in
  * exactly one partition — no dedup pass; the original predicates stay in
  * the join condition, so results are identical row-for-row. Intervals
  * wider than ~bucket explode into width/B + 1 rows (pick B near the
  * typical width). Equality conjuncts in `rest` ride along and tighten
  * the shuffle key further via the planner's normal extraction.
  */
case class IntervalJoinRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def bucketMicros: Option[Long] =
    session.conf
      .getOption(IntervalJoinRewrite.BucketConf)
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .filter(_ > 0)
      .map(_ * 1000000L)

  override def apply(plan: LogicalPlan): LogicalPlan = bucketMicros match {
    case None => plan
    case Some(b) =>
      plan.transformUp {
        case j @ Join(l, r, Inner, Some(cond), hint) =>
          rewrite(l, r, cond, hint, b).getOrElse(j)
      }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  /** Every reading of one comparison as an interval bound on some
    * expression: `(x, bound, isLower, strict)`. A single `a <= b` is BOTH
    * a lower bound on `b` and an upper bound on `a`; the candidate pairing
    * below disambiguates by requiring the two chosen readings to bound the
    * SAME timestamp expression from opposite sides.
    */
  private def boundReadings(
      e: Expression): Seq[(Expression, Expression, Boolean, Boolean)] =
    e match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true, false), (b, a, false, false))
      case LessThanOrEqual(a, b) => Seq((a, b, false, false), (b, a, true, false))
      case GreaterThan(a, b) => Seq((a, b, true, true), (b, a, false, true))
      case LessThan(a, b) => Seq((a, b, false, true), (b, a, true, true))
      case _ => Seq.empty
    }

  private def rewrite(
      l: LogicalPlan,
      r: LogicalPlan,
      cond: Expression,
      hint: JoinHint,
      b: Long
  ): Option[LogicalPlan] = {
    // idempotence: the rewritten join still carries the range conjuncts
    // (they filter inside the bucket), and optimizer batches run to fixed
    // point — without this guard the rule re-fires on its own output every
    // iteration, nesting explodes until OOM
    if (l.output.exists(_.name == "__graft_pb") ||
        r.output.exists(_.name == "__graft_ib") ||
        l.output.exists(_.name == "__graft_ib") ||
        r.output.exists(_.name == "__graft_pb")) return None
    val cs = conjuncts(cond)
    val candidates = for {
      (c1, i) <- cs.zipWithIndex
      (x1, lo, isLo, loStrict) <- boundReadings(c1) if isLo
      (c2, j) <- cs.zipWithIndex if i != j
      (x2, hi, isLo2, hiStrict) <- boundReadings(c2) if !isLo2
      if x1.semanticEquals(x2)
      if x1.dataType == TimestampType && lo.dataType == TimestampType &&
        hi.dataType == TimestampType
    } yield (x1, lo, hi, loStrict, hiStrict, i, j)

    candidates.collectFirst(Function.unlift {
      case (ts, lo, hi, loStrict, hiStrict, i, j) =>
        val rest = cs.indices.filter(k => k != i && k != j).map(cs)
        val tsRefs = ts.references
        val ivRefs = lo.references ++ hi.references
        // orientation: ts from one side, both bounds from the other
        val oriented =
          if (tsRefs.subsetOf(l.outputSet) && ivRefs.subsetOf(r.outputSet))
            Some((l, r, false))
          else if (tsRefs.subsetOf(r.outputSet) && ivRefs.subsetOf(l.outputSet))
            Some((r, l, true))
          else None
        oriented.map { case (points, intervals, swapped) =>
          val tz = Some(SQLConf.get.sessionLocalTimeZone)
          def micros(e: Expression) = UnixMicros(e)
          val bLit = Literal(b)
          val pB = Alias(IntegralDivide(micros(ts), bLit), "__graft_pb")()
          val pPlan = Project(points.output :+ pB, points)
          // bucket range covers every µs a matching ts can occupy:
          //   start = µs(lo) div B for BOTH lower variants (a strict lo
          //     admits ts >= lo+1µs, which can only land in the same or a
          //     later bucket — at worst one already-enumerated extra);
          //   end   = µs(hi) div B inclusive, (µs(hi)-1) div B exclusive.
          // The non-empty guard matches the upper strictness, so start <=
          // end always holds and Sequence never runs descending.
          val hiEnd =
            if (hiStrict) Subtract(micros(hi), Literal(1L)) else micros(hi)
          val seq = Sequence(
            IntegralDivide(micros(lo), bLit),
            IntegralDivide(hiEnd, bLit),
            None, tz)
          val nonEmpty: Expression =
            if (hiStrict) LessThan(lo, hi) else LessThanOrEqual(lo, hi)
          val gOut = AttributeReference("__graft_ib", LongType, nullable = true)()
          val iPlan = Generate(
            Explode(seq), unrequiredChildIndex = Nil, outer = false,
            qualifier = None, generatorOutput = Seq(gOut),
            child = Filter(nonEmpty, intervals))
          val lowerPred: Expression =
            if (loStrict) GreaterThan(ts, lo) else GreaterThanOrEqual(ts, lo)
          val upperPred: Expression =
            if (hiStrict) LessThan(ts, hi) else LessThanOrEqual(ts, hi)
          val fullCond = (EqualTo(pB.toAttribute, gOut) +:
            (Seq(lowerPred, upperPred) ++ rest))
            .reduce[Expression](And)
          val joined = Join(pPlan, iPlan, Inner, Some(fullCond), hint)
          // original output order (left then right of the ORIGINAL join)
          val out = if (swapped) intervals.output ++ points.output
                    else points.output ++ intervals.output
          Project(out, joined)
        }
    })
  }
}

/** `SparkSessionExtensions` entry point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(session => IntervalJoinRewrite(session))
}

object IntervalJoinRewrite {
  /** Bucket width in seconds; unset or <= 0 disables the rewrite. */
  val BucketConf = "spark.graft.intervalJoin.bucketSeconds"
}

object GraftExtensions {
  /** Install on an already-built session (extension configs are fixed at
    * build time; `experimental.extraOptimizations` is the supported
    * post-hoc seam). Idempotent. The rule stays inert until
    * `spark.graft.intervalJoin.bucketSeconds` is set.
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[IntervalJoinRewrite]))
      spark.experimental.extraOptimizations = cur :+ IntervalJoinRewrite(spark)
  }
}