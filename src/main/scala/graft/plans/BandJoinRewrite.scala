package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, DoubleType, LongType, TimestampType}

/** Optimizer rule: rewrite a pure *band* theta join
  *
  *   `A JOIN B ON b.x BETWEEN a.x - w AND a.x + w [AND residual...]`
  *
  * into a bucketed equi-join: bucket both sides at width `w`
  * (`floor(x / w)`), explode the left row into buckets {b-1, b, b+1},
  * join on the bucket, and keep the original predicate as the
  * residual filter. Any value within ±w of `a.x` falls in one of the
  * three neighbouring buckets, so the rewrite is semantics-preserving
  * for any w > 0.
  *
  * Covers numeric/decimal widths AND timestamp bands
  * (`b.ts BETWEEN a.ts - INTERVAL h AND a.ts + INTERVAL h`): a
  * day-time interval is a microsecond count, so the timestamp case is
  * the same floor-divide bucketing over `unix_micros(ts)` — strictly
  * monotone, hence the same endpoint-bucket completeness proof. The
  * analyzer rewrites `ts - INTERVAL w` to
  * `TimestampAddInterval(ts, -w)` (DatetimeSub's replacement, with
  * the negation constant-folded earlier in the same fixed-point
  * batch), so one pattern serves both BETWEEN directions.
  *
  * Why (SURVEY §4 "Custom Catalyst work" item 2, §7.4 trap 7): without
  * an equi conjunct Spark can only plan a band join as
  * BroadcastNestedLoopJoin or a cartesian product — O(n·m) and
  * undistributable when neither side fits in memory. With the bucket
  * key it becomes a shuffled hash/sort-merge join whose cost is
  * bounded by the band density. The rule only fires when the join has
  * NO other equi conjunct (if one exists, Spark already hash-joins).
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`).
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  /** (leftAnchor, rightProbe, width, lowerEndpoint, upperEndpoint) of a
    * symmetric band predicate. The endpoint EXPRESSIONS (`a - w`,
    * `a + w`) are returned as-is: bucketing the left side by
    * `floor(endpoint / w)` makes candidate generation provably
    * complete — every probe passing the residual satisfies
    * `lower <= p <= upper`, and cast/divide/floor are all monotone, so
    * its bucket lies in `[floor(lower/w), floor(upper/w)]`. A
    * hand-derived `bucket(a) ± 1` range is NOT safe at widths that are
    * not binary-representable (boundary pairs fall one bucket outside
    * it — caught by BandJoinRewriteSpec's exact-boundary test).
    */
  private def extractBand(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Double, Expression, Expression)] = {
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    def litVal(e: Expression): Option[Double] = e match {
      case Literal(v: Double, DoubleType) => Some(v)
      // SQL decimal literals (e.g. `0.5` parsed under ANSI decimals)
      // carry Spark's internal Decimal, not java BigDecimal
      case Literal(v: org.apache.spark.sql.types.Decimal, _: org.apache.spark.sql.types.DecimalType) =>
        Some(v.toDouble)
      case Literal(v: java.math.BigDecimal, _) => Some(v.doubleValue())
      case Cast(inner, _, _, _) => litVal(inner)
      case _ => None
    }
    // a day-time interval literal's value IS its microsecond count;
    // UnaryMinus survives until ConstantFolding's next fixed-point
    // pass, so match through it rather than waiting a batch iteration
    def ivMicros(e: Expression): Option[Long] = e match {
      case Literal(v: Long, _: DayTimeIntervalType) => Some(v)
      case UnaryMinus(inner, _) => ivMicros(inner).map(v => -v)
      case Cast(inner, _, _, _) => ivMicros(inner)
      case _ => None
    }
    // lower: probe >= anchor - w   /   upper: probe <= anchor + w
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p, sub @ Subtract(a, w, _)) if litVal(w).isDefined =>
        (p, a, litVal(w).get, sub: Expression)
      case LessThanOrEqual(sub @ Subtract(a, w, _), p) if litVal(w).isDefined =>
        (p, a, litVal(w).get, sub: Expression)
      case GreaterThanOrEqual(p, ta @ TimestampAddInterval(a, w, _))
          if ivMicros(w).exists(_ < 0) =>
        (p, a, -ivMicros(w).get.toDouble, ta: Expression)
      case LessThanOrEqual(ta @ TimestampAddInterval(a, w, _), p)
          if ivMicros(w).exists(_ < 0) =>
        (p, a, -ivMicros(w).get.toDouble, ta: Expression)
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(p, add @ Add(a, w, _)) if litVal(w).isDefined =>
        (p, a, litVal(w).get, add: Expression)
      case GreaterThanOrEqual(add @ Add(a, w, _), p) if litVal(w).isDefined =>
        (p, a, litVal(w).get, add: Expression)
      case LessThanOrEqual(p, ta @ TimestampAddInterval(a, w, _))
          if ivMicros(w).exists(_ > 0) =>
        (p, a, ivMicros(w).get.toDouble, ta: Expression)
      case GreaterThanOrEqual(ta @ TimestampAddInterval(a, w, _), p)
          if ivMicros(w).exists(_ > 0) =>
        (p, a, ivMicros(w).get.toDouble, ta: Expression)
    }
    (for {
      (p1, a1, w1, lo) <- lowers
      (p2, a2, w2, hi) <- uppers
      if p1.semanticEquals(p2) && a1.semanticEquals(a2) && w1 == w2 && w1 > 0
      if sideOf(a1).contains(true) && sideOf(p1).contains(false)
    } yield (a1, p1, w1, lo, hi)).headOption
  }

  private def hasEquiConjunct(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(l, r) =>
        (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
          (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet))
      case _ => false
    }

  /** Bucket id: floor(x / w). Timestamps bucket over unix_micros
    * (matching the interval width's microsecond unit) — exact in
    * double space for any epoch below 2^53 µs (~year 2255).
    */
  private def bucketOf(x: Expression, w: Double): Expression = {
    val numeric = x.dataType match {
      case TimestampType => Cast(UnixMicros(x), DoubleType)
      case _ => Cast(x, DoubleType)
    }
    Floor(Divide(numeric, Literal(w, DoubleType)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.getTagValue(rewritten).contains(true) =>
      val conjuncts = splitConjuncts(cond)
      if (hasEquiConjunct(conjuncts, left, right)) j
      else extractBand(conjuncts, left, right) match {
        case None => j
        case Some((_, probe, w, lowerE, upperE)) =>
          // left side: explode every bucket the band's own endpoints
          // span — complete by monotonicity (see extractBand doc),
          // normally 3 buckets
          // Sequence is TimeZoneAwareExpression: without an explicit
          // timeZoneId it reports unresolved and fails plan validation
          val bucketsArr = Sequence(
            bucketOf(lowerE, w), bucketOf(upperE, w),
            Some(Literal(1L, LongType)),
            Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
          val lBucket = AttributeReference("__band_bucket_l", LongType)()
          val leftGen = Generate(Explode(bucketsArr), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(lBucket),
            child = left)
          // right side: its own bucket
          val rBucketAlias = Alias(bucketOf(probe, w), "__band_bucket_r")()
          val rightProj = Project(right.output :+ rBucketAlias, right)
          val newCond = And(EqualTo(lBucket, rBucketAlias.toAttribute), cond)
          val newJoin = Join(leftGen, rightProj, Inner, Some(newCond), hint)
          newJoin.setTagValue(rewritten, true)
          Project(j.output, newJoin)
      }
  }

  private val rewritten =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.bandJoinRewritten")

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
