package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure non-equi INTERVAL join —
  * `fact.v > dim.lo AND fact.v < dim.hi` (either side strict or
  * inclusive) with NO equi conjunct — into the bucketed equi form the
  * library's `operators.RangeJoin` applies by hand (SURVEY §2.4 J6):
  * the range side explodes into `floor(lo/w)..floor(hi/w)` bucket
  * rows, the value side computes `floor(v/w)`, and the join gains the
  * derived bucket EQUALITY (implied by the predicate — floor is
  * monotone, so every original match lands in exactly one of the
  * exploded buckets; no match is added or lost). Catalyst's
  * ExtractEquiJoinKeys then plans a hash join where the raw shape
  * could only ever be a BroadcastNestedLoopJoin — or, past the
  * broadcast threshold, the 100 TB scale-killer CartesianProduct.
  *
  * This is the (c) rung of the custom-operator ladder (custom
  * `Rule[LogicalPlan]` via `SparkSessionExtensions`,
  * [[graft.GraftExtensions]]): the same rewrite `RangeJoin
  * .intervalJoin` offers as a library call, delivered transparently
  * to PLAIN SQL / DataFrame non-equi joins written without knowledge
  * of the library.
  *
  * Deliberately OPT-IN: fires only when
  * `spark.graft.rangejoin.bucketWidth` is set to a positive number
  * (the width must be chosen near the typical interval width — a
  * physical tuning decision the engine cannot guess). Idempotent by
  * construction: the rewritten join carries an equi conjunct, which
  * disqualifies it from matching again.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val widthKey = "spark.graft.rangejoin.bucketWidth"

  private case class Bounds(
      v: Expression, lo: Expression, hi: Expression,
      vOnLeft: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(widthKey, "")
    val width =
      try raw.trim.toDouble
      catch { case _: NumberFormatException => return plan }
    if (!(width > 0) || width.isInfinite) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _)
          if findBounds(j, cond).isDefined && j.resolved =>
        rewrite(j, cond, findBounds(j, cond).get, width)
    }
  }

  /** Accept only the pure-interval shape: one lower and one upper
    * bound on the SAME value expression from one side against
    * bounds from the other, and no equi conjunct anywhere (an equi
    * key already makes the join hashable — and its absence is what
    * makes this rule idempotent).
    */
  private def findBounds(j: Join, cond: Expression): Option[Bounds] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case other => Seq(other)
    }
    val conjuncts = split(cond)
    def sideOf(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(j.left.outputSet)) Some(true)
      else if (refs.subsetOf(j.right.outputSet)) Some(false)
      else None
    }
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case EqualNullSafe(a, b) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(x), Some(y)) => x != y
          case _ => false
        }
      case _ => false
    }
    if (hasEqui) return None
    // normalize every comparison conjunct to (v strictly-or-equal
    // greater than bound) / (v less than bound) with v's side known
    def numeric(e: Expression) = e.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case _ => false
    }
    val lowers = conjuncts.collect {
      case GreaterThan(a, b) => (a, b)
      case GreaterThanOrEqual(a, b) => (a, b)
      case LessThan(b, a) => (a, b)
      case LessThanOrEqual(b, a) => (a, b)
    }.flatMap { case (v, lo) =>
      (sideOf(v), sideOf(lo)) match {
        case (Some(vs), Some(ls)) if vs != ls && numeric(v) && numeric(lo) =>
          Some((v, lo, vs))
        case _ => None
      }
    }
    val uppers = conjuncts.collect {
      case LessThan(a, b) => (a, b)
      case LessThanOrEqual(a, b) => (a, b)
      case GreaterThan(b, a) => (a, b)
      case GreaterThanOrEqual(b, a) => (a, b)
    }.flatMap { case (v, hi) =>
      (sideOf(v), sideOf(hi)) match {
        case (Some(vs), Some(hs)) if vs != hs && numeric(v) && numeric(hi) =>
          Some((v, hi, vs))
        case _ => None
      }
    }
    (for {
      (v1, lo, s1) <- lowers
      (v2, hi, s2) <- uppers
      if v1.semanticEquals(v2) && s1 == s2
    } yield Bounds(v1, lo, hi, s1)).headOption
  }

  private def bucketOf(e: Expression, width: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(width)))

  private def rewrite(
      j: Join, cond: Expression, b: Bounds, width: Double): LogicalPlan = {
    val (valueSide, rangeSide) =
      if (b.vOnLeft) (j.left, j.right) else (j.right, j.left)
    val vBucket = Alias(bucketOf(b.v, width), "__graft_bucket_v")()
    val newValueSide = Project(valueSide.output :+ vBucket, valueSide)
    // Sequence is TimeZoneAware — without an explicit zone the new
    // node is unresolved and the optimizer rejects the rewrite
    val seq = new Sequence(
      bucketOf(b.lo, width), bucketOf(b.hi, width), Literal(1L))
      .withTimeZone(conf.sessionLocalTimeZone)
    val rBucket = AttributeReference(
      "__graft_bucket_r", LongType, nullable = false)()
    val newRangeSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None,
      generatorOutput = Seq(rBucket), child = rangeSide)
    val (newLeft, newRight) =
      if (b.vOnLeft) (newValueSide, newRangeSide)
      else (newRangeSide, newValueSide)
    val newCond = And(EqualTo(vBucket.toAttribute, rBucket), cond)
    Project(j.output,
      Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
