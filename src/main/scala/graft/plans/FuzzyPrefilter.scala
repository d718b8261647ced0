package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.JaroWinkler

/** Optimizer rule: derive a cheap length-ratio prefilter from a
  * Jaro-Winkler threshold predicate.
  *
  * For `jaro_winkler(a, b) >= t` with `t > 0.8`:
  *   - the Winkler boost only applies above jaro 0.7, and adds at
  *     most `0.4·(1 − jaro)`, so `jw >= t` forces
  *     `jaro >= (t − 0.4) / 0.6`;
  *   - matches are bounded by the shorter string
  *     (`m ≤ min(|a|,|b|)`), so `jaro ≤ (2 + min/max) / 3`;
  *   - combining: `min(|a|,|b|) / max(|a|,|b|) >= 5t − 4`.
  *
  * The derived guard is two `length()` calls and a compare — orders
  * of magnitude cheaper than the O(|a|·window) similarity kernel —
  * and Catalyst evaluates conjuncts left to right, so candidate
  * pairs that cannot possibly clear the threshold are discarded
  * before the kernel runs. On a blocked fuzzy join this is the
  * difference between hashing every candidate pair and only the
  * length-plausible ones. A `round(jw, s) >= t` comparison widens
  * the threshold by the round-half slack before deriving the bound,
  * so the rewrite stays exactly result-preserving.
  */
object JaroWinklerLengthPrune extends Rule[LogicalPlan] {

  private def split(e: Expression): Seq[Expression] = e match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  /** Extract (a, b, effective threshold) from a jw-threshold conjunct. */
  private def jwThreshold(e: Expression): Option[(Expression, Expression, Double)] =
    e match {
      case GreaterThanOrEqual(JaroWinkler(a, b), Literal(t: Double, DoubleType)) =>
        Some((a, b, t))
      case GreaterThan(JaroWinkler(a, b), Literal(t: Double, DoubleType)) =>
        Some((a, b, t))
      case GreaterThanOrEqual(Round(JaroWinkler(a, b), Literal(s: Int, _), _),
          Literal(t: Double, DoubleType)) =>
        Some((a, b, t - 0.5 * math.pow(10.0, -s)))
      case _ => None
    }

  private def guardFor(a: Expression, b: Expression, t: Double): Option[Expression] = {
    val ratio = 5.0 * t - 4.0
    if (ratio <= 0.0) None
    else Some(GreaterThanOrEqual(
      Cast(Least(Seq(Length(a), Length(b))), DoubleType),
      Multiply(Cast(Greatest(Seq(Length(a), Length(b))), DoubleType),
        Literal(ratio))))
  }

  /** `And(guard, cond)` when cond carries a jw threshold; None if
    * nothing to add. Adding an implied conjunct is equivalence-
    * preserving for any predicate position, including outer-join
    * conditions.
    */
  private def augment(cond: Expression): Option[Expression] = {
    val conjuncts = split(cond)
    val guards = conjuncts.flatMap(jwThreshold)
      .flatMap { case (a, b, t) => guardFor(a, b, t) }
      .filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (guards.isEmpty) None
    else Some(guards.foldLeft(cond)((c, g) => And(g, c)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      augment(cond).map(Filter(_, child)).getOrElse(f)
    // predicate pushdown may have folded the threshold into a join
    // condition before extra rules run — match it there too
    case j @ Join(_, _, _, Some(cond), _) =>
      augment(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}

object FuzzyPrefilter {
  /** Inject [[JaroWinklerLengthPrune]] into the session's optimizer
    * (idempotent) — for sessions not bootstrapped with
    * GraftExtensions.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraOptimizations.contains(JaroWinklerLengthPrune)) {
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ JaroWinklerLengthPrune
    }
  }
}
