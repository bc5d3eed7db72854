package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Restores parquet filter pushdown through integer quantization.
  *
  * [[graft.tables.Tables.events]] publishes `ts_ns = (raw div 1000) * 1000`
  * (µs-quantized nanoseconds — the oracle's timestamp precision). When a
  * query filters on `ts_ns`, predicate pushdown substitutes the alias and
  * leaves `((raw div 1000) * 1000) >= C` sitting on the scan — a shape the
  * parquet source can't translate, so at 100 TB a one-hour time-range query
  * would read every row group. This rule rewrites such comparisons into
  * equivalent RANGE predicates on the RAW column, which the source pushes
  * down (PlanSpec pins `PushedFilters: [... GreaterThanOrEqual(ts ...)]`).
  *
  * Semantics. Let q > 0 and T(x) = (x div q) * q, where `div` is Spark's
  * IntegralDivide (truncation toward zero — Java `/`). T is monotone
  * non-decreasing with step q, so every comparison of T(x) against a
  * literal c is a half-line in x whose boundary is computable exactly:
  * with k = ceil(c / q) (mathematical ceiling),
  *
  *   T(x) >= c  ⟺  x >= lo(k)  where lo(k) = k·q        if k >= 1
  *                                          (k−1)·q + 1  if k <= 0
  *
  * (for k <= 0 the truncation rounds TOWARD the boundary: e.g. q = 1000,
  * c = 0 → x = −999 already has T(x) = 0). The other comparisons reduce to
  * the same boundary: T(x) > c ⟺ T(x) >= c+1; T(x) < c ⟺ ¬(T(x) >= c);
  * T(x) <= c ⟺ ¬(T(x) >= c+1). Equality T(x) = c with q | c becomes the
  * pushable band x >= lo ∧ x < hi; with q ∤ c it is never true, but the
  * rewrite is SKIPPED there rather than folded to false — `null = c` must
  * stay null outside a Filter. Null propagation is otherwise preserved:
  * every rewritten form evaluates null exactly when x is null.
  *
  * All boundary arithmetic uses Math.*Exact; any overflow (literals near
  * Long.MaxValue) skips the rewrite — correct, just not pushed.
  *
  * A companion identity collapses the double-quantization the `ts` column
  * derivation creates: ((x div q) * q) div q ≡ x div q (exact for all x:
  * T(x) / q is already an integer).
  *
  * Installed by [[graft.tables.Tables]] on any session that loads the
  * events table (`spark.experimental.extraOptimizations` — runs as the
  * final optimizer batch, before physical planning translates filters);
  * a production deployment injects it once via
  * `spark.sql.extensions=graft.functions.GraftExtensions` instead.
  */
object QuantizationPushdown extends Rule[LogicalPlan] {

  /** Matches (x div q) * q with the same positive literal q both times.
    * Only LongType x: the replacement literal is LongType, and a mixed-type
    * comparison built mid-optimization would be unresolved. (IntegralDivide
    * returns LongType, so its operands are already long-typed here.)
    */
  private object Quantized {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case Multiply(d: IntegralDivide, IntLit(q2), _) =>
        d.right match {
          case IntLit(q) if q == q2 && q > 0 && d.left.dataType == LongType =>
            Some((d.left, q))
          case _ => None
        }
      case Multiply(IntLit(q2), d: IntegralDivide, _) =>
        d.right match {
          case IntLit(q) if q == q2 && q > 0 && d.left.dataType == LongType =>
            Some((d.left, q))
          case _ => None
        }
      case _ => None
    }
  }

  private object IntLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
  }

  /** Matches unix_micros(t) * 1000 (either operand order) with t a
    * TimestampType expression — the ts_ns derivation over µs-instant
    * events data ([[graft.tables.Tables.withTsNs]]). Comparisons of this
    * against a ns literal reduce EXACTLY to timestamp comparisons on t
    * (m ↦ m·1000 is strictly increasing and unix_micros is the instant's
    * micros, timezone-free), which the parquet source pushes natively.
    */
  private object ScaledMicros {
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(u: UnixMicros, IntLit(1000L), _)
          if u.child.dataType == TimestampType => Some(u.child)
      case Multiply(IntLit(1000L), u: UnixMicros, _)
          if u.child.dataType == TimestampType => Some(u.child)
      case _ => None
    }
  }

  /** Least micros m with m*1000 >= c, as a TimestampType literal; None on
    * overflow.
    */
  private def microsCeil(c: Long): Option[Literal] =
    try Some(Literal(Math.floorDiv(Math.addExact(c, 999L), 1000L), TimestampType))
    catch { case _: ArithmeticException => None }

  private def geqTs(t: Expression, c: Long): Option[Expression] =
    microsCeil(c).map(GreaterThanOrEqual(t, _))

  private def ltTs(t: Expression, c: Long): Option[Expression] =
    microsCeil(c).map(LessThan(t, _))

  /** Least x with (x div q) * q >= c, or None on overflow. */
  private def lowerBound(c: Long, q: Long): Option[Long] =
    try {
      val k = Math.floorDiv(Math.addExact(c, q - 1), q) // ceil(c / q)
      Some(if (k >= 1) Math.multiplyExact(k, q)
      else Math.addExact(Math.multiplyExact(k - 1, q), 1))
    } catch { case _: ArithmeticException => None }

  private def geq(x: Expression, c: Long, q: Long): Option[Expression] =
    lowerBound(c, q).map(lo => GreaterThanOrEqual(x, Literal(lo, LongType)))

  private def lt(x: Expression, c: Long, q: Long): Option[Expression] =
    lowerBound(c, q).map(lo => LessThan(x, Literal(lo, LongType)))

  private def rewrite(e: Expression): Expression = e match {
    case GreaterThanOrEqual(Quantized(x, q), IntLit(c)) =>
      geq(x, c, q).getOrElse(e)
    case GreaterThan(Quantized(x, q), IntLit(c)) if c < Long.MaxValue =>
      geq(x, c + 1, q).getOrElse(e)
    case LessThan(Quantized(x, q), IntLit(c)) =>
      lt(x, c, q).getOrElse(e)
    case LessThanOrEqual(Quantized(x, q), IntLit(c)) if c < Long.MaxValue =>
      lt(x, c + 1, q).getOrElse(e)
    // mirrored literal-first forms
    case GreaterThanOrEqual(IntLit(c), Quantized(x, q)) if c < Long.MaxValue =>
      lt(x, c + 1, q).getOrElse(e)
    case GreaterThan(IntLit(c), Quantized(x, q)) =>
      lt(x, c, q).getOrElse(e)
    case LessThan(IntLit(c), Quantized(x, q)) if c < Long.MaxValue =>
      geq(x, c + 1, q).getOrElse(e)
    case LessThanOrEqual(IntLit(c), Quantized(x, q)) =>
      geq(x, c, q).getOrElse(e)
    case EqualTo(Quantized(x, q), IntLit(c))
        if c % q == 0 && c < Long.MaxValue =>
      (geq(x, c, q), lt(x, c + 1, q)) match {
        case (Some(g), Some(l)) => And(g, l)
        case _ => e
      }
    case EqualTo(IntLit(c), Quantized(x, q))
        if c % q == 0 && c < Long.MaxValue =>
      (geq(x, c, q), lt(x, c + 1, q)) match {
        case (Some(g), Some(l)) => And(g, l)
        case _ => e
      }
    // --- µs-instant generation: ts_ns = unix_micros(t) * 1000 ---
    case GreaterThanOrEqual(ScaledMicros(t), IntLit(c)) =>
      geqTs(t, c).getOrElse(e)
    case GreaterThan(ScaledMicros(t), IntLit(c)) if c < Long.MaxValue =>
      geqTs(t, c + 1).getOrElse(e)
    case LessThan(ScaledMicros(t), IntLit(c)) =>
      ltTs(t, c).getOrElse(e)
    case LessThanOrEqual(ScaledMicros(t), IntLit(c)) if c < Long.MaxValue =>
      ltTs(t, c + 1).getOrElse(e)
    // mirrored literal-first forms
    case GreaterThanOrEqual(IntLit(c), ScaledMicros(t)) if c < Long.MaxValue =>
      ltTs(t, c + 1).getOrElse(e)
    case GreaterThan(IntLit(c), ScaledMicros(t)) =>
      ltTs(t, c).getOrElse(e)
    case LessThan(IntLit(c), ScaledMicros(t)) if c < Long.MaxValue =>
      geqTs(t, c + 1).getOrElse(e)
    case LessThanOrEqual(IntLit(c), ScaledMicros(t)) =>
      geqTs(t, c).getOrElse(e)
    // equality: m*1000 = c has exactly one solution when 1000 | c (the
    // scaling is injective), none otherwise (skipped — `null = c` must
    // stay null outside a Filter)
    case EqualTo(ScaledMicros(t), IntLit(c)) if c % 1000 == 0 =>
      EqualTo(t, Literal(c / 1000, TimestampType))
    case EqualTo(IntLit(c), ScaledMicros(t)) if c % 1000 == 0 =>
      EqualTo(t, Literal(c / 1000, TimestampType))
    // ((x div q) * q) div q == x div q — collapses the ts derivation chain;
    // (unix_micros(t) * 1000) div 1000 == unix_micros(t) — same collapse
    // for the µs-instant generation (epoch-µs views of ts_ns)
    case d: IntegralDivide =>
      (d.left, d.right) match {
        case (Quantized(x, q), IntLit(q2)) if q == q2 =>
          d.withNewChildren(Seq(x, d.right))
        case (ScaledMicros(t), IntLit(1000L)) =>
          UnixMicros(t)
        case _ => d
      }
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e => rewrite(e) }
}
