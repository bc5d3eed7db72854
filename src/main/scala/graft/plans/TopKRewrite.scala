package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: the window-formulated per-key top-k —
  *
  *   Project(cols, Filter(row_number() OVER (PARTITION BY p ORDER BY o)
  *                          <= k, Window(...)))
  *
  * — rewritten to the native [[TopKPerKeyPlan]] whenever the rank column
  * itself is NOT published. Users (and ported SQL) write the row_number
  * idiom; this rule makes Catalyst plan it as the two-phase bounded-heap
  * operator, so the exchange carries ≤ k×partitions rows per key instead
  * of the whole table and no partition is ever sorted. Spark's own
  * InferWindowGroupLimit (3.5+) only pre-FILTERS each map partition to
  * its local top-k and still shuffles + sorts + runs WindowExec on the
  * survivors; this rewrite removes the sort and the window entirely —
  * when the rule fires, a redundant WindowGroupLimit below the matched
  * Window is stripped along with it.
  *
  * Safety conditions, all required:
  *  - the Window computes EXACTLY ONE expression, a plain row_number()
  *    (rank()/dense_rank() admit ties past k — different semantics);
  *  - the filter is a sole rank bound (rn <= k, rn < k, rn = 1, or the
  *    reversed literal forms) — no other conjuncts touched;
  *  - the partition spec is non-empty (a global top-k would cluster
  *    everything into one task — for that shape Spark's TakeOrdered
  *    path is already optimal) and the order spec is non-empty;
  *  - no published column references the rank attribute.
  *
  * Equality with the window formulation holds row-for-row when the
  * ordering is total (the caller's determinism contract, as with any
  * top-k); q110's oracle gate pins it end-to-end against DuckDB's
  * row_number form at every SF.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** Idempotent live-session registration — the QuantizationPushdown
    * convention: sessions built with GraftExtensions already run the
    * rule via injectOptimizerRule; everyone else gets the experimental
    * batch exactly once.
    */
  def install(spark: SparkSession): Unit = {
    val viaExtensions = spark.conf.getOption("spark.sql.extensions")
      .exists(_.contains("GraftExtensions"))
    if (!viaExtensions &&
      !spark.experimental.extraOptimizations.contains(TopKRewrite))
      spark.experimental.extraOptimizations ++= Seq(TopKRewrite)
    // the rewrite emits TopKPerKeyPlan — the planner must know it too
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies ++= Seq(TopKPerKeyStrategy)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window)) =>
      rewrite(projectList, cond, w).getOrElse(p)
  }

  private def rewrite(projectList: Seq[NamedExpression], cond: Expression,
                      w: Window): Option[LogicalPlan] =
    for {
      (rn, k) <- rankBound(cond)
      if k > 0
      (parts, order) <- rowNumberSpec(w, rn)
      if parts.nonEmpty && order.nonEmpty
      if projectList.forall(ne =>
        !ne.references.exists(_.exprId == rn.exprId))
    } yield Project(projectList,
      TopKPerKeyPlan(parts, order, k, stripGroupLimit(w.child)))

  /** InferWindowGroupLimit may already have inserted its pre-filter
    * below the matched Window; the heap operator subsumes it.
    */
  private def stripGroupLimit(child: LogicalPlan): LogicalPlan =
    child match {
      case WindowGroupLimit(_, _, _, _, inner) => inner
      case other => other
    }

  private def rankBound(cond: Expression): Option[(Attribute, Int)] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k))
      case LessThan(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k - 1))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k))
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(1, IntegerType)) => Some((a, 1))
      case EqualTo(Literal(1, IntegerType), a: Attribute) => Some((a, 1))
      case _ => None
    }

  private def rowNumberSpec(w: Window, rn: Attribute)
  : Option[(Seq[Expression], Seq[SortOrder])] =
    w.windowExpressions match {
      case Seq(a @ Alias(
          WindowExpression(_: RowNumber, WindowSpecDefinition(parts, order, _)),
          _)) if a.exprId == rn.exprId =>
        Some((parts, order))
      case _ => None
    }
}
