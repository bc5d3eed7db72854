package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Native per-key top-k — the custom-physical-operator rung of the
  * extension ladder (logical node + planner strategy + SparkPlan),
  * for the one shape the built-in operators can't plan efficiently:
  * "the k best rows per key" over a huge fact table.
  *
  * The window formulation (`row_number() OVER (PARTITION BY key ORDER BY
  * o) <= k`, what q26 plans) shuffles EVERY row to its key's partition
  * and SORTS entire partitions before discarding all but k — at 100 TB
  * the exchange carries the full table and the sort spills. This
  * operator runs two phases of a bounded-heap scan instead:
  *
  *   partial: each input partition keeps at most k rows per key it sees
  *            (hash map of size-k heaps — no sort, O(n log k) compares,
  *            memory O(keys-per-partition × k));
  *   final:   after the key-clustered exchange, the same kernel reduces
  *            the ≤ k × partitions candidates per key to the exact k.
  *
  * The exchange therefore carries at most k × partitions rows PER KEY
  * instead of every row — the partial-aggregation idea applied to
  * ORDER-BY-LIMIT semantics. Output equals the window formulation
  * exactly when the ordering is total (ties broken by a unique column);
  * q85's oracle pins that equivalence against DuckDB's row_number form.
  *
  * Planning: [[TopKPerKeyStrategy]] is injected via
  * [[graft.functions.GraftExtensions]] (injectPlannerStrategy) and also
  * registered idempotently on `spark.experimental.extraStrategies` by
  * the [[TopKPerKey.perKey]] API for sessions built without the
  * extension — the QuantizationPushdown convention. EnsureRequirements
  * inserts the hash exchange between the two phases from the final
  * phase's required ClusteredDistribution; AQE handles it like any
  * other exchange.
  */
object TopKPerKey {

  /** The k best rows of `df` per distinct value of `keys`, "best" = first
    * under `order` ((column, ascending) pairs; add a unique tiebreaker
    * for a total order — determinism is the caller's contract, same as
    * any top-k). Columns are resolved BY NAME against the analyzed input
    * here, so the logical node carries plain resolved attributes — the
    * analyzer, the optimizer's reference tracking, and executor-side
    * serialization all see ordinary expressions.
    */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
             k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies ++= Seq(TopKPerKeyStrategy)
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      child.output.find(_.name == n).getOrElse(sys.error(
        s"TopKPerKey: no column '$n' in (${child.output.map(_.name).mkString(", ")})"))
    GraftShims.ofRows(spark,
      TopKPerKeyPlan(
        keys.map(attr),
        order.map { case (n, asc) =>
          SortOrder(attr(n), if (asc) Ascending else Descending)
        },
        k, child))
  }
}

/** Logical node: output and schema are the child's; the operator only
  * filters rows (per-key top-k), never changes shape.
  */
case class TopKPerKeyPlan(groupExprs: Seq[Expression],
                          orderExprs: Seq[SortOrder], k: Int,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan)
  : TopKPerKeyPlan = copy(child = newChild)
}

/** Planner strategy: the logical node becomes partial + final exec nodes;
  * EnsureRequirements provides the key-clustered exchange between them.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(g, o, k, child) =>
      TopKPerKeyExec(g, o, k, partial = false,
        TopKPerKeyExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** The bounded-heap kernel, shared by both phases: at most k rows per
  * key per input partition survive. `partial` only relaxes the required
  * child distribution (any → clustered).
  */
case class TopKPerKeyExec(groupExprs: Seq[Expression],
                          orderExprs: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groups = groupExprs
    val orders = orderExprs
    val kk = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groups, childOutput)
      // compare(a, b) < 0 ⟺ a sorts before b ⟺ a is better; the
      // max-heap's head is therefore the WORST kept row — the eviction
      // candidate
      val ord = RowOrdering.create(orders, childOutput)
      val heapOrd: Ordering[InternalRow] = (a, b) => ord.compare(a, b)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(h) =>
            if (h.size < kk) h.enqueue(row.copy())
            else if (ord.compare(row, h.head) < 0) {
              h.dequeue(); h.enqueue(row.copy())
            }
          case None =>
            val h = scala.collection.mutable.PriorityQueue
              .empty[InternalRow](heapOrd)
            h.enqueue(row.copy())
            heaps.put(key.copy(), h)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan)
  : TopKPerKeyExec = copy(child = newChild)
}
