package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Native gap sessionization — the third rung-(c) physical operator
  * (TopKPerKey: unary filter; AsOfJoin: binary join; this: unary
  * STATEFUL ENRICHMENT). Assigns each row a per-key `session_id` that
  * increments whenever the gap column jumps by more than `gap` between
  * consecutive rows of the key's total order — the q16 lag + running-sum
  * semantics (session ids start at 0, exactly the running sum of
  * is-new flags) in ONE forward pass with O(1) carried state.
  *
  * Why native: the declarative formulation needs TWO chained window
  * functions over the same (key, order) sort — a lag to flag gaps, then
  * a running sum over the flags — which Spark plans as one exchange +
  * one sort + two WindowExec passes each buffering a frame. The native
  * operator declares the identical distribution + ordering to
  * EnsureRequirements (so AQE/reuse still apply to the exchange) and
  * replaces both window passes with a streaming scan carrying
  * (prevKey, prevGapValue, counter). q137's gate pins it against q16's
  * window-formulation oracle VERBATIM (the q132 convention).
  *
  * Scale: one hash exchange on the key + one sort — the minimum any
  * order-sensitive sessionizer needs; per-partition state is O(1), so
  * a 100 TB events table sessionizes at scan speed after the shuffle.
  */
object Sessionize {

  /** Appends `session_id` (LongType, 0-based per key): rows of a key are
    * ordered by `orderCols` (made total by the caller — q16 uses the
    * unique event id) and a new session starts where `gapCol` (LongType,
    * e.g. epoch nanoseconds) exceeds the previous row's value by more
    * than `gap`. Rows with NULL gapCol sort per the child ordering and
    * never OPEN a gap (NULL arithmetic is null — the SQL formulation's
    * `CASE WHEN ts - lag > g THEN 1 ELSE 0` reads null comparisons as
    * not-a-gap, and the kernel mirrors that exactly).
    */
  def assign(df: DataFrame, keyCol: String, orderCols: Seq[String],
             gapCol: String, gap: Long): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(SessionizeStrategy))
      spark.experimental.extraStrategies ++= Seq(SessionizeStrategy)
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      child.output.find(_.name == n).getOrElse(sys.error(
        s"Sessionize: no column '$n' in (${child.output.map(_.name).mkString(", ")})"))
    val g = attr(gapCol)
    require(g.dataType == LongType,
      s"Sessionize: gap column $gapCol must be LongType, found ${g.dataType}")
    GraftShims.ofRows(spark,
      SessionizePlan(attr(keyCol), orderCols.map(attr), g, gap,
        AttributeReference("session_id", LongType, nullable = false)(),
        child))
  }
}

/** Logical node: child columns plus the appended session_id. The output
  * attribute is a CONSTRUCTOR parameter so its exprId survives plan
  * copies (a `val` would mint a fresh id on every optimizer transform
  * and orphan downstream references).
  */
case class SessionizePlan(key: Expression, order: Seq[Expression],
                          gapCol: Expression, gap: Long,
                          sessionAttr: AttributeReference,
                          child: LogicalPlan)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ sessionAttr
  override protected def withNewChildInternal(
      newChild: LogicalPlan): SessionizePlan = copy(child = newChild)
  override def references: AttributeSet =
    AttributeSet(Seq(key, gapCol) ++ order)
}

object SessionizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SessionizePlan(k, o, g, gap, sa, child) =>
      SessionizeExec(k, o, g, gap, sa, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** The scan kernel: input arrives clustered by key and sorted by
  * (key, order...); one pass assigns 0-based session counters with O(1)
  * carried state per partition.
  */
case class SessionizeExec(key: Expression, order: Seq[Expression],
                          gapCol: Expression, gap: Long,
                          sessionAttr: AttributeReference,
                          child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ sessionAttr

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(key)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(key, Ascending) +: order.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    SortOrder(key, Ascending) +: order.map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val k = key; val g = gapCol; val gapMax = gap
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(Seq(k), childOut)
      val gapProj = UnsafeProjection.create(Seq(g), childOut)
      val keyOrd = RowOrdering
        .createNaturalAscendingOrdering(Seq(k.dataType))
      val joined = new JoinedRow
      val out = UnsafeProjection.create(output, output)
      val sidRow = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(1)
      var prevKey: InternalRow = null
      var prevGapSet = false
      var prevGap = 0L
      var sid = 0L
      it.map { row =>
        val rowKey = keyProj(row)
        val thisGapRow = gapProj(row)
        val gapIsNull = thisGapRow.isNullAt(0)
        val thisGap = if (gapIsNull) 0L else thisGapRow.getLong(0)
        if (prevKey == null || keyOrd.compare(prevKey, rowKey) != 0) {
          sid = 0L // first row of a key: running sum of is-new starts at 0
          prevKey = rowKey.copy()
          prevGapSet = !gapIsNull
          prevGap = thisGap
        } else {
          // a gap opens only when BOTH this row's and the IMMEDIATELY
          // previous row's values are present and the jump exceeds the
          // threshold — exactly lag(1)'s null-safe CASE (a null never
          // opens a gap, and also never stands in for an older value)
          if (prevGapSet && !gapIsNull && thisGap - prevGap > gapMax)
            sid += 1L
          prevGapSet = !gapIsNull
          prevGap = thisGap
        }
        sidRow.setLong(0, sid)
        out(joined(row, sidRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): SessionizeExec = copy(child = newChild)
}
