package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF join — the extension ladder's custom-physical-operator
  * rung applied to a BINARY join (TopKPerKey covered the unary case):
  * for every left row, the single right row with the greatest time
  * at-or-before the left row's time within the same key — the
  * point-in-time lookup behind market-data enrichment, last-click
  * attribution, and SCD reads, which Spark SQL has no native operator
  * for (DuckDB: ASOF JOIN; the window/struct-max rewrites q18 uses
  * shuffle and SORT the union of both tables through ONE window).
  *
  * Physical shape: each side is hash-clustered on its key and sorted by
  * (key, time ASC [, tiebreak ASC]) — both requirements declared to
  * EnsureRequirements, which inserts the exchanges and sorts exactly
  * like a sort-merge join. Execution is then ONE forward merge pass per
  * partition: the right cursor never rewinds, state is a single carried
  * row per in-flight key (the last right row seen at-or-before the
  * current left time), memory O(1) beyond the sort buffers. Unmatched
  * left rows emit null right columns (left-outer semantics). With the
  * right ordering made total by a tiebreak column, "the" match is
  * unique and the operator is deterministic — q132's gate pins it
  * against q18's window-formulation oracle verbatim.
  */
object AsOfJoin {

  /** Left-outer as-of join: for each row of `left`, the row of `right`
    * with equal `rightKey` and — backward (default) — the greatest
    * (`rightTime`, tiebreak...) among rows with rightTime ≤ leftTime,
    * or — `forward = true` — the SMALLEST (rightTime, tiebreak...)
    * among rows with rightTime ≥ leftTime (the next-event lookup:
    * time-to-next-touch, following fill). Both directions are the same
    * single forward merge pass: ascending left times mean the backward
    * kernel never rewinds its carried row and the forward kernel never
    * needs a dropped row again. Columns resolve by name (the
    * TopKPerKey convention: the logical node carries plain resolved
    * attributes).
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTiebreak: Seq[String] = Nil,
           forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies ++= Seq(AsOfJoinStrategy)
    // SQL null semantics, enforced here rather than half-implemented in
    // the kernel: a right row with NULL key or NULL time can never be a
    // legitimate match (an equi predicate and time ≤ t are both
    // null-rejecting), so it is filtered out; a LEFT row with NULL key
    // or time then simply finds nothing and emits unmatched (outer
    // nulls) — without this filter the nulls-first sort would make a
    // NULL right time "≤ everything" and match.
    val cleanRight = right.filter(
      org.apache.spark.sql.functions.col(rightKey).isNotNull &&
        org.apache.spark.sql.functions.col(rightTime).isNotNull)
    val l = left.queryExecution.analyzed
    val r = cleanRight.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(sys.error(
        s"AsOfJoin: no column '$n' in (${p.output.map(_.name).mkString(", ")})"))
    val (lk, rk) = (attr(l, leftKey), attr(r, rightKey))
    val (lt, rt) = (attr(l, leftTime), attr(r, rightTime))
    // the kernel hash-clusters each side on its own key and compares
    // keys/times with orderings built from the LEFT types — a dtype
    // mismatch would silently mis-partition (int 5 and long 5 hash
    // differently) or misread UnsafeRow slots, so refuse it loudly
    require(lk.dataType == rk.dataType,
      s"AsOfJoin: key types differ — $leftKey: ${lk.dataType} vs " +
        s"$rightKey: ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"AsOfJoin: time types differ — $leftTime: ${lt.dataType} vs " +
        s"$rightTime: ${rt.dataType}")
    GraftShims.ofRows(spark,
      AsOfJoinPlan(lk, rk, lt, rt, rightTiebreak.map(attr(r, _)), forward,
        l, r))
  }
}

/** Logical node: left columns as-is, right columns nullable (left-outer). */
case class AsOfJoinPlan(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTiebreak: Seq[Expression], forward: Boolean,
                        left: LogicalPlan, right: LogicalPlan)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
  // every referenced attribute must survive column pruning
  override def references: AttributeSet =
    AttributeSet(Seq(leftKey, rightKey, leftTime, rightTime) ++ rightTiebreak)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, rk, lt, rt, tb, fwd, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, fwd,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** The merge kernel: both children arrive clustered by key and sorted by
  * (key, time [, tiebreak]); one forward pass matches every left row to
  * the last qualifying right row of its key.
  */
case class AsOfJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        rightTiebreak: Seq[Expression], forward: Boolean,
                        left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)),
      ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending))
      ++ rightTiebreak.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val rk = rightKey
    val lt = leftTime; val rt = rightTime
    val nRight = rOut.size
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering
        .createNaturalAscendingOrdering(Seq(lk.dataType))
      val timeOrd = RowOrdering
        .createNaturalAscendingOrdering(Seq(lt.dataType))
      val rBuf = rIt.buffered
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      // bind against the NULLABLE right attributes: bindReference takes
      // nullability from the input schema, and a right child with
      // non-nullable columns (e.g. a local relation) would otherwise be
      // read without a null check — the unmatched-row nulls became 0s
      val out = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))
      if (forward) {
        // forward kernel: the match is the FIRST right row of the probe
        // key at-or-after the probe time. Rows dropped here are safe to
        // drop — their time is below the current left time, hence below
        // every LATER left time of this key too (ascending left order);
        // the match itself is only PEEKED (head), never consumed, so
        // several left rows can share the same next event.
        lIt.map { l =>
          val lKey = lKeyProj(l)
          val lTimeRow = lTimeProj(l)
          // a NULL left time matches nothing (rightTime >= leftTime is
          // null-rejecting); without this check nulls-first ordering
          // would read it as "-infinity" and match the earliest row
          if (lTimeRow.isNullAt(0)) {
            out(joined(l, nullRight))
          } else {
            val lTime = lTimeRow.copy()
            while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lKey) < 0) {
              rBuf.next()
            }
            while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0
              && timeOrd.compare(rTimeProj(rBuf.head), lTime) < 0) {
              rBuf.next()
            }
            val matched = rBuf.hasNext &&
              keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0
            out(joined(l, if (matched) rBuf.head else nullRight))
          }
        }
      } else {
      // carried state: the last right row (and its key) whose time was
      // at-or-before the most recent left probe of that key — the
      // forward merge never rewinds because left times are ascending
      // within a key
      var lastKey: InternalRow = null
      var lastRight: InternalRow = null
      lIt.map { l =>
        val lKey = lKeyProj(l)
        val lTimeRow = lTimeProj(l)
        // NULL left time: rightTime <= leftTime is null-rejecting, so
        // emit unmatched. (Nulls-first ordering already guarantees no
        // rows of this key were consumed yet — the guard states the
        // contract rather than relying on the sort convention.)
        if (lTimeRow.isNullAt(0)) {
          out(joined(l, nullRight))
        } else {
        val lTime = lTimeRow.copy()
        // drop right rows of keys strictly before the probe key
        while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lKey) < 0) {
          rBuf.next()
        }
        // consume qualifying rows of THIS key; the last one wins
        while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0
          && timeOrd.compare(rTimeProj(rBuf.head), lTime) <= 0) {
          val r = rBuf.next()
          lastRight = r.copy()
          lastKey = lKey.copy()
        }
        val matched = lastRight != null && lastKey != null &&
          keyOrd.compare(lastKey, lKey) == 0
        out(joined(l, if (matched) lastRight else nullRight))
        }
      }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
