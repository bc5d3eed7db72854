package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Scale-rule audit of a physical plan — the checks this repo's PlanSpec
  * applies to its own queries, packaged as a library API so a pipeline can
  * gate ITS queries the same way ("would this plan survive 100×?") in a
  * test or a pre-deploy hook.
  *
  * Three high-signal rules, each an anti-pattern that works fine at test
  * scale and dies at 100 TB:
  *
  *  - `cartesian` (error): CartesianProduct / BroadcastNestedLoopJoin —
  *    quadratic row production or an unbounded broadcast; almost always a
  *    missing join key or a non-equi predicate that needed a range/banded
  *    formulation. (A 1-row side makes it harmless — flagged anyway; the
  *    caller allowlists deliberate scalar cross joins.)
  *  - `global-window` (error): a window function with NO partition spec —
  *    every row flows through ONE task's sort. The fix is the two-level
  *    bucket prefix-sum (see TextAnalysis.packSequences) or a partition
  *    key.
  *  - `wide-scan` (warning): a parquet scan reading every column of a
  *    ≥ `wideColumns`-column table — column pruning didn't reach the
  *    source, usually a `select(*)`/UDF-over-struct shape. Cosmetic at
  *    sf0.1; at 100 TB it multiplies scan bytes by the stored/used ratio.
  *
  * The audit inspects the PHYSICAL plan as planned (AQE's initial plan —
  * no job runs); findings carry the node string for context.
  */
object PlanAudit {

  final case class Finding(rule: String, error: Boolean, detail: String) {
    override def toString: String =
      s"[${if (error) "ERROR" else "WARN"}] $rule: $detail"
  }

  /** AQE-aware traversal: AdaptiveSparkPlanExec and query stages hold
    * their physical plans in non-child fields, so a plain `foreach`
    * over an adaptive plan visits only the wrapper.
    */
  private def walk(p: SparkPlan)(f: SparkPlan => Unit): Unit = {
    f(p)
    p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)(f)
      case q: QueryStageExec => walk(q.plan)(f)
      case other => other.children.foreach(walk(_)(f))
    }
  }

  def audit(df: DataFrame, wideColumns: Int = 8): Seq[Finding] = {
    val plan = df.queryExecution.executedPlan
    val out = Seq.newBuilder[Finding]
    def firstLine(p: SparkPlan): String = p.toString.linesIterator.next()
    walk(plan) {
      case p if p.nodeName == "CartesianProduct" ||
        p.nodeName == "BroadcastNestedLoopJoin" =>
        out += Finding("cartesian", error = true, firstLine(p))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        out += Finding("global-window", error = true, firstLine(w))
      case s: FileSourceScanExec =>
        val stored = s.relation.dataSchema.size
        val read = s.requiredSchema.size
        if (stored >= wideColumns && read == stored)
          out += Finding("wide-scan", error = false,
            s"reads all $stored columns: ${firstLine(s)}")
      case _ =>
    }
    out.result()
  }

  /** Throw (listing every error-grade finding) unless the plan is free of
    * scale-killers — the pre-deploy gate form of [[audit]].
    */
  def assertScaleSafe(df: DataFrame, wideColumns: Int = 8): Unit = {
    val errors = audit(df, wideColumns).filter(_.error)
    require(errors.isEmpty,
      s"plan has ${errors.size} scale-killer(s):\n${errors.mkString("\n")}")
  }
}
