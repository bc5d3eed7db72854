package graft.tools

import org.apache.spark.sql.DataFrame

/** The scalar-broadcast idiom, in the form [[PlanAudit]] can prove safe.
  *
  * `df.crossJoin(broadcast(stats))` with a 1-row `stats` is how a corpus
  * statistic (max day, global totals) reaches every row. Materializing
  * `stats` with `localCheckpoint(true)` makes it eager and reusable but
  * TRUNCATES ITS LINEAGE — the physical plan then shows an opaque RDD
  * scan under a nested-loop join, indistinguishable from an unbounded
  * cartesian, so every consumer lands on the audit's waiver list.
  * Collecting the one row to the driver and re-injecting it as a literal
  * local relation is the same single Spark job and the same reuse, but
  * the bound (a 1-row LocalTableScan) stays VISIBLE in the plan —
  * [[PlanAudit.audit]] downgrades the join to the bounded-cross warning
  * mechanically. Driver memory is one Row — this is exactly the
  * "parameter-bounded collect" the library's scale rules permit.
  */
object Scalar {

  /** Evaluate a provably-single-row frame (an ungrouped aggregate — which
    * yields exactly one row even on empty input) and return it as a 1-row
    * local relation with identical schema.
    */
  def scalarRow(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Collections.singletonList(df.head()), df.schema)
}
