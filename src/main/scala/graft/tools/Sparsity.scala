package graft.tools

/** The derived-graph density tripwire — the library form of the rule the
  * r11 incident produced: EVERY operator whose cost is super-linear in a
  * derived graph's edges (triangle/wedge closing, pair mining, truss
  * peeling) must state a sparsity budget and enforce it, because a
  * derivation drift that densifies the graph (a dropped tie floor, a
  * removed degree cap) does not fail correctness at small scale — it
  * silently multiplies runtime until a batch window (or a CI verify
  * sweep) times out. A pipeline wires its own derived graphs through
  * [[assertWithin]] in a test or a pre-deploy hook, exactly like
  * [[PlanAudit.assertScaleSafe]] for plan shape; this repo's roster
  * budgets live in `graft.queries.Relational.sparsityGauges` and are
  * enforced by RosterBudgetSpec.
  *
  * A good budget names a DATA-INDEPENDENT law: a per-key cap makes pair
  * fan-out at most C(cap, 2) per key (pigeonhole), a fixed dimension
  * bounds the node set, a tie floor keeps average degree under a
  * measured-with-headroom ceiling. "It's fast today" is not a budget.
  */
object Sparsity {

  /** Fail loudly when a derived graph exceeds its declared sparsity
    * budget. The message carries the bound's name so the failure reads
    * as the violated LAW, not a bare number.
    */
  def assertWithin(name: String, measuredEdges: Long, budget: Long,
                   boundName: String): Unit =
    require(measuredEdges <= budget,
      s"$name: derived graph has $measuredEdges edges, over its declared " +
        s"sparsity budget $budget — violated bound: $boundName")
}
