package graft

import graft.tools.Sparsity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The density/runtime tripwire — the STRUCTURAL fix for the r11 zeroing
  * incident (one dense-graph query ran 1070 s, the driver's global Verify
  * window elapsed, and the end-of-run correctness dump was written empty,
  * zeroing the whole round). Two gates, both local and per-entry, so the
  * failure fires HERE, attributed, before any global timeout can:
  *
  *  1. WALL-TIME BUDGET: every roster entry runs fully (count of the
  *     final frame) at sf0.01 under a 30 s per-query budget. The r12
  *     roster's slowest sf0.01 entry is well under 5 s on this harness,
  *     so 30 s is ~an order of magnitude of headroom — a breach means a
  *     scaling regression, not noise. (The r11 q157 ran >1000 s at
  *     sf0.1 and ~40+ s at sf0.01 — it would have failed this gate on
  *     the first local run.)
  *
  *  2. SPARSITY BUDGET: every operator whose cost is super-linear in a
  *     derived graph's edges measures that graph's edge count against
  *     its DECLARED budget (`Relational.sparsityGauges` — plan
  *     pigeonholes or measured-density ceilings with named headroom).
  *     This mechanizes the q157-postmortem rule: a dropped tie floor or
  *     degree cap now fails the suite by name even while the query is
  *     still fast at test scale.
  *
  * The planted-dense test proves the tripwire ARMS: the same real pair
  * derivation, driven by a corpus whose tie graph goes near-complete,
  * violates its budget and is rejected.
  */
class RosterBudgetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sf001

  val BudgetSec = 30.0

  /** Wall-time gate with ONE warm retry on breach — the r13 noise fix:
    * the single-run form fired on q03 (a 5 s-at-sf0.1 broadcast star
    * join) at 36.3 s cold, because first-touch JIT/codegen plus host
    * steal routinely dwarf sf0.01 query work, and a tripwire that fires
    * on environment noise trains everyone to ignore it. A run over
    * budget is re-measured once and the BEST of the two runs is gated:
    * a genuine scaling regression (the r11 q157 ran 40+ s at sf0.01,
    * plan-bound) is slow on BOTH runs; a cold-JIT artifact is not.
    * The planted must-fail test below proves the retry form still arms.
    */
  private def gateUnderBudget(name: String, budgetSec: Double)
                             (run: => Unit): Unit = {
    def once(): Double = {
      val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
    }
    val cold = once()
    val best = if (cold <= budgetSec) cold else math.min(cold, once())
    assert(best <= budgetSec,
      f"$name took $cold%.1f s cold / $best%.1f s best-of-2 at sf0.01 — " +
        f"over the $budgetSec%.0f s tripwire on BOTH runs; at this " +
        "per-entry cost the driver's global Verify window is at risk " +
        "(the r11 zeroing mode). Find the scaling regression before " +
        "shipping.")
  }

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"sf0.01 wall-time budget: $name") {
      gateUnderBudget(name, BudgetSec) {
        SparkEntry.queries(name)(spark, dir).count()
      }
    }
  }

  test("planted over-budget work fails the wall-time gate on both runs") {
    // the retry gate must still ARM: work that is slow because of its
    // PLAN (slow every run), not its first-touch compilation, fails the
    // best-of-2 form too. 50 ms of real work against a 1 ms budget is
    // the same shape at test speed.
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      gateUnderBudget("planted_slow", 0.001) { Thread.sleep(50) }
    }
    assert(e.getMessage.contains("BOTH runs"))
  }

  for ((name, gauge) <- graft.queries.Relational.sparsityGauges.toSeq.sortBy(_._1)) {
    test(s"sparsity budget: $name") {
      val (measured, budget, bound) = gauge(spark, dir)
      Sparsity.assertWithin(name, measured, budget, bound)
    }
  }

  test("planted dense graph fails its sparsity budget") {
    import spark.implicits._
    // 30 parts, each bought by the SAME 40 customers — every part is
    // inside the 2..40 pdeg cap band, yet the tie graph is COMPLETE:
    // C(40, 2) = 780 pairs, every pair with w = 30 (>= any tie floor).
    // Avg tie-degree = 39 on 40 nodes — the near-complete shape the r11
    // incident produced at corpus scale. The REAL pair derivation runs;
    // the gauge's avg-degree budget (8x headroom over the floored
    // roster graph, far under complete) must reject it.
    val capped = (for { p <- 1 to 30; c <- 1 to 40 }
      yield (p.toLong, c.toLong, 40L)).toDF("part", "cust", "pdeg")
    val edges = graft.queries.Relational.coPurchasePairsFromCapped(capped)
      .filter(col("w") >= 3)
    val nodes = capped.select("cust").distinct().count()
    val measured = edges.count()
    assert(measured === 780L) // the planted graph IS complete
    val e = intercept[IllegalArgumentException] {
      Sparsity.assertWithin("planted_dense", measured, 8L * nodes,
        "avg tie-degree <= 8 (the planted corpus has no cohesion floor)")
    }
    assert(e.getMessage.contains("sparsity budget"))
  }
}
