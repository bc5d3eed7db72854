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

  for (name <- SparkEntry.queries.keys.toSeq.sorted) {
    test(s"sf0.01 wall-time budget: $name") {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec <= BudgetSec,
        f"$name took $sec%.1f s at sf0.01 — over the $BudgetSec%.0f s " +
          "tripwire; at this per-entry cost the driver's global Verify " +
          "window is at risk (the r11 zeroing mode). Find the scaling " +
          "regression before shipping.")
    }
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
