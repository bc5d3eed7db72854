package graft.tools

/** Empirical scaling probe (SCALING.md): time the named queries at two
  * scale factors under the literal bench session and print per-query
  * (t_small, t_big) pairs plus the implied scaling exponent.
  *
  * The big corpus is the shard-model scale-up from `tools/gen_scale.py`
  * (10x cardinality, identical local structure — the regime the roster's
  * sparsity budgets assume), so ratio/10 directly reads "per-row cost
  * growth": a linear operator lands near 1.0x-per-10x-rows after fixed
  * cost, a super-linear one drifts above and gets investigated.
  *
  * Protocol per dir: warm the session with q01, force the in-session
  * memo corpora ONCE (timed, reported as _build_* rows — the bench's
  * attribution discipline), then run each query twice and keep BOTH
  * times; the min is the exponent input (run1 carries first-file-listing
  * noise the bench's own warmup normally absorbs).
  *
  *   sbt "runMain graft.tools.ScalingProbe q164_betweenness,q166_ppr \
  *        /root/testdata/sf0.1 target/scale/sf1"
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val smallDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val bigDir = args.lift(2).getOrElse("target/scale/sf1")

    val spark = graft.Bench.session("graft-scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // (name -> (run1, run2)) per dir; builds are single-run by nature
    def sweep(dir: String): Map[String, (Double, Double)] = {
      try graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count()
      catch { case _: Throwable => () }
      val builds = graft.SparkEntry.memoWarmers.map { case (n, w) =>
        val t = timed(w(spark, dir)); (s"_build_$n", (t, t))
      }
      val qs = names.map { name =>
        val fn = graft.SparkEntry.queries(name)
        val t1 = timed(fn(spark, dir).count())
        val t2 = timed(fn(spark, dir).count())
        (name, (t1, t2))
      }
      (builds ++ qs).toMap
    }

    val small = sweep(smallDir)
    val big = sweep(bigDir)
    for (k <- small.keys.toSeq.sorted) {
      val (s1, s2) = small(k)
      val (b1, b2) = big(k)
      println(f"SCALE $k%-24s small=$s1%.2f/$s2%.2f big=$b1%.2f/$b2%.2f " +
        f"ratio=${math.min(b1, b2) / math.max(math.min(s1, s2), 0.01)}%.2f")
    }
    spark.stop()
  }
}
