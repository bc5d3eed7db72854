package graft.tools

/** Per-BUILD timing probe — [[graft.examples.TimeOne]] for the shared
  * in-session corpus builds (`SparkEntry.memoWarmers`): warms the session
  * with q01, then forces each named build once, timed, on a fresh memo
  * (each probe run is one JVM, so the store is cold by construction).
  * Usage:
  *   sbt "runMain graft.tools.TimeBuild copurchase,walk_corpus [sfDir]"
  * SPARK_GRAFT_CPUS picks the session width (threads AND shuffle
  * partitions) — the lever the 30× probe's spill hypothesis tests.
  */
object TimeBuild {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse {
      System.err.println("usage: TimeBuild <build[,build...]> [sfDir]")
      sys.exit(2)
    }
    val all = graft.SparkEntry.memoWarmers.toMap
    val unknown = names.filterNot(all.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown builds: ${unknown.mkString(", ")} " +
        s"(have: ${graft.SparkEntry.memoWarmers.map(_._1).mkString(", ")})")
      sys.exit(2)
    }
    val spark = graft.Bench.session("graft-timebuild")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count()
    catch { case _: Throwable => () }
    for (name <- names) {
      val t0 = System.nanoTime()
      all(name)(spark, dir)
      println(f"[build] $name ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(cpus=${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")})")
    }
    spark.stop()
  }
}
