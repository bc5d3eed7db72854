package graft.examples
import org.apache.spark.sql.SparkSession

/** Per-query timing probe for plan iteration: warms the session with q01,
  * then runs each named query three times on the bench-shaped session
  * (local[32], AQE on). Usage:
  * `sbt "runMain graft.examples.TimeOne q40_profile,ta_boilerplate [sfDir]"`.
  * Bench totals on a contended box swing ±15%; three warm runs of ONE
  * query isolate a plan change from that noise.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    // validate BEFORE paying session startup + the warm-up run
    val names = args.headOption.map(_.split(",").toSeq).getOrElse {
      System.err.println("usage: TimeOne <query[,query...]> [sfDir]")
      sys.exit(2)
    }
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    // the literal bench session: shared builder, no copy to drift
    val spark = graft.Bench.session("graft-timeone")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count()
    for (name <- names) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"[time] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
