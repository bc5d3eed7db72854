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
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count()
    for (name <- args(0).split(",")) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"[time] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
