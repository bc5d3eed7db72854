package graft.tools

import org.apache.spark.sql.SparkSession

/** Local subset timer: run the named queries (comma-separated name
  * prefixes) a few times each and print per-run seconds — the
  * quick-iteration companion to `graft.Bench` (which always runs the full
  * roster once, as the driver contract requires).
  *
  *   sbt "runMain graft.tools.TimeQueries /root/testdata/sf0.1 q100,q112 3"
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prefixes = args(1).split(',').toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // RAM-backed shuffle scratch when available (see Bench.scratchDir:
      // the virtual disk stalls identical shuffles 20-100x at random)
      .config("spark.local.dir",
        graft.Bench.scratchDir.getOrElse("/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup discipline as Bench
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
      .foreach { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%-24s ${times.map(t => f"$t%.2f").mkString("  ")}")
      }
    spark.stop()
  }
}
