package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-JOB breakdown of one query's execution — where an iterative
  * query's wall time actually goes (the guide's "measure first" applied
  * below the per-query grain): runs the named queries once warm on the
  * bench session with a listener that prints every Spark job's wall
  * duration, task count and description. A 5-iteration graph query is
  * ~15 scheduled jobs (per-hop checkpoints, scalar probes, the final
  * count); this tells apart "one join is slow" from "20 fixed-cost jobs
  * at 0.2 s each", which no end-to-end timer can.
  *
  *   sbt "runMain graft.tools.JobProbe q164_betweenness [sfDir]"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq).getOrElse {
      System.err.println("usage: JobProbe <query[,query...]> [sfDir]")
      sys.exit(2)
    }
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val spark = graft.Bench.session("graft-jobprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    try graft.SparkEntry.queries("q01_pricing_summary")(spark, dir).count()
    catch { case _: Throwable => () }

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val tasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = if (record) {
        val desc = j.stageInfos.map(s => s"${s.name}(${s.numTasks}t)")
          .mkString(" | ")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (record) tasks.merge(s.stageInfo.stageId,
          s.stageInfo.numTasks, Integer.sum)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (record) {
        Option(starts.remove(j.jobId)).foreach { case (t0, desc) =>
          println(f"[job] ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $desc")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (name <- names) {
      // warm run first so the probe reads plan cost, not first-touch JIT
      graft.SparkEntry.queries(name)(spark, dir).count()
      println(s"=== $name (warm) ===")
      record = true
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val total = (System.nanoTime() - t0) / 1e9
      // listener delivery is async; give stragglers a beat before unflagging
      Thread.sleep(300)
      record = false
      println(f"=== $name total ${total}%.2f s ===")
    }
    spark.stop()
  }
}
