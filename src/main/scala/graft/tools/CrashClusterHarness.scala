package graft.tools

import graft.apps.Apps
import graft.core.{KV, MapReduceJob, MrApp}
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** PROCESS-level crash-recovery parity harness — the true analog of the
  * reference's crash test (src/main/test-mr.sh:284-330), which SIGKILLs
  * whole worker processes mid-job with p≈1/3 and requires the surviving
  * output to byte-match the undisturbed nocrash run. The in-suite analog
  * (MrBehaviorSpec) injects task-LEVEL exceptions inside one JVM; this
  * harness closes the remaining fault-domain gap: it runs the MR job on
  * `local-cluster[2,2,1024]` (a real standalone master + 2 workers, each
  * launching a SEPARATE executor JVM via $SPARK_HOME), SIGKILLs one
  * executor process while tasks are running, and asserts
  *
  *   1. the kill landed mid-job (an executor-removed event was observed),
  *   2. the job still completed, and
  *   3. the output BYTE-matches the sequential golden oracle
  *      (MapReduceJob.sequential — the mrsequential.go port).
  *
  * Runs as its own JVM (ExecutorCrashSpec forks it) because a SparkContext
  * is one-per-JVM and the test suite's shared session is `local[*]`.
  * Exit codes: 0 = parity OK; 2 = output mismatch; 3 = the kill never
  * landed (no executor process found while the job ran — a harness
  * failure, NOT a recovery success); 4 = job failed outright.
  */
object CrashClusterHarness {

  /** NoCrash's exact emissions, slowed so the map phase outlives the
    * SIGKILL window (12 files × 250 ms across 4 task slots ≥ ~750 ms of
    * guaranteed in-flight map work, and the reduce phase follows). The
    * output contract is UNCHANGED — byte-parity with the golden oracle is
    * the whole point.
    */
  private final class SlowNoCrash extends MrApp {
    val name = "slow_nocrash"
    def map(file: String, contents: String): Seq[KV] = {
      Thread.sleep(250)
      Apps.NoCrash.map(file, contents)
    }
    def reduce(key: String, values: Seq[String]): String = {
      Thread.sleep(50)
      Apps.NoCrash.reduce(key, values)
    }
  }

  /** PIDs of live CoarseGrainedExecutorBackend processes (scan
    * /proc/✱/cmdline — the container runs no other Spark clusters; the
    * test suite itself is `local[*]`, which launches no executor
    * backends).
    */
  private def executorPids(): Seq[Long] = {
    val proc = new java.io.File("/proc")
    Option(proc.listFiles()).getOrElse(Array.empty).toSeq
      .filter(f => f.getName.forall(_.isDigit))
      .flatMap { f =>
        try {
          val cmd = new String(java.nio.file.Files.readAllBytes(
            f.toPath.resolve("cmdline")), "UTF-8")
          if (cmd.contains("CoarseGrainedExecutorBackend")) Some(f.getName.toLong)
          else None
        } catch { case _: Throwable => None }
      }
  }

  def main(args: Array[String]): Unit = {
    val files = (1 to 12).map(i =>
      (f"pg-synth-$i%02d.txt",
        (1 to 40).map(j => s"line $j of synthetic document $i").mkString("\n")))
    val golden = MapReduceJob.sequential(Apps.NoCrash, files).sorted

    // ABSOLUTE executor classpath: executors run in the worker's work
    // dir, so a relative entry (e.g. target/scala-2.13/classes) resolves
    // to nothing there and every task dies deserializing its closure
    // (SerializedLambda's capturing class unresolvable)
    val cp = System.getProperty("java.class.path")
      .split(java.io.File.pathSeparatorChar)
      .filter(_.nonEmpty)
      .map(e => new java.io.File(e).getAbsolutePath)
      .mkString(java.io.File.pathSeparator)
    val spark = SparkSession.builder()
      .master("local-cluster[2,2,1024]")
      .appName("graft-crash-cluster")
      .config("spark.executor.extraClassPath", cp)
      .config("spark.task.maxFailures", "8")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val taskStarted = new java.util.concurrent.atomic.AtomicBoolean(false)
    val executorsRemoved = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasksFailed = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskStart(e: SparkListenerTaskStart): Unit =
        taskStarted.set(true)
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.reason != org.apache.spark.Success) tasksFailed.incrementAndGet()
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        executorsRemoved.incrementAndGet()
    })

    // the killer: wait for real task execution, then SIGKILL one executor
    // PROCESS (kill -9 — the test-mr.sh fault, not a JVM exception)
    val killed = new java.util.concurrent.atomic.AtomicLong(-1L)
    val killer = new Thread(() => {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (!taskStarted.get && System.nanoTime() < deadline) Thread.sleep(20)
      Thread.sleep(300) // let the map wave get airborne on both executors
      var pids = executorPids()
      while (pids.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(50); pids = executorPids()
      }
      pids.headOption.foreach { pid =>
        // SIGKILL via ProcessHandle (same-user non-child kill; no /bin/kill
        // dependency) — destroyForcibly is the SIGKILL path on Linux
        java.lang.ProcessHandle.of(pid).ifPresent { h =>
          h.destroyForcibly(); killed.set(pid)
        }
      }
    }, "executor-killer")
    killer.setDaemon(true)
    killer.start()

    val job = MapReduceJob(new SlowNoCrash, nReduce = 4)
    val result: Seq[String] =
      try job.runOn(spark, files).collect().toSeq
        .map(kv => s"${kv.key} ${kv.value}").sorted
      catch {
        case e: Throwable =>
          System.err.println(s"JOB FAILED: ${e.getMessage}")
          spark.stop(); sys.exit(4)
      }
    killer.join(2000)
    spark.stop()

    if (killed.get < 0) {
      System.err.println("KILL NEVER LANDED: no executor process found")
      sys.exit(3)
    }
    if (result != golden) {
      System.err.println(s"OUTPUT MISMATCH: got ${result.size} lines, " +
        s"golden ${golden.size}")
      result.zipAll(golden, "<missing>", "<missing>")
        .filter { case (a, b) => a != b }.take(5)
        .foreach { case (a, b) => System.err.println(s"  got=$a  want=$b") }
      sys.exit(2)
    }
    println(s"CRASH_CLUSTER_PARITY_OK killed_pid=${killed.get} " +
      s"executors_removed=${executorsRemoved.get} " +
      s"tasks_failed=${tasksFailed.get}")
  }
}
