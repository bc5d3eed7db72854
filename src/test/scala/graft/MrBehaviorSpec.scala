package graft

import graft.apps.Apps
import graft.core.{KV, MapReduceJob, MrApp}
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.ConcurrentHashMap

/** Behavioral parity with the reference's non-differential tests
  * (src/main/test-mr.sh): parallelism probes, exactly-once task accounting,
  * crash recovery, early-exit/commit finality.
  */
object Probe {
  // Executor-side state. Valid because tests run in local mode (single JVM)
  // — the same trick the reference plays with on-disk pid marker files.
  val cur = new AtomicInteger(0)
  val max = new AtomicInteger(0)
  val mapInvocations = new AtomicInteger(0)
  val failedOnce: ConcurrentHashMap[String, java.lang.Boolean] = new ConcurrentHashMap()

  def enter(): Unit = {
    val c = cur.incrementAndGet()
    max.updateAndGet(m => math.max(m, c))
  }
  def exit(): Unit = cur.decrementAndGet()

  def reset(): Unit = { cur.set(0); max.set(0); mapInvocations.set(0); failedOnce.clear() }

  /** Deterministic fault: the first attempt of each distinct unit throws;
    * retries succeed. Spark's task retry (local[8,2]) must absorb it.
    */
  def failFirstAttempt(unit: String): Unit =
    if (Probe.failedOnce.putIfAbsent(unit, java.lang.Boolean.TRUE) == null)
      throw new RuntimeException(s"injected fault: $unit")
}

class MrBehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val files = TestSpark.corpus(24)

  test("map tasks run in parallel (mtiming analog, >=2 concurrent)") {
    Probe.reset()
    val probed = new MrApp {
      val name = "mtiming-probe"
      def map(f: String, c: String): Seq[KV] = {
        Probe.enter()
        try { Thread.sleep(250); Apps.MapTiming.map(f, c) }
        finally Probe.exit()
      }
      def reduce(k: String, vs: Seq[String]): String = vs.size.toString
    }
    // 8 input files -> default parallelism spreads across >=2 of the 8 threads
    MapReduceJob(probed).runOn(spark, files.take(8)).count()
    assert(Probe.max.get() >= 2, s"max concurrent map tasks = ${Probe.max.get()}")
  }

  test("reduce tasks run in parallel (rtiming analog, >=2 concurrent)") {
    Probe.reset()
    val probed = new MrApp {
      val name = "rtiming-probe"
      def map(f: String, c: String): Seq[KV] = Apps.ReduceTiming.map(f, c)
      def reduce(k: String, vs: Seq[String]): String = {
        Probe.enter()
        try { Thread.sleep(250); vs.size.toString }
        finally Probe.exit()
      }
    }
    MapReduceJob(probed, nReduce = 8).runOn(spark, files.take(8)).count()
    assert(Probe.max.get() >= 2, s"max concurrent reduce groups = ${Probe.max.get()}")
  }

  test("each map runs exactly once absent failures (jobcount analog)") {
    Probe.reset()
    val counted = new MrApp {
      val name = "jobcount-probe"
      def map(f: String, c: String): Seq[KV] = {
        Probe.mapInvocations.incrementAndGet()
        Apps.JobCount.map(f, c)
      }
      def reduce(k: String, vs: Seq[String]): String = Apps.JobCount.reduce(k, vs)
    }
    val out = MapReduceJob(counted).runOn(spark, files).collect()
    assert(Probe.mapInvocations.get() === files.size)
    assert(out.toSeq === Seq(KV("a", files.size.toString)))
  }

  test("crash recovery: injected task faults still byte-match nocrash golden") {
    Probe.reset()
    val crash = new Apps.Crash(() => Probe.failFirstAttempt(
      s"task-${org.apache.spark.TaskContext.get().partitionId()}-" +
        s"stage-${org.apache.spark.TaskContext.get().stageId()}"))
    val got = MapReduceJob(crash).runOn(spark, files)
      .collect().map(kv => s"${kv.key} ${kv.value}").toSeq.sorted
    val golden = MapReduceJob.sequential(Apps.NoCrash, files).sorted
    assert(got === golden)
  }

  test("output finalized when action returns (early_exit analog)") {
    val out = TestSpark.tempDir("graft-ee").resolve("out")
    val job = MapReduceJob(Apps.EarlyExit)
    job.writeOutput(job.runOn(spark, files.take(8)), out.toString)
    // action has returned -> _SUCCESS marker present and content complete
    assert(java.nio.file.Files.exists(out.resolve("_SUCCESS")))
    val lines = java.nio.file.Files.list(out).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => new String(java.nio.file.Files.readAllBytes(p)).split("\n"))
      .filter(_.nonEmpty)
    assert(lines.length === 8)
    val again = job.runOn(spark, files.take(8)).collect()
      .map(kv => s"${kv.key} ${kv.value}").sorted
    assert(lines.sorted.toSeq === again.toSeq)
  }
}
