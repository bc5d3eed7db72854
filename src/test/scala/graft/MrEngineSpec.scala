package graft

import graft.apps.Apps
import graft.core.{KV, MapReduceJob, MrApp}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets

/** Differential tests mirroring the reference's methodology
  * (src/main/test-mr.sh): the distributed engine's sorted output multiset
  * must byte-match the sequential golden oracle
  * (src/main/mrsequential.go:38-87, ported as MapReduceJob.sequential).
  */
class MrEngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val files = TestSpark.corpus()

  def distributedLines(app: MrApp, fs: Seq[(String, String)] = files): Seq[String] =
    MapReduceJob(app).runOn(spark, fs)
      .collect().map(kv => s"${kv.key} ${kv.value}").toSeq.sorted

  def check(app: MrApp): Unit = {
    val expected = MapReduceJob.sequential(app, files).sorted
    val got = distributedLines(app)
    assert(got === expected)
  }

  test("wc matches sequential oracle")(check(Apps.WordCount))
  test("indexer matches sequential oracle")(check(Apps.Indexer))
  test("nocrash matches sequential oracle")(check(Apps.NoCrash))
  test("early_exit matches sequential oracle")(check(Apps.EarlyExit))
  test("rtiming matches sequential oracle")(check(Apps.ReduceTiming))

  test("wc end-to-end through real files and text sink") {
    val dir = TestSpark.tempDir("graft-mr-in")
    val out = TestSpark.tempDir("graft-mr-out").resolve("wc")
    files.take(8).foreach { case (name, contents) =>
      Files.write(dir.resolve(name), contents.getBytes(StandardCharsets.UTF_8))
    }
    val job = MapReduceJob(Apps.WordCount)
    val result = job.run(spark, dir.toString + "/*")
    job.writeOutput(result, out.toString)
    // sort across all part files, like `sort mr-out* | grep .`
    // (src/main/test-mr.sh:103-111)
    val gotLines = Files.list(out).toArray.map(_.asInstanceOf[Path])
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => new String(Files.readAllBytes(p), StandardCharsets.UTF_8).split("\n"))
      .filter(_.nonEmpty).toSeq.sorted
    val fullPaths = files.take(8).map { case (n, c) => (dir.resolve(n).toUri.toString, c) }
    val expected = MapReduceJob.sequential(Apps.WordCount, fullPaths).sorted
    assert(gotLines === expected)
  }

  test("reduce receives the full materialized value list (list semantics)") {
    // An order-insensitive but list-shaped reducef: joined sorted values.
    val probe = new MrApp {
      val name = "probe"
      def map(f: String, c: String): Seq[KV] =
        c.split(" ").toSeq.map(w => KV(w.take(1), w))
      def reduce(k: String, vs: Seq[String]): String = vs.sorted.mkString("|")
    }
    val data = Seq(("f1", "apple avocado banana"), ("f2", "apricot berry"))
    val got = distributedLines(probe, data)
    val expected = MapReduceJob.sequential(probe, data).sorted
    assert(got === expected)
    assert(got.exists(_.startsWith("a apple|apricot|avocado")))
  }
}
