package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites. `local[8,2]` = 8 executor threads
  * with task maxFailures 2, so fault-injection tests can exercise Spark's
  * task retry (the engine's replacement for the reference's 10 s straggler
  * preemption, src/mr/rpc.go:79-98) while normal tests are unaffected.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8,2]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", tempDir("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      // RAM-backed shuffle scratch when available (see Bench.scratchDir)
      .config("spark.local.dir",
        graft.Bench.scratchDir.getOrElse("/tmp"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"

  /** Temp directory that removes itself (recursively) on JVM exit — the
    * suites were each leaking one directory per run into /tmp (warehouse,
    * MR in/out, sink roundtrips, stream checkpoints: ~7 dirs per `sbt
    * test`). Exit-time cleanup, not eager, because Spark may hold files
    * open until the session stops.
    */
  def tempDir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p,
            java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm(_)) finally s.close()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(d)
    }
    d
  }

  /** A Gutenberg-style corpus for MR parity tests: each documents-table row
    * becomes one (fileName, contents) whole file.
    */
  def corpus(n: Int = 60): Seq[(String, String)] = {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").limit(n).collect()
    docs.map(r => (f"pg-${r.getLong(0)}%04d.txt", r.getString(1))).toSeq
  }
}
