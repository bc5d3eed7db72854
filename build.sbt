ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "distributedmapreducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// pass the forked process's stdout through verbatim — the Bench/Verify
// JSON contract lines must arrive without sbt's "[info] " logger prefix
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// suppress the trailing "[success] Total time: …" line: the bench driver
// keeps only the last 2,000 bytes of stdout, and that line would push the
// head of the Bench contract JSON line out of the window (BENCH_r07 lost
// its official number exactly this way)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not by another setting,
// so the unused-key lint flags it on every launch — silence the false
// positive (the behavior itself is covered by the bench-window tests)
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// measurement escape hatch: extra JVM flags for diagnostic runs
// (e.g. SPARK_GRAFT_EXTRA_JVM_OPTS="-Xlog:gc" to correlate bench-entry
// stalls with collections); empty by default, so the official bench
// invocation is unchanged
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JVM_OPTS")
  .map(_.trim).filter(_.nonEmpty).map(_.split("\\s+").toSeq)
  .getOrElse(Seq.empty)
// JVM temp root (streaming temp checkpoints + offset/commit logs, staged
// stream-source copies, the src_* round-trip stores) on the RAM-backed
// scratch when available — the same measured rule as Bench.scratchDir:
// the default /tmp is virtual-disk-backed and stalls identical small
// writes 20-100x under write-back pressure (SCALING.md sf1 A/B), and a
// streaming micro-batch commits offset log + per-partition state deltas
// through exactly this path. On a real cluster this is "put checkpoint
// and scratch space on fast local storage". SPARK_GRAFT_TMPDIR overrides
// ('' keeps the JVM default); per-run content is removed by the owning
// shutdown hooks exactly as under /tmp.
javaOptions ++= {
  sys.env.get("SPARK_GRAFT_TMPDIR").map(_.trim) match {
    case Some("") => Seq.empty[String]
    case Some(d)  => Seq(s"-Djava.io.tmpdir=$d")
    case None =>
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val root = new java.io.File(shm, "graft-jvm-tmp")
        root.mkdirs()
        Seq(s"-Djava.io.tmpdir=${root.getAbsolutePath}")
      } else Seq.empty[String]
  }
}
