package graft

import graft.sources.Sources
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The format round-trips gate (src_jsonl / src_csv): the engine-independent
  * invariant is that the fidelity summary AFTER write→read through the text
  * format equals the summary of the decorated frame computed directly —
  * DuckDB parity of the summary construction itself is the driver's job.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def direct() =
    Sources.fidelitySummary(
      Sources.decorate(Tables.load(spark, TestSpark.sf0001, "documents")))
      .collect().map(_.toString).toSeq

  test("decoration actually injects the adversarial characters") {
    val dec = Sources.decorate(Tables.load(spark, TestSpark.sf0001, "documents"))
    val n = dec.agg(
      sum(when(col("text").contains("\n"), 1).otherwise(0)),
      sum(when(col("text").contains(","), 1).otherwise(0)),
      sum(when(col("text").startsWith("\""), 1).otherwise(0)),
      sum(when(col("text").contains("π"), 1).otherwise(0))).head()
    assert(n.getLong(0) > 0, "no newline docs")
    assert(n.getLong(1) > 0, "no comma docs")
    assert(n.getLong(2) > 0, "no quoted docs")
    assert(n.getLong(3) > 0, "no non-ASCII docs")
  }

  test("JSONL round-trip is lossless under newlines/quotes/commas/unicode") {
    assert(Sources.jsonlRoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq === direct())
  }

  test("CSV round-trip is lossless under newlines/quotes/commas/unicode") {
    assert(Sources.csvRoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq === direct())
  }

  test("ORC round-trip is lossless under newlines/quotes/commas/unicode") {
    assert(Sources.orcRoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq === direct())
  }

  test("zstd parquet round-trip is lossless AND actually used the codec") {
    assert(Sources.zstdRoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq === direct())
    // tripwire: the data files must really be zstd pages, not a silently
    // ignored option falling back to snappy
    val dir = java.nio.file.Files.createTempDirectory("graft-zstd-probe")
    Tables.load(spark, TestSpark.sf0001, "documents").limit(5)
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(dir.toString)
    val parts = java.nio.file.Files.list(dir).filter(
      _.getFileName.toString.endsWith(".parquet"))
      .map[String](_.getFileName.toString)
      .toArray(new Array[String](_))
    assert(parts.nonEmpty && parts.forall(_.contains("zstd")),
      s"data files carry the zstd codec suffix: ${parts.mkString(",")}")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

}
