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

}
