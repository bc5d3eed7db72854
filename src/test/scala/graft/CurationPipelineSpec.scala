package graft

import graft.examples.CurationPipeline
import graft.operators.TextAnalysis
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation pipeline: every stage is an individually
  * hash-checked operator, so this spec pins only the PLUMBING — monotone
  * stage counts, gate consistency, split disjointness, packing coverage.
  */
class CurationPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val (counts, fin) = CurationPipeline.run(spark, TestSpark.sf0001)
  lazy val byStage = counts.toMap

  test("stage doc/token counts only shrink") {
    val order = Seq("raw", "quality", "deduped", "train")
    val ds = order.map(byStage(_)._1)
    val ts = order.map(byStage(_)._2)
    assert(ds.sliding(2).forall(p => p(0) >= p(1)), s"docs grew: $ds")
    assert(ts.sliding(2).forall(p => p(0) >= p(1)), s"tokens grew: $ts")
    assert(byStage("train")._1 > 0, "empty train split")
  }

  test("every surviving document passes the quality gate") {
    val surv = fin.select("doc_id")
    val failing = TextAnalysis.gopherRules(
      Tables.load(spark, TestSpark.sf0001, "documents"))
      .filter(col("keep") === 0).select("doc_id")
    assert(surv.join(failing, "doc_id").count() === 0)
  }

  test("splits partition the survivors: no doc in two splits, none lost") {
    val n = fin.count()
    assert(fin.select("doc_id").distinct().count() === n)
    val splitSum = fin.groupBy("split").count().collect().map(_.getLong(1)).sum
    assert(splitSum === n)
    assert(fin.filter(!col("split").isin("train", "val", "test")).count() === 0)
  }

  test("packing covers exactly the train split") {
    assert(fin.filter(col("split") === "train" && col("seq_id").isNull)
      .count() === 0, "train doc missing from packing")
    assert(fin.filter(col("split") =!= "train" && col("seq_id").isNotNull)
      .count() === 0, "non-train doc was packed")
  }

  test("phrase search: adjacency is exact, overlaps count, gaps don't") {
    import graft.operators.TextAnalysis
    import spark.implicits._
    val docs = Seq(
      (1L, "merge join merge join table"),  // two occurrences, first at 0
      (2L, "merge scan join"),              // gap: no match
      (3L, "join merge"),                   // wrong order: no match
      (4L, "a merge join"),                 // one, at token offset 1
      (5L, "merge merge join"),             // one, at offset 1 (not 0)
      (6L, "")                              // empty text
    ).toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(docs, Seq("merge", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 0L), (4L, 1L, 1L), (5L, 1L, 1L)))
    // a 3-word phrase chains a second positional join
    val tri = TextAnalysis.phraseSearch(
      Seq((9L, "fast sort merge join now sort merge join"))
        .toDF("doc_id", "text"),
      Seq("sort", "merge", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tri === Seq((9L, 2L, 1L)))
    // the scan (row-local HOF) form equals the index (positional join)
    // form on the same edge cases...
    val scan = TextAnalysis.phraseSearchScan(docs, Seq("merge", "join"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .sorted
    assert(scan === got.sorted)
    // ...and on the real corpus (the st_phrase twin rides this equality)
    val corpus = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val idx = TextAnalysis.phraseSearch(corpus)
      .collect().map(_.toString).sorted
    val scn = TextAnalysis.phraseSearchScan(corpus)
      .orderBy("doc_id").collect().map(_.toString).sorted
    assert(scn === idx)
    assert(idx.nonEmpty, "corpus phrase should match somewhere")
  }
}
