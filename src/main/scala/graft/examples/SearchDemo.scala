package graft.examples

import graft.operators.{Similarity, TextAnalysis}
import graft.tables.Tables
import org.apache.spark.sql.SparkSession

/** Library-usage example: hybrid search over the documents/embeddings
  * tables — the BM25 lexical ranking, the quantized-cosine semantic
  * ranking, and their reciprocal-rank fusion side by side (the RAG
  * retrieval stack in three calls).
  *
  * Usage: runMain graft.examples.SearchDemo <sfDir> [term ...]
  */
object SearchDemo {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SearchDemo <sfDir> [term ...]")
    val dir = args(0)
    val query =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("spark", "join", "window")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-search-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    println(s"[SearchDemo] query: ${query.mkString(" ")}")
    println("[SearchDemo] lexical (BM25) top 10:")
    TextAnalysis.bm25TopDocs(docs, query, k = 10).show(truncate = false)
    println("[SearchDemo] hybrid (BM25 + cosine, RRF-fused) top 10:")
    Similarity.hybridRrf(docs, emb, query, k = 10).show(truncate = false)
    spark.stop()
  }
}
