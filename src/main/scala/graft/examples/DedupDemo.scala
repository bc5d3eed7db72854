package graft.examples

import graft.operators.Dedup
import graft.tables.Tables
import org.apache.spark.sql.SparkSession

/** Library-usage example: near-duplicate detection over the documents
  * table, comparing the exact all-pairs Jaccard join with the
  * MinHash-LSH candidate-generate -> exact-verify scale path.
  *
  * Usage: runMain graft.examples.DedupDemo <sfDir> [threshold]
  */
object DedupDemo {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DedupDemo <sfDir> [threshold]")
    val dir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.8
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-dedup-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, threshold)
    val viaLsh = Dedup.ngramJaccardPairsViaLsh(docs, threshold)
    println(s"[DedupDemo] threshold=$threshold")
    println(s"[DedupDemo] exact all-pairs matches: ${exact.count()}")
    println(s"[DedupDemo] lsh-prefiltered matches: ${viaLsh.count()}")
    viaLsh.orderBy("a_id", "b_id").show(10, truncate = false)
    spark.stop()
  }
}
