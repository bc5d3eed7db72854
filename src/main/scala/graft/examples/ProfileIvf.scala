package graft.examples

import graft.operators.Similarity
import graft.tables.Tables
import org.apache.spark.sql.SparkSession

/** Example profiler for the ann_ivf fixed-cost floor (the round-6
  * measurement recorded in SURVEY.md) — an entry point, not part of the
  * library surface. Run: `sbt "runMain graft.examples.ProfileIvf <sfDir>"`.
  */
object ProfileIvf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"[prof] $label: ${(System.nanoTime - t0) / 1e9}%.2f s")
      r
    }
    val e = Tables.load(spark, dir, "embeddings")
    t("warmup count")(e.count())
    t("kmeans iters=0 (seeds collect only)")(Similarity.kmeansCentroids(e, 16, 0).count())
    t("kmeans centroids k=16 iters=1")(Similarity.kmeansCentroids(e, 16, 1).count())
    t("kmeans centroids again")(Similarity.kmeansCentroids(e, 16, 1).count())
    t("full ann_ivf")(Similarity.defs("ann_ivf")(spark, dir).count())
    t("full ann_ivf again")(Similarity.defs("ann_ivf")(spark, dir).count())
    t("ann_bruteforce")(Similarity.defs("ann_bruteforce")(spark, dir).count())
    spark.stop()
  }
}
