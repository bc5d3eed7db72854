package graft

import graft.operators.Layout
import graft.tables.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: writing both join sides bucketed on the join key must make
  * the repeated join shuffle-free (no Exchange in the plan) — the layout
  * strategy a 100 TB fact table relies on.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("same-bucketed tables sort-merge join with zero Exchange") {
    Layout.writeBucketed(
      Tables.load(spark, TestSpark.sf0001, "lineitem"), "li_bucketed", "l_orderkey", 8)
    Layout.writeBucketed(
      Tables.load(spark, TestSpark.sf0001, "orders"), "o_bucketed", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the shuffle (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "li_bucketed", "o_bucketed",
        "l_orderkey", "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles: $plan")
      // and it computes the same result as the plain join
      val plain = Tables.load(spark, TestSpark.sf0001, "lineitem")
        .join(Tables.load(spark, TestSpark.sf0001, "orders"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey"))
      assert(joined.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("z-ordered layout shrinks per-file ranges on BOTH dimensions") {
    import org.apache.spark.sql.functions._
    // interleave width matched to the data domain (suppkey spans ~100
    // values at this sf): z-ordering bits that are always zero wastes the
    // curve's high positions on one dimension
    val li = Tables.load(spark, TestSpark.sf001, "lineitem")
      .select((col("l_partkey") % 128).cast("bigint").as("x"),
        (col("l_suppkey") % 128).cast("bigint").as("y"))
    val dir = TestSpark.tempDir("graft-zorder").toString
    val n = 16

    // mean per-file (max-min) span of a dimension, file identity from the scan
    def meanSpan(path: String, dim: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(dim)) - min(col(dim))).as("span"))
        .agg(avg("span")).head.getDouble(0)

    try {
      Layout.writeZOrdered(li, s"$dir/z", "x", "y", n, bits = 7)
      // baseline: same file count, no clustering (round-robin repartition)
      li.repartition(n).write.mode("overwrite").parquet(s"$dir/plain")
      val (zx, zy) = (meanSpan(s"$dir/z", "x"), meanSpan(s"$dir/z", "y"))
      val (px, py) = (meanSpan(s"$dir/plain", "x"), meanSpan(s"$dir/plain", "y"))
      // unclustered files span ~the full 0..127 domain on both dims; the
      // z-curve trades that for compact squares — require a 2x improvement
      // on each dimension (ideal for 16 files over a 128^2 domain is ~4x)
      assert(zx * 2 < px, s"x: z-ordered span $zx vs unclustered $px")
      assert(zy * 2 < py, s"y: z-ordered span $zy vs unclustered $py")
      // and the data itself survives the layout unchanged
      assert(spark.read.parquet(s"$dir/z").count() === li.count())
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("compact collapses a many-small-files table, data unchanged") {
    val dir = TestSpark.tempDir("graft-compact").toString
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    // simulate a streaming sink's damage: 64 tiny files
    docs.repartition(64).write.parquet(s"$dir/small")
    val smallFiles = new java.io.File(s"$dir/small")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(smallFiles === 64)
    // target far above the table size -> everything fits one file
    val n = Layout.compact(spark, s"$dir/small", s"$dir/compacted")
    assert(n === 1)
    val outFiles = new java.io.File(s"$dir/compacted")
      .listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles === 1, s"$outFiles output files")
    // byte-identical content, just fewer files
    val a = docs.orderBy("doc_id").collect().map(_.toString).toSeq
    val b = spark.read.parquet(s"$dir/compacted")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(a === b)
    // a tiny target produces multiple files (sizing actually responds)
    val n2 = Layout.compact(spark, s"$dir/small", s"$dir/compacted2",
      targetBytes = 8192)
    assert(n2 > 1)
  }
}
