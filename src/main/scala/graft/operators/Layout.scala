package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the 100 TB design: bucketing co-locates
  * join/aggregation keys at WRITE time so repeated joins on the same key
  * pay zero shuffle at read time — the biggest single lever for a fact
  * table joined on the same key by many queries (lineitem x orders on
  * orderkey here). Spark reads each bucket as one task and, when both
  * sides are bucketed the same way, plans a sort-merge join with no
  * Exchange (asserted in LayoutSpec).
  */
object Layout {

  /** Write `df` as a bucketed (and per-bucket sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys — shuffle-free
    * when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(left).join(spark.table(right),
      spark.table(left)(leftKey) === spark.table(right)(rightKey))

  /** Hive-style partitioned layout: one directory per distinct value of
    * `cols`. The complementary lever to bucketing — equality/IN filters on
    * the partition columns prune whole directories at PLANNING time (the
    * scan never lists, opens or reads the other partitions; asserted on
    * the plan in StorageSpec). Right for low-cardinality columns a 100 TB
    * pipeline filters by constantly (date, language, source shard).
    */
  def writePartitioned(df: DataFrame, dir: String, cols: String*): Unit =
    df.write.partitionBy(cols: _*).mode("overwrite").parquet(dir)

  /** Small-file compaction — the nightly job that undoes what streaming
    * sinks and over-parallel writers do to a table: many kilobyte-scale
    * files whose per-file open/footer/task overhead eventually dominates
    * scans (and whose file count explodes driver-side listings). Sizes
    * the output by the INPUT's actual bytes: ceil(total / targetBytes)
    * files via one round-robin repartition — a single shuffle pass, no
    * driver materialization; the file listing is the only driver-side
    * work and is bounded by the file count being fixed.
    *
    * Returns the output file count. At cluster scale the same operator
    * runs per partition-directory (compact cold partitions, skip hot
    * ones); `spark.sql.files.maxRecordsPerFile` is the complementary
    * WRITE-side guard this repair job exists to fix the absence of.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(p)
    // a Hive-partitioned table (data in key=value subdirectories) must be
    // compacted PER PARTITION DIRECTORY — a flat rewrite would silently
    // flatten the partition columns away and mis-size the output (the
    // top-level listing sees zero bytes); refuse loudly instead
    val subdirs = entries.filter(e =>
      e.isDirectory && !e.getPath.getName.startsWith("_"))
    require(subdirs.isEmpty,
      s"compact: $inDir contains partition subdirectories " +
        s"(${subdirs.map(_.getPath.getName).take(3).mkString(", ")}…) — " +
        "compact each partition directory individually")
    val total = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    require(total > 0, s"compact: no parquet data files in $inDir")
    val nFiles = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** Z-order (Morton) key over the low `bits` of two dimension columns —
    * the same interleave as query q34_zorder, exposed for layout use.
    */
  def zvalue(x: Column, y: Column, bits: Int = 10): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast("bigint"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("bigint"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Multi-dimensional clustered layout: range-partition and sort by the
    * z-order key of (x, y) before writing, so each output file covers a
    * compact region of BOTH dimensions — min/max footer stats then let
    * readers skip files for range predicates on either column, where a
    * single-column sort only helps its own column. The third layout lever
    * next to bucketing (join keys) and Hive partitioning (low-cardinality
    * equality): z-ordering is for range filters over several
    * medium-cardinality numeric columns. LayoutSpec measures the locality
    * empirically (per-file dimension ranges shrink vs an unclustered
    * write).
    */
  def writeZOrdered(df: DataFrame, dir: String, xCol: String, yCol: String,
                    nFiles: Int, bits: Int = 10): Unit =
    df.withColumn("zval", zvalue(col(xCol), col(yCol), bits))
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(dir)
}
