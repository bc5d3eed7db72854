package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
