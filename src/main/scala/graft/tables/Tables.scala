package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md). Every query in [[graft.SparkEntry]]
  * receives the scale-factor directory at call time, so nothing here
  * caches paths. Reads are plain parquet scans — Catalyst pushes
  * filters/column pruning into them (asserted on .explain output in
  * PlanSpec).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // One analyzed scan plan per (session, dir, table): `spark.read.parquet`
  // re-lists files and re-reads the parquet footer schema on every call,
  // which at ~70 queries × ~2 tables each is a measurable slice of the
  // per-query planning floor. DataFrames are immutable plans, so sharing
  // one across queries is safe; keyed by session IDENTITY so a new session
  // never reuses a stopped session's plans. (The driver test dirs are
  // write-once; a pipeline re-reading a directory whose FILES change would
  // bypass this cache.)
  //
  // Eviction: a stopped session's entries are dropped by an
  // application-end listener registered on the session's first load — the
  // map must not strongly reference dead sessions forever in a driver
  // that cycles sessions (test suites do). Sessions sharing one
  // SparkContext via newSession() are evicted together at context end,
  // which is when their plans die anyway.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name (have: ${names.mkString(", ")})")
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
      // default (PARQUET_TYPE_ILLEGAL). Read it as a nanosecond epoch long
      // — exact, and ns arithmetic then matches the DuckDB oracle
      // bit-for-bit (no µs truncation).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    if (hooked.add(spark))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          cache.keySet.removeIf(k => k._1 eq spark)
          hooked.remove(spark)
        }
      })
    cache.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** The events table with `ts_ns` (exact epoch nanoseconds, LongType) and
    * `ts` (µs-truncated TimestampType for calendar functions / windows).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
}
