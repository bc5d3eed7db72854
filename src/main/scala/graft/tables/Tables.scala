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
      // default (PARQUET_TYPE_ILLEGAL). Read it as a nanosecond epoch long.
      // NOTE: the raw value is exact in Spark, but the DuckDB oracle's
      // TIMESTAMP is µs-precision — epoch_ns(ts) there always ends in 000.
      // [[events]] therefore quantizes ts_ns to µs multiples so any query
      // emitting timestamp-derived values agrees with the oracle (the r8
      // q52 lesson); sub-µs residue is unobservable to the oracle and
      // would also make ORDER BY ts_ns engine-dependent for same-µs rows.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the µs quantization must not cost parquet pushdown: this rule
      // turns `(ts div 1000)*1000 <cmp> literal` back into raw-column
      // ranges the source can translate (PlanSpec pins the PushedFilters)
      if (!spark.experimental.extraOptimizations
        .contains(graft.plans.QuantizationPushdown))
        spark.experimental.extraOptimizations ++=
          Seq(graft.plans.QuantizationPushdown)
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

  /** The events table with `ts_ns` (epoch nanoseconds QUANTIZED to µs
    * multiples, LongType — always ends in 000) and `ts` (the matching
    * TimestampType for calendar functions / windows). Quantizing at the
    * source keeps every downstream ns value oracle-reproducible and makes
    * ORDER BY (ts_ns, event_id) deterministic across engines.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_ns", expr("(ts_ns div 1000) * 1000"))
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
}
