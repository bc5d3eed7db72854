package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Spark-native lowering of the reference's two-phase map/shuffle/reduce
  * dataflow (SURVEY §2a). The reference's coordinator/worker/RPC machinery
  * (src/mr/rpc.go, src/mr/coordinator.go) is NOT reproduced — Spark's
  * DAGScheduler provides the task tables, stage barrier, straggler retry
  * and exactly-once output commit natively.
  *
  * Pipeline (one Spark action):
  * {{{
  *   wholetext read                      // src/mr/worker.go:221-232 (one map task per file)
  *     -> flatMap(app.map)               // src/mr/worker.go:232
  *     -> repartition(nReduce, key)      // ihash(key) % nReduce, src/mr/worker.go:235,273-277
  *     -> sortWithinPartitions(key)      // sort.Sort(ByKey), src/mr/worker.go:181
  *     -> adjacent-group fold(app.reduce)// src/mr/worker.go:197-212
  *     -> "key value" text sink          // fmt.Fprintf("%v %v\n"), src/mr/worker.go:209
  * }}}
  *
  * Scale notes (100 TB design):
  *  - This generic path intentionally has NO map-side combine, matching the
  *    reference (src/mrapps/wc.go:27-31 ships one "1" per occurrence). For
  *    production queries use the native DataFrame formulations in
  *    [[graft.SparkEntry]], which get partial aggregation, whole-stage
  *    codegen and pushdown from Catalyst.
  *  - The per-key value list is materialized only per group inside a
  *    streaming iterator scan of each sorted partition — Spark's
  *    UnsafeExternalSorter spills the sort, so a partition larger than
  *    executor memory still completes; a single giant key is the only
  *    unbounded case, exactly as in the reference.
  *  - Spark's shuffle hash (Murmur3 via HashPartitioning) replaces the
  *    reference's FNV-1a. Only key co-location is observable in the final
  *    output (the reference test sorts across all mr-out-* files,
  *    src/main/test-mr.sh:103-111), so bucket-layout parity is deliberately
  *    not reproduced; [[graft.functions.fnv1a64]] exists for callers that
  *    want the reference's hash as a column.
  */
final case class MapReduceJob(app: MrApp, nReduce: Int = 10) {

  /** Read a directory (or glob) of text files as (fileName, contents) rows —
    * one row per whole file, like the reference's one-map-task-per-file
    * input split (src/mr/rpc.go:219-228).
    */
  def readWholeFiles(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), col("value").as("contents"))
      .as[(String, String)]
  }

  /** Map phase: flatMap the user mapf over whole files. */
  def mapPhase(files: Dataset[(String, String)]): Dataset[KV] = {
    import files.sparkSession.implicits._
    val f = app
    files.flatMap { case (file, contents) => f.map(file, contents) }
  }

  /** Shuffle + reduce phase: co-locate by key, sort within partitions, scan
    * each sorted partition grouping adjacent equal keys and calling the
    * user reducef with the materialized value list — a line-for-line
    * semantic match of the reference's reduce loop
    * (src/mr/worker.go:181-212) with Spark's shuffle replacing the
    * mr-M-R intermediate files.
    */
  def reducePhase(mapped: Dataset[KV]): Dataset[KV] = {
    import mapped.sparkSession.implicits._
    val f = app
    mapped
      .repartition(nReduce, col("key"))
      .sortWithinPartitions("key")
      .mapPartitions { it =>
        new Iterator[KV] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): KV = {
            val k = buf.head.key
            val values = scala.collection.mutable.ArrayBuffer.empty[String]
            while (buf.hasNext && buf.head.key == k) values += buf.next().value
            KV(k, f.reduce(k, values.toSeq))
          }
        }
      }
  }

  /** Full pipeline as a DataFrame of (key, value). */
  def run(spark: SparkSession, inputPath: String): Dataset[KV] =
    reducePhase(mapPhase(readWholeFiles(spark, inputPath)))

  /** Run over in-memory (file, contents) pairs — used by tests. */
  def runOn(spark: SparkSession, files: Seq[(String, String)]): Dataset[KV] = {
    import spark.implicits._
    reducePhase(mapPhase(spark.createDataset(files)))
  }

  /** Text sink: one `"key value"` line per record, `nReduce` output files.
    * Output visibility relies on Spark's FileOutputCommitter (task-attempt
    * temp dir + rename) — the same atomic-rename, first-writer-wins
    * protocol the reference hand-rolls (src/mr/worker.go:183-216).
    */
  def writeOutput(result: Dataset[KV], outDir: String): Unit =
    result
      .select(concat_ws(" ", col("key"), col("value")).as("value"))
      .repartition(nReduce)
      .write.mode("overwrite").text(outDir)
}

object MapReduceJob {

  /** Single-threaded golden oracle — a direct port of the reference's
    * sequential engine (src/main/mrsequential.go:38-87): map all files,
    * global sort by key, adjacent-group reduce. Returns the output lines
    * ("key value") in key order.
    */
  def sequential(app: MrApp, files: Seq[(String, String)]): Seq[String] = {
    val intermediate = files.flatMap { case (f, c) => app.map(f, c) }
      .sortBy(_.key)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < intermediate.length) {
      var j = i + 1
      while (j < intermediate.length && intermediate(j).key == intermediate(i).key) j += 1
      val values = intermediate.slice(i, j).map(_.value)
      out += s"${intermediate(i).key} ${app.reduce(intermediate(i).key, values)}"
      i = j
    }
    out.toSeq
  }
}
