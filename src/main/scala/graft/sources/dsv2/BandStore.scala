package graft.sources.dsv2

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter, Writer}
import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** `graft-bands`: a DataSource V2 connector for the LSH band store — the
  * (doc_id, band, bkey) table every banded-join dedup consumer probes.
  * The layout is band-major: each writer task emits ONE FILE PER BAND it
  * sees (`b<band>-t<task>-<uuid>.gsb`), so the band a file holds is part
  * of its NAME and a probe for one band (the hot path of an incremental
  * dedup: "give me the store's band-3 buckets") opens only that band's
  * files — the pushed `band = k` / `band IN (...)` predicate prunes at
  * `planInputPartitions`, before a single byte is read. With B bands
  * (8 here) that is a guaranteed 1/B I/O cut per probed band on a store
  * of ANY size, on top of ordinary column pruning (a bkey-only bucket
  * histogram never materializes doc_ids).
  *
  * Commit protocol: writers write straight to uniquely-named final files
  * and report them in their commit messages; the driver's `commit` then
  * writes a `_manifest` listing exactly the committed files (via a
  * temp-file + rename, atomic on HDFS-like filesystems). Readers plan
  * ONLY manifest-listed files, so a torn job — writer files without a
  * manifest row, or an aborted overwrite — is invisible: the previous
  * manifest keeps serving the previous snapshot (the same
  * write-then-publish idea as the reference's temp-file + atomic-rename
  * reduce commit, ref src/mr/worker.go:208-218). `truncate()` (the
  * `mode("overwrite")` path) swaps the manifest and then deletes the
  * orphaned prior generation.
  *
  * Record format: one `doc_id\tbkey` text line per row (band lives in the
  * file name, never repeated in the data); bkey is md5 hex, so the file
  * is pure ASCII and line-splittable. One file = one InputPartition —
  * at 100 TB the band store is O(docs × bands) short rows and each task's
  * per-band file is modest; a single giant file would need the usual
  * maxPartitionBytes-style splitting, which the manifest's recorded
  * lengths support but this implementation keeps whole-file.
  */
object BandStore {
  val ShortName = "graft-bands"
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("bkey", StringType, nullable = false)))
  val ManifestFile = "_manifest"

  private[dsv2] def fs(path: Path, conf: Configuration): FileSystem =
    path.getFileSystem(conf)

  /** Manifest rows: `fileName\tband\tlength`; `#epoch\t<id>` comment rows
    * record committed STREAMING epochs in the same file, so the entry
    * list and the epoch ledger swap in one atomic rename.
    */
  private[dsv2] def readManifest(root: Path, conf: Configuration): Seq[(String, Int, Long)] =
    readManifestFull(root, conf)._1

  private[graft] def readManifestFull(root: Path, conf: Configuration)
      : (Seq[(String, Int, Long)], Set[Long]) = {
    val f = fs(root, conf)
    val m = new Path(root, ManifestFile)
    if (!f.exists(m)) return (Seq.empty, Set.empty)
    val in = new BufferedReader(new InputStreamReader(f.open(m), StandardCharsets.UTF_8))
    try {
      val lines = Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty).toSeq
      val (epochLines, entryLines) = lines.partition(_.startsWith("#epoch\t"))
      val entries = entryLines.map { line =>
        val Array(name, band, len) = line.split("\t", 3)
        (name, band.toInt, len.toLong)
      }
      (entries, epochLines.map(_.split("\t", 2)(1).toLong).toSet)
    } finally in.close()
  }

  private[graft] def writeManifest(root: Path, conf: Configuration,
                                  entries: Seq[(String, Int, Long)],
                                  epochs: Set[Long] = Set.empty): Unit = {
    val f = fs(root, conf)
    f.mkdirs(root)
    val tmp = new Path(root, s"$ManifestFile.tmp-${UUID.randomUUID()}")
    val out = new OutputStreamWriter(f.create(tmp, true), StandardCharsets.UTF_8)
    try {
      epochs.toSeq.sorted.foreach(e => out.write(s"#epoch\t$e\n"))
      entries.foreach { case (n, b, l) => out.write(s"$n\t$b\t$l\n") }
    } finally out.close()
    val target = new Path(root, ManifestFile)
    f.delete(target, false)
    require(f.rename(tmp, target),
      s"band store commit failed: cannot rename $tmp to $target")
  }
}

/** Store maintenance: the epoch-append write path accumulates one file
  * per (band, task, epoch) — correct, but a long-lived streaming ingest
  * turns the store into the classic small-files swamp (every probe pays
  * an open() per file). Compaction merges each band's files back to ~one
  * and publishes through the SAME atomic manifest swap readers already
  * trust, so a racing reader keeps the prior generation end-to-end.
  */
object BandStoreMaintenance {
  import org.apache.spark.sql.SparkSession

  /** Distributed in-place compaction: rows are re-read through the
    * connector, routed by band (one exchange), and each task writes one
    * file per band it holds; the manifest then swaps to exactly the new
    * file set, preserving the epoch ledger (compaction changes LAYOUT,
    * not content — a later epoch replay must still deduplicate). Returns
    * (filesBefore, filesAfter).
    *
    * Concurrency: single-maintainer, like the write path itself. The
    * swap re-reads the manifest and REFUSES to publish if a writer
    * committed since the snapshot — the store is then untouched and the
    * compacted files are unreachable orphans (never wrong reads). A
    * multi-writer deployment needs a CAS'd log (Delta-style) — out of
    * scope for this store.
    */
  def compact(spark: SparkSession, path: String): (Int, Int) = {
    import spark.implicits._
    val root = new Path(path)
    val conf = spark.sessionState.newHadoopConf()
    val (snapshot, _) = BandStore.readManifestFull(root, conf)
    if (snapshot.size <= 1) return (snapshot.size, snapshot.size)
    val sconf = new SerializableConfiguration(conf)
    val written = spark.read.format(BandStore.ShortName).load(path)
      .repartition(org.apache.spark.sql.functions.col("band"))
      .mapPartitions { it =>
        val f = BandStore.fs(new Path(path), sconf.value)
        val open = mutable.Map.empty[Int, (String, Writer)]
        it.foreach { row =>
          val band = row.getInt(row.fieldIndex("band"))
          val (_, w) = open.getOrElseUpdate(band, {
            val name = s"b$band-compact-${UUID.randomUUID()}.gsb"
            (name, new OutputStreamWriter(
              f.create(new Path(new Path(path), name), false),
              StandardCharsets.UTF_8))
          })
          w.write(s"${row.getLong(row.fieldIndex("doc_id"))}\t" +
            s"${row.getString(row.fieldIndex("bkey"))}\n")
        }
        open.values.foreach(_._2.close())
        open.iterator.map { case (band, (name, _)) =>
          (name, band,
            f.getFileStatus(new Path(new Path(path), name)).getLen)
        }
      }.collect().toSeq // O(bands) rows — driver-adjacent by construction
    val (current, epochs) = BandStore.readManifestFull(root, conf)
    require(current.map(_._1).toSet == snapshot.map(_._1).toSet,
      s"a writer committed to $path during compaction — aborting with the " +
        "manifest untouched (the compacted files are unreachable orphans); " +
        "rerun when the store is quiescent")
    BandStore.writeManifest(root, conf, written, epochs)
    val f = BandStore.fs(root, conf)
    snapshot.foreach { case (n, _, _) => f.delete(new Path(root, n), false) }
    (snapshot.size, written.size)
  }
}

class BandStoreSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = BandStore.ShortName
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BandStore.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    require(schema == BandStore.Schema,
      s"graft-bands has the fixed schema ${BandStore.Schema.simpleString}; " +
        s"got ${schema.simpleString}")
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "graft-bands requires a path")
    new BandStoreTable(path)
  }
}

class BandStoreTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"${BandStore.ShortName}($path)"
  override def schema(): StructType = BandStore.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BandScanBuilder(path,
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new BandWriteBuilder(path, info.schema(),
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
}

// ---------------------------------------------------------------- read side

class BandScanBuilder(path: String, conf: Configuration)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushedBandFilters: Array[Filter] = Array.empty
  private var required: StructType = BandStore.Schema

  /** Accept (fully absorb) band predicates the file layout can answer
    * exactly — `band = k` and `band IN (...)` prune to the named bands'
    * files with no false drops, so Spark need not re-check them. Anything
    * else (doc_id/bkey predicates, other shapes) is returned for Spark to
    * evaluate post-scan.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (bands, rest) = filters.partition {
      case EqualTo("band", _: Int) => true
      case In("band", vs) => vs.forall(_.isInstanceOf[Int])
      case _ => false
    }
    pushedBandFilters = bands
    rest
  }
  override def pushedFilters(): Array[Filter] = pushedBandFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new BandScan(path, conf, pushedBandFilters, required)
}

class BandScan(path: String, conf: Configuration, pushed: Array[Filter],
               required: StructType) extends Scan with Batch
    with SupportsReportStatistics {
  override def readSchema(): StructType = required

  private def bandAdmitted(band: Int): Boolean = pushed.forall {
    case EqualTo("band", v: Int) => band == v
    case In("band", vs) => vs.contains(band)
    case _ => true
  }

  private lazy val (kept, total) = {
    val all = BandStore.readManifest(new Path(path), conf)
    (all.filter(e => bandAdmitted(e._2)), all.size)
  }

  override def description(): String = {
    val bands = kept.map(_._2).distinct.sorted
    s"graft-bands path=$path PushedBandFilters=${pushed.mkString("[", ",", "]")} " +
      s"bands=${bands.mkString("[", ",", "]")} files=${kept.size}/$total"
  }

  override def toBatch: Batch = this

  /** Post-pruning size from the manifest's recorded file lengths — so
    * Catalyst's join planning sees the PROBED bands' bytes, not the whole
    * store's: a one-band probe of a huge store stays broadcast-eligible.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(kept.map(_._3).sum)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty() // line count unknown without a read
  }

  override def planInputPartitions(): Array[InputPartition] =
    kept.map { case (name, band, len) =>
      BandFilePartition(new Path(new Path(path), name).toString, band, len)
        : InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new BandReaderFactory(new SerializableConfiguration(conf), required)
}

case class BandFilePartition(file: String, band: Int, length: Long)
    extends InputPartition

class BandReaderFactory(conf: SerializableConfiguration, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BandFileReader(partition.asInstanceOf[BandFilePartition], conf.value, required)
}

/** Streams one band file; emits only the pruned columns. The band column
  * is served from the partition metadata (file name), never parsed.
  */
class BandFileReader(part: BandFilePartition, conf: Configuration,
                     required: StructType) extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(part.file)
    new BufferedReader(new InputStreamReader(
      BandStore.fs(p, conf).open(p), StandardCharsets.UTF_8))
  }
  // one extractor per required column, bound once (not per row)
  private val extract: Array[(String) => Any] = required.fields.map { f =>
    f.name match {
      case "doc_id" => (line: String) =>
        java.lang.Long.parseLong(line.substring(0, line.indexOf('\t')))
      case "band" => (_: String) => part.band
      case "bkey" => (line: String) =>
        UTF8String.fromString(line.substring(line.indexOf('\t') + 1))
      case other => throw new IllegalArgumentException(
        s"graft-bands has no column '$other'")
    }
  }
  private var line: String = _

  override def next(): Boolean = { line = in.readLine(); line != null }
  override def get(): InternalRow =
    new GenericInternalRow(extract.map(_(line)).toArray[Any])
  override def close(): Unit = in.close()
}

// --------------------------------------------------------------- write side

class BandWriteBuilder(path: String, inputSchema: StructType, conf: Configuration)
    extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new BandBatchWrite(path, inputSchema, overwrite,
        new SerializableConfiguration(conf))
    override def toStreaming: StreamingWrite = {
      require(!overwrite,
        "graft-bands streams in append mode only (a band store is an " +
          "accumulating corpus index; complete-mode rewrites don't apply)")
      new BandStreamingWrite(path, inputSchema,
        new SerializableConfiguration(conf))
    }
  }
}

case class BandCommitMessage(files: Seq[(String, Int, Long)])
    extends WriterCommitMessage

class BandBatchWrite(path: String, inputSchema: StructType, overwrite: Boolean,
                     conf: SerializableConfiguration) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new BandWriterFactory(path, inputSchema, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.toSeq.flatMap {
      case BandCommitMessage(files) => files
    }
    val root = new Path(path)
    val hconf = conf.value
    val (prior, epochs) = BandStore.readManifestFull(root, hconf)
    val entries = if (overwrite) committed else prior ++ committed
    // overwrite resets the streaming-epoch ledger (new store generation);
    // append preserves it so a later epoch replay still deduplicates
    BandStore.writeManifest(root, hconf, entries,
      if (overwrite) Set.empty else epochs)
    if (overwrite) {
      // the new manifest is live; the previous generation's files are
      // unreachable — delete them (a crash between rename and here only
      // leaks files, never corrupts reads)
      val f = BandStore.fs(root, hconf)
      val keep = committed.map(_._1).toSet
      prior.map(_._1).filterNot(keep)
        .foreach(n => f.delete(new Path(root, n), false))
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val f = BandStore.fs(root, conf.value)
    messages.foreach {
      case BandCommitMessage(files) =>
        files.foreach { case (n, _, _) => f.delete(new Path(root, n), false) }
      case _ =>
    }
  }
}

class BandWriterFactory(path: String, inputSchema: StructType,
                        conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new BandDataWriter(path, inputSchema, partitionId, taskId, conf.value)
}

/** Streaming (micro-batch) append into the band store. Writers are the
  * batch writers with an epoch tag in the file name; the driver-side
  * epoch commit is IDEMPOTENT through the manifest's epoch ledger: a
  * replayed epoch (Structured Streaming re-runs an epoch whose commit
  * outcome is unknown after a failure) finds its id already recorded,
  * discards the duplicate attempt's files, and leaves the manifest
  * untouched — the store never double-counts a micro-batch, which is the
  * exactly-once contract a dedup index needs (a duplicated band row
  * would only cost work, but a duplicated STORE GENERATION of the same
  * batch would pair every doc with itself at the next probe).
  */
class BandStreamingWrite(path: String, inputSchema: StructType,
                         conf: SerializableConfiguration) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new BandStreamingWriterFactory(path, inputSchema, conf)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.toSeq.flatMap {
      case BandCommitMessage(files) => files
    }
    val root = new Path(path)
    val hconf = conf.value
    val (prior, epochs) = BandStore.readManifestFull(root, hconf)
    if (epochs.contains(epochId)) {
      // replayed epoch: the first attempt's files are live — drop ours
      val f = BandStore.fs(root, hconf)
      committed.foreach { case (n, _, _) => f.delete(new Path(root, n), false) }
    } else {
      BandStore.writeManifest(root, hconf, prior ++ committed,
        epochs + epochId)
    }
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val f = BandStore.fs(root, conf.value)
    messages.foreach {
      case BandCommitMessage(files) =>
        files.foreach { case (n, _, _) => f.delete(new Path(root, n), false) }
      case _ =>
    }
  }
}

class BandStreamingWriterFactory(path: String, inputSchema: StructType,
                                 conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new BandDataWriter(path, inputSchema, partitionId, taskId, conf.value,
      tag = s"e$epochId-")
}

/** Routes rows to one open file per band value seen by this task. Band
  * cardinality is the LSH parameter B (8), so at most B small files and
  * B open handles per task regardless of row count.
  */
class BandDataWriter(path: String, inputSchema: StructType, partitionId: Int,
                     taskId: Long, conf: Configuration, tag: String = "")
    extends DataWriter[InternalRow] {
  private val idxDoc = inputSchema.fieldIndex("doc_id")
  private val idxBand = inputSchema.fieldIndex("band")
  private val idxBkey = inputSchema.fieldIndex("bkey")
  private val root = new Path(path)
  private val filesys = BandStore.fs(root, conf)
  filesys.mkdirs(root)
  private val open = mutable.Map.empty[Int, (String, Writer)]

  override def write(row: InternalRow): Unit = {
    val band = row.getInt(idxBand)
    val (_, w) = open.getOrElseUpdate(band, {
      val name = s"b$band-${tag}p$partitionId-t$taskId-${UUID.randomUUID()}.gsb"
      (name, new OutputStreamWriter(
        filesys.create(new Path(root, name), false), StandardCharsets.UTF_8))
    })
    w.write(s"${row.getLong(idxDoc)}\t${row.getUTF8String(idxBkey)}\n")
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_._2.close())
    val files = open.toSeq.map { case (band, (name, _)) =>
      (name, band, filesys.getFileStatus(new Path(root, name)).getLen)
    }
    BandCommitMessage(files)
  }

  override def abort(): Unit = {
    open.values.foreach(v => scala.util.Try(v._2.close()))
    open.values.foreach(v => filesys.delete(new Path(root, v._1), false))
  }

  override def close(): Unit =
    open.values.foreach(v => scala.util.Try(v._2.close()))
}
