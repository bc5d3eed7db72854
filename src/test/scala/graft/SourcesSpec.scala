package graft

import graft.sources.Sources
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The format round-trips gate (src_jsonl / src_csv): the engine-independent
  * invariant is that the fidelity summary AFTER write→read through the text
  * format equals the summary of the decorated frame computed directly —
  * DuckDB parity of the summary construction itself is the driver's job.
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def direct() =
    Sources.fidelitySummary(
      Sources.decorate(Tables.load(spark, TestSpark.sf0001, "documents")))
      .collect().map(_.toString).toSeq

  test("decoration actually injects the adversarial characters") {
    val dec = Sources.decorate(Tables.load(spark, TestSpark.sf0001, "documents"))
    val n = dec.agg(
      sum(when(col("text").contains("\n"), 1).otherwise(0)),
      sum(when(col("text").contains(","), 1).otherwise(0)),
      sum(when(col("text").startsWith("\""), 1).otherwise(0)),
      sum(when(col("text").contains("π"), 1).otherwise(0))).head()
    assert(n.getLong(0) > 0, "no newline docs")
    assert(n.getLong(1) > 0, "no comma docs")
    assert(n.getLong(2) > 0, "no quoted docs")
    assert(n.getLong(3) > 0, "no non-ASCII docs")
  }

  test("JSONL round-trip is lossless under newlines/quotes/commas/unicode") {
    assert(Sources.jsonlRoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq === direct())
  }

  test("CSV round-trip is lossless under newlines/quotes/commas/unicode") {
    assert(Sources.csvRoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq === direct())
  }

  test("ORC round-trip is lossless under newlines/quotes/commas/unicode") {
    assert(Sources.orcRoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq === direct())
  }

  test("zstd parquet round-trip is lossless AND actually used the codec") {
    assert(Sources.zstdRoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq === direct())
    // tripwire: the data files must really be zstd pages, not a silently
    // ignored option falling back to snappy
    val dir = java.nio.file.Files.createTempDirectory("graft-zstd-probe")
    Tables.load(spark, TestSpark.sf0001, "documents").limit(5)
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(dir.toString)
    val parts = java.nio.file.Files.list(dir).filter(
      _.getFileName.toString.endsWith(".parquet"))
      .map[String](_.getFileName.toString)
      .toArray(new Array[String](_))
    assert(parts.nonEmpty && parts.forall(_.contains("zstd")),
      s"data files carry the zstd codec suffix: ${parts.mkString(",")}")
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  // ------------------------------------------------ graft-bands DSv2

  private def bandsFrame() =
    graft.operators.Dedup.bandsOf(graft.operators.Dedup.minhashSignatures(
      Tables.load(spark, TestSpark.sf0001, "documents")))

  test("graft-bands DSv2: full unfiltered read-back equals the band frame") {
    val out = TestSpark.tempDir("graft-dsv2-full").toString
    val bands = bandsFrame()
    bands.write.format("graft-bands").mode("overwrite").save(out)
    val back = spark.read.format("graft-bands").load(out)
    val key = (r: org.apache.spark.sql.Row) =>
      s"${r.getLong(0)}|${r.getInt(1)}|${r.getString(2)}"
    val wrote = bands.select(col("doc_id"), col("band").cast("int"), col("bkey"))
      .collect().map(key).sorted
    val read = back.select("doc_id", "band", "bkey").collect().map(key).sorted
    assert(read.length === wrote.length)
    assert(read === wrote)
  }

  test("graft-bands DSv2: band predicates prune files at planInputPartitions") {
    val out = TestSpark.tempDir("graft-dsv2-prune").toString
    bandsFrame().write.format("graft-bands").mode("overwrite").save(out)
    val pruned = spark.read.format("graft-bands").load(out)
      .filter(col("band") === 3)
    val p = pruned.queryExecution.executedPlan.toString
    // the connector's scan description pins both the absorbed predicate
    // and the file-level pruning (8 bands -> only band 3's files planned)
    assert(p.contains("PushedBandFilters=[EqualTo(band,3)]"), p)
    assert(p.contains("bands=[3]"), p)
    val filesRe = """files=(\d+)/(\d+)""".r
    val m = filesRe.findFirstMatchIn(p)
    assert(m.isDefined, s"no files=kept/total in scan description: $p")
    assert(m.get.group(1).toInt < m.get.group(2).toInt,
      s"no files pruned: ${m.get.matched}")
    // and the pruned read still returns exactly band 3's rows
    val expect = bandsFrame().filter(col("band") === 3).count()
    assert(pruned.count() === expect)
  }

  test("graft-bands DSv2: overwrite swaps the manifest atomically and " +
    "reaps the prior generation; uncommitted files are invisible") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val out = TestSpark.tempDir("graft-dsv2-commit").toString
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("band", IntegerType), StructField("bkey", StringType)))
    def frame(rows: Seq[(Long, Int, String)]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 2),
        schema)
    frame(Seq((1L, 0, "aa"), (2L, 1, "bb"), (3L, 1, "bc")))
      .write.format("graft-bands").mode("overwrite").save(out)
    val gen1Files = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .map[String](_.getFileName.toString).toArray(new Array[String](_))
      .filter(_.endsWith(".gsb")).toSet
    // a torn writer file with no manifest row must be invisible to readers
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, "b0-p9-t9-dead.gsb"),
      "99\tzz\n".getBytes("UTF-8"))
    assert(spark.read.format("graft-bands").load(out).count() === 3)
    // second generation replaces the first
    frame(Seq((7L, 2, "cc"))).write.format("graft-bands")
      .mode("overwrite").save(out)
    val back = spark.read.format("graft-bands").load(out).collect()
    assert(back.length === 1 && back(0).getLong(0) === 7L)
    // generation-1 data files were reaped after the manifest swap
    val left = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .map[String](_.getFileName.toString).toArray(new Array[String](_))
      .filter(_.endsWith(".gsb")).toSet
    assert(gen1Files.intersect(left).isEmpty,
      s"prior generation not reaped: ${gen1Files.intersect(left)}")
  }

  test("graft-bands DSv2: column pruning reaches the reader") {
    val out = TestSpark.tempDir("graft-dsv2-cols").toString
    bandsFrame().write.format("graft-bands").mode("overwrite").save(out)
    val only = spark.read.format("graft-bands").load(out).select("bkey")
    // V2 column pruning rewrites the scan's read schema — the plan's
    // BatchScan output must carry ONLY bkey
    val scan = only.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scan.isDefined, only.queryExecution.executedPlan.toString)
    assert(scan.get.scan.readSchema().fieldNames.toSeq === Seq("bkey"),
      scan.get.scan.readSchema().simpleString)
    assert(only.distinct().count() > 0)
  }

  test("graft-bands DSv2 streaming append equals the batch build") {
    // the stream-ingested store and the batch-built store must publish
    // identical probed-band summaries (this is also what the shared
    // src_dsv2 / src_dsv2_stream oracle asserts against DuckDB)
    val batch = Sources.dsv2RoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq
    val streamed = Sources.dsv2StreamRoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq
    assert(streamed === batch)
  }

  test("graft-bands streaming commit is epoch-idempotent (replay discards " +
    "the duplicate attempt)") {
    import graft.sources.dsv2._
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val out = TestSpark.tempDir("graft-dsv2-epoch").toString
    val conf = spark.sessionState.newHadoopConf()
    val sw = new BandWriteBuilder(out, graft.sources.dsv2.BandStore.Schema, conf)
      .build().toStreaming
    val fac = sw.createStreamingWriterFactory(null)
    def writeEpoch(epoch: Long, docId: Long): Array[
        org.apache.spark.sql.connector.write.WriterCommitMessage] = {
      val w = fac.createWriter(0, 0L, epoch)
      w.write(new GenericInternalRow(
        Array[Any](docId, 4, UTF8String.fromString("k" + docId))))
      Array(w.commit())
    }
    sw.commit(11L, writeEpoch(11L, 1L))
    assert(spark.read.format("graft-bands").load(out).count() === 1)
    // Structured Streaming replays an epoch whose commit outcome was
    // unknown: same epoch id, fresh task attempt, fresh files
    sw.commit(11L, writeEpoch(11L, 1L))
    assert(spark.read.format("graft-bands").load(out).count() === 1,
      "replayed epoch must not double-commit")
    // the duplicate attempt's orphan files are deleted, not just hidden
    val gsb = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .map[String](_.getFileName.toString).toArray(new Array[String](_))
      .filter(_.endsWith(".gsb"))
    assert(gsb.length === 1, s"orphan files not reaped: ${gsb.mkString(",")}")
    // a NEW epoch appends normally
    sw.commit(12L, writeEpoch(12L, 2L))
    assert(spark.read.format("graft-bands").load(out).count() === 2)
    // batch APPEND preserves the epoch ledger: replaying epoch 12 after a
    // batch append must still deduplicate
    val extra = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(9L, 0, "zz")), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("band",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("bkey",
          org.apache.spark.sql.types.StringType))))
    extra.write.format("graft-bands").mode("append").save(out)
    sw.commit(12L, writeEpoch(12L, 2L))
    assert(spark.read.format("graft-bands").load(out).count() === 3,
      "epoch ledger lost across a batch append")
  }

  test("graft-bands compaction merges per-band files, preserves content " +
    "and the epoch ledger, reaps the old generation") {
    import graft.sources.dsv2.{BandStore, BandStoreMaintenance}
    val out = TestSpark.tempDir("graft-dsv2-compact").toString
    val bands = bandsFrame()
    // three append generations (multi-partition writes) = many small files
    bands.write.format("graft-bands").mode("overwrite").save(out)
    bands.filter(col("doc_id") % 2 === 0).select(col("doc_id") + 100000,
        col("band"), col("bkey"))
      .toDF("doc_id", "band", "bkey")
      .write.format("graft-bands").mode("append").save(out)
    bands.filter(col("doc_id") % 2 === 1).select(col("doc_id") + 200000,
        col("band"), col("bkey"))
      .toDF("doc_id", "band", "bkey")
      .write.format("graft-bands").mode("append").save(out)
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(out)
    // plant an epoch marker to prove the ledger survives the swap
    val (pre, _) = BandStore.readManifestFull(root, conf)
    BandStore.writeManifest(root, conf, pre, Set(41L))
    val before = spark.read.format("graft-bands").load(out)
      .collect().map(_.toString).sorted
    val (nBefore, nAfter) = BandStoreMaintenance.compact(spark, out)
    assert(nAfter < nBefore, s"no compaction: $nBefore -> $nAfter")
    val after = spark.read.format("graft-bands").load(out)
      .collect().map(_.toString).sorted
    assert(after === before, "compaction changed the store's content")
    val (entries, epochs) = BandStore.readManifestFull(root, conf)
    assert(entries.size === nAfter)
    assert(epochs === Set(41L), "epoch ledger lost in compaction swap")
    // old generation reaped: only manifest-listed files remain on disk
    val onDisk = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      .map[String](_.getFileName.toString).toArray(new Array[String](_))
      .filter(_.endsWith(".gsb")).toSet
    assert(onDisk === entries.map(_._1).toSet,
      s"orphans or missing files after compact: $onDisk vs manifest")
  }

  // ------------------------------------------------ embedded JDBC (Derby)

  test("JDBC (embedded Derby) round-trip is lossless under the " +
    "adversarial decoration") {
    assert(Sources.jdbcRoundTrip(spark, TestSpark.sf0001)
      .collect().map(_.toString).toSeq === direct())
  }

  test("JDBC read pushes predicates to the database and stripes by doc_id") {
    val url = s"jdbc:derby:memory:graftpush;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    Tables.load(spark, TestSpark.sf0001, "documents")
      .select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").jdbc(url, "docs_push", props)
    val back = spark.read
      .option("partitionColumn", "doc_id").option("numPartitions", "4")
      .option("lowerBound", "0").option("upperBound", "1000")
      .jdbc(url, "docs_push", props)
      .filter(col("n_chars") > 100)
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("n_chars"),
      s"filter not pushed to JDBC source:\n$p")
    assert(back.rdd.getNumPartitions === 4,
      "stride predicates did not partition the JDBC read")
  }

}
