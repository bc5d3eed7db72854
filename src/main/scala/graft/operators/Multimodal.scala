package graft.operators

import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Multimodal-column plumbing: media payloads ride through the pipeline as
  * opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction runs batched per partition (`mapPartitions`), the
  * Scala analog of a Pandas-batch UDF — one decoder instance per partition,
  * vectorized batches, no per-row interpreter round-trips.
  *
  * The container has no image/audio codecs, so [[DecodeStub]] is a
  * clearly-marked STUB: it derives deterministic fake (width, height,
  * frames) from the payload hash. The Spark-side plumbing — binary schema,
  * partition-batched decode, typed Dataset boundary, metadata extraction —
  * is real and oracle-checked (the stub formula is reproducible in SQL).
  *
  * Scale notes: payload bytes never reach the driver; metadata extraction
  * is scan-stage-only (no shuffle); a real decoder slots into
  * [[DecodeStub.decode]] without touching the plan shape. For very large
  * media, store payloads out-of-line (object store) and keep only
  * references + metadata in the column — the same schema works.
  */
object Multimodal {

  /** A media row as carried through the pipeline. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)

  /** Typed decode result (the fake decoder's output schema). */
  final case class MediaMeta(doc_id: Long, media_type: String, size_bytes: Int,
                             payload_md5: String, width: Int, height: Int, n_frames: Int)

  /** STUB decoder: a real implementation would decode image/audio bytes
    * here (one codec instance per partition). This one derives fields from
    * the payload md5 so results are deterministic and SQL-checkable.
    */
  object DecodeStub {
    def decode(r: MediaRow): MediaMeta = {
      val md5hex = MessageDigest.getInstance("MD5").digest(r.payload)
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md5hex.take(15), 16)
      MediaMeta(
        doc_id = r.doc_id,
        media_type = r.media_type,
        size_bytes = r.payload.length,
        payload_md5 = md5hex,
        width = (160 + h % 480).toInt,
        height = (120 + (h / 480) % 360).toInt,
        n_frames = (1 + h % 30).toInt)
    }
  }

  /** Synthesize a binary payload column from the documents table (stand-in
    * for real media bytes; the pipeline downstream is payload-agnostic).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      concat(lit("text/plain;lang="), col("lang")).as("media_type"))

  /** Partition-batched decode: Dataset[MediaRow] -> Dataset[MediaMeta].
    * mapPartitions so a real decoder amortizes init per partition.
    */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(DecodeStub.decode) }
  }

  /** Column-only metadata (no decode): size, content hash, magic sniff. */
  def extractMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      octet_length(col("payload")).as("size_bytes"),
      md5(col("payload")).as("payload_md5"),
      substring(decode(col("payload"), "UTF-8"), 1, 8).as("magic"))

  /** Frame sampling: every `step`-th frame of each decoded media row,
    * 1 row -> n_frames/step rows. The frame "payload" is a deterministic
    * stub hash (a real pipeline would carry the decoded frame bytes or an
    * object-store reference); the explosion shape — generate indices on
    * the row, THEN explode — keeps the pre-shuffle row count at
    * O(sampled frames), never materializing unsampled ones.
    */
  def sampleFrames(decoded: DataFrame, step: Int = 4): DataFrame =
    decoded
      // sequence(0, -1, step) is a runtime error, not an empty array — a
      // zero-frame row (possible with a real decoder) must yield no
      // sampled frames, not kill the query
      .filter(col("n_frames") > 0)
      .select(
        col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
      .withColumn("frame_ref",
        md5(concat(col("doc_id").cast("string"), lit("#"), col("frame_idx").cast("string"))))

  /** Resize plan: fit (width, height) into a `box` square preserving aspect
    * ratio — pure integer column math (exact in any engine). Emits the
    * target dimensions a batched GPU/codec stage would consume; upscaling
    * is clamped (scale factor <= 1).
    */
  def resizePlan(decoded: DataFrame, box: Int = 224): DataFrame = {
    // integer `div`, not `/`: Spark's `/` on integers is double division,
    // and the oracle's `//` is integral — keep both sides exact
    def fit(c: String) =
      expr(s"CASE WHEN greatest(width, height) <= $box THEN $c " +
        s"ELSE CAST(($c * $box) div greatest(width, height) AS INT) END")
    decoded.select(
      col("doc_id"), col("width"), col("height"),
      fit("width").cast("int").as("out_w"),
      fit("height").cast("int").as("out_h"))
  }

  // --- driver-checked query surface ---

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> ((s, d) =>
      extractMeta(withPayload(Tables.load(s, d, "documents"))).orderBy("doc_id")),
    "mm_decode_stub" -> ((s, d) => {
      import s.implicits._
      decodeAll(withPayload(Tables.load(s, d, "documents")).as[MediaRow])
        .toDF().orderBy("doc_id")
    }),
    "mm_frame_sample" -> ((s, d) => {
      import s.implicits._
      sampleFrames(decodeAll(withPayload(Tables.load(s, d, "documents")).as[MediaRow]).toDF())
        .orderBy("doc_id", "frame_idx")
    }),
    "mm_resize" -> ((s, d) => {
      import s.implicits._
      resizePlan(decodeAll(withPayload(Tables.load(s, d, "documents")).as[MediaRow]).toDF())
        .orderBy("doc_id")
    }),
  )

  // the stub decode fields, as the oracle derives them (same md5-prefix h)
  private val H =
    """SELECT doc_id,
      | CAST(160 + h % 480 AS INTEGER) AS width,
      | CAST(120 + (h // 480) % 360 AS INTEGER) AS height,
      | CAST(1 + h % 30 AS INTEGER) AS n_frames
      |FROM (SELECT doc_id,
      |        CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
      |      FROM documents)""".stripMargin

  def oracle: Map[String, String] = Map(
    "mm_frame_sample" ->
      s"""SELECT doc_id, n_frames, CAST(f AS INTEGER) AS frame_idx,
         | md5(concat(CAST(doc_id AS VARCHAR), '#', CAST(f AS VARCHAR))) AS frame_ref
         |FROM (SELECT doc_id, n_frames, unnest(range(0, n_frames, 4)) AS f
         |      FROM ($H))
         |ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_resize" ->
      s"""SELECT doc_id, width, height,
         | CAST(CASE WHEN greatest(width, height) <= 224 THEN width
         |           ELSE (width * 224) // greatest(width, height) END AS INTEGER) AS out_w,
         | CAST(CASE WHEN greatest(width, height) <= 224 THEN height
         |           ELSE (height * 224) // greatest(width, height) END AS INTEGER) AS out_h
         |FROM ($H) ORDER BY doc_id""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id, concat('text/plain;lang=', lang) AS media_type,
        | CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS size_bytes,
        | md5(text) AS payload_md5,
        | substr(text, 1, 8) AS magic
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_decode_stub" ->
      """SELECT doc_id, concat('text/plain;lang=', lang) AS media_type,
        | CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS size_bytes,
        | md5(text) AS payload_md5,
        | CAST(160 + h % 480 AS INTEGER) AS width,
        | CAST(120 + (h // 480) % 360 AS INTEGER) AS height,
        | CAST(1 + h % 30 AS INTEGER) AS n_frames
        |FROM (SELECT doc_id, lang, text,
        |        CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS h
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
  )
}
