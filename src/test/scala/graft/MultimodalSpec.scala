package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{HeaderDecoder, HeaderMeta, MediaFile}
import graft.tables.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Header-decoder spec. The fixtures below are REAL container bytes
  * (a canonical 1x1 PNG, a hand-assembled baseline JPEG with the segment
  * layout a camera would emit, a GIF89a screen descriptor, a WAV with an
  * interleaved LIST chunk) — they pin the parsers to the published specs
  * independently of [[Multimodal.synthesize]], so a synthesis/parse bug
  * pair that cancels out in the oracle round-trip still fails here.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // -- real-file fixtures ---------------------------------------------------

  test("PNG: canonical 1x1 RGBA file parses per spec") {
    // a genuine minimal PNG (signature + IHDR + IDAT + IEND)
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")
    val m = HeaderDecoder.decode(MediaFile(7L, png))
    assert(m === HeaderMeta(7L, "png", Some(1), Some(1),
      bit_depth = 8, channels = 4, sample_rate = None, n_samples = None))
  }

  test("JPEG: marker scan skips APP/DQT/COM segments and fill bytes to SOF") {
    def be16(v: Int) = Array((v >> 8).toByte, v.toByte)
    val b = Array.concat(
      Array(0xff, 0xd8).map(_.toByte),                       // SOI
      Array(0xff, 0xe1).map(_.toByte), be16(8),              // APP1 (Exif-ish)
      Array[Byte]('E', 'x', 'i', 'f', 0, 0),
      Array(0xff, 0xfe).map(_.toByte), be16(4), "hi".getBytes, // COM
      Array(0xff, 0xdb).map(_.toByte), be16(5), Array[Byte](0, 1, 2), // DQT
      Array(0xff, 0xff).map(_.toByte),                       // fill byte run
      Array(0xc2).map(_.toByte), be16(11),                   // SOF2 progressive
      Array[Byte](8), be16(480), be16(640), Array[Byte](1),
      Array[Byte](1, 0x11, 0))
    val m = HeaderDecoder.decode(MediaFile(8L, b))
    assert(m === HeaderMeta(8L, "jpeg", Some(640), Some(480),
      bit_depth = 8, channels = 1, sample_rate = None, n_samples = None))
  }

  test("GIF: little-endian screen descriptor + colour-resolution bits") {
    val b = Array.concat(
      "GIF89a".getBytes("US-ASCII"),
      Array[Byte](0x03, 0x01),  // width 259 LE
      Array[Byte](0x02, 0x00),  // height 2 LE
      Array(0xb1).map(_.toByte), // flags: GCT + colour res (3+1) bits
      Array[Byte](0, 0))
    val m = HeaderDecoder.decode(MediaFile(9L, b))
    assert(m === HeaderMeta(9L, "gif", Some(259), Some(2),
      bit_depth = 4, channels = 1, sample_rate = None, n_samples = None))
  }

  test("WAV: RIFF chunk walk crosses a LIST chunk to fmt/data") {
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val b = Array.concat(
      "RIFF".getBytes, le32(1000), "WAVE".getBytes,
      "LIST".getBytes, le32(5), Array[Byte]('I', 'N', 'F', 'O', 'x'), Array[Byte](0), // odd size -> pad
      "fmt ".getBytes, le32(16), le16(1), le16(2), le32(44100),
      le32(44100 * 4), le16(4), le16(16),
      "data".getBytes, le32(44100 * 4 * 2)) // 2 s stereo declared, stored out-of-line
    val m = HeaderDecoder.decode(MediaFile(10L, b))
    assert(m === HeaderMeta(10L, "wav", None, None,
      bit_depth = 16, channels = 2, sample_rate = Some(44100), n_samples = Some(88200)))
  }

  test("WAV sample stats: signed int16 pairing, declared-size cap, non-RIFF skip") {
    import spark.implicits._
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def wav(id: Long, declared: Int, samples: Array[Byte]) = MediaFile(id,
      Array.concat("RIFF".getBytes, le32(36 + declared), "WAVE".getBytes,
        "fmt ".getBytes, le32(16), le16(1), le16(1), le32(8000),
        le32(16000), le16(2), le16(16),
        "data".getBytes, le32(declared), samples))
    // samples: 100, -2, -32768 (little-endian int16)
    val pcm = Array.concat(le16(100), le16(0xfffe), le16(0x8000))
    val media = Seq(
      wav(1L, 6, pcm),                      // exact
      wav(2L, 4, pcm),                      // declared caps at 2 samples
      wav(3L, 100, pcm),                    // truncated file: 3 available
      MediaFile(4L, "GIF89a".getBytes ++ Array.fill(20)(0.toByte))) // skipped
    val got = Multimodal.audioSampleStats(media.toDS()).collect()
      .map(a => a.doc_id -> ((a.n_samples, a.sum_amp, a.sum_sq, a.peak))).toMap
    assert(got(1L) === ((3L, 100L - 2L - 32768L,
      100L * 100 + 4 + 32768L * 32768L, 32768)))
    assert(got(2L) === ((2L, 98L, 10004L, 100)))
    assert(got(3L) === ((3L, got(1L)._2, got(1L)._3, 32768)))
    assert(!got.contains(4L))
  }

  test("audio autocorrelation: planted period-4 tone peaks at r4, anti-peaks at r2") {
    import spark.implicits._
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // 32 samples of the period-4 square-ish tone A, 0, -A, 0, ...
    val a = 1000
    val tone = Array.tabulate(32)(i => (i % 4) match {
      case 0 => a; case 1 => 0; case 2 => -a; case _ => 0
    })
    val pcm = tone.flatMap(v => le16(v & 0xffff))
    val media = Seq(Multimodal.MediaFile(1L,
      Array.concat("RIFF".getBytes, le32(36 + pcm.length), "WAVE".getBytes,
        "fmt ".getBytes, le32(16), le16(1), le16(1), le32(8000),
        le32(16000), le16(2), le16(16),
        "data".getBytes, le32(pcm.length), pcm)))
    val r = Multimodal.audioAutocorr(media.toDS()).collect().head
    // exact expectations (count the nonzero-product index pairs): lag 4
    // aligns the tone with itself (14 surviving ±a·±a pairs, all +a²),
    // lag 2 anti-aligns (15 pairs, all −a²), odd lags interleave zeros
    assert(r.n_samples === 32L)
    assert(r.r0 === 16L * a * a)
    assert(r.r4 === 14L * a * a, "lag 4 must align with the period")
    assert(r.r2 === -15L * a * a, "lag 2 must anti-align")
    assert(r.r1 === 0L && r.r8 === 12L * a * a)
  }

  test("silence segmentation: planted runs count, cap, and threshold edges") {
    import spark.implicits._
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // loud(L)=20000, silent(s)=5 — layout: L s s s s L s s s L s s s s s
    // run lengths 4 (counts), 3 (too short), 5-at-tail (counts)
    val vals = Array(20000, 5, 5, 5, 5, 20000, 5, 5, 5, 20000, 5, 5, 5, 5, 5)
    // 9999 is silent, 10000 is not (strict |v| < 10000); negatives count
    val edge = Array(9999, -9999, 10000, -10000)
    def wav(id: Long, vs: Array[Int]) = {
      val pcm = vs.flatMap(v => le16(v & 0xffff))
      Multimodal.MediaFile(id,
        Array.concat("RIFF".getBytes, le32(36 + pcm.length), "WAVE".getBytes,
          "fmt ".getBytes, le32(16), le16(1), le16(1), le32(8000),
          le32(16000), le16(2), le16(16),
          "data".getBytes, le32(pcm.length), pcm))
    }
    val got = Multimodal.audioSilence(Seq(wav(1L, vals), wav(2L, edge)).toDS())
      .collect().map(a =>
        a.doc_id -> ((a.n_samples, a.n_silent, a.n_runs, a.longest_run))).toMap
    assert(got(1L) === ((15L, 12L, 2L, 5L)))
    assert(got(2L) === ((4L, 2L, 0L, 2L)))
  }

  test("zero-crossing rate: strict sign flips only; zeros break a crossing") {
    import spark.implicits._
    def le16(v: Int) = Array(v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def wav(id: Long, vs: Array[Int]) = {
      val pcm = vs.flatMap(v => le16(v & 0xffff))
      Multimodal.MediaFile(id,
        Array.concat("RIFF".getBytes, le32(36 + pcm.length), "WAVE".getBytes,
          "fmt ".getBytes, le32(16), le16(1), le16(1), le32(8000),
          le32(16000), le16(2), le16(16),
          "data".getBytes, le32(pcm.length), pcm))
    }
    // alternating ±a: every adjacent pair crosses (7 crossings / 8 samples)
    val alt = Array(5, -5, 5, -5, 5, -5, 5, -5)
    // zeros interposed: v·next = 0 is NOT a crossing (the strict rule)
    val zeros = Array(5, 0, -5, 0, 5)
    val got = Multimodal.audioZcr(Seq(wav(1L, alt), wav(2L, zeros)).toDS())
      .collect().map(a =>
        a.doc_id -> ((a.n_samples, a.n_crossings, a.sum_abs, a.mean_abs))).toMap
    assert(got(1L) === ((8L, 7L, 40L, Some(5.0))))
    assert(got(2L) === ((5L, 0L, 15L, Some(3.0))))
  }

  test("dhash is exposure-invariant where ahash is not; strict comparisons") {
    // block grid: ascending then flat — known comparison outcomes
    val bs = Array.tabulate(60)(i => ((i % 10) match {
      case c if c < 5 => 100 * (c + 1) // strictly ascending: right wins
      case _ => 500 // flat: strict rule gives 0 bits
    }).toLong)
    val (dh, ones) = Multimodal.diffHash54(bs)
    // per row: cx in 0..8 — bits set only where bs[cx] > bs[cx+1]: the
    // ascending half rises (never >), the flat half ties (never >) → 0
    assert(dh === 0L && ones === 0)
    val desc = Array.tabulate(60)(i => (60 - (i % 10)).toLong)
    val (dh2, ones2) = Multimodal.diffHash54(desc)
    assert(ones2 === 54, "strictly descending rows set every bit")
    assert(dh2 === (1L << 54) - 1)
    // exposure shift: +c on every block leaves every comparison intact
    val shifted = desc.map(_ + 1000L)
    assert(Multimodal.diffHash54(shifted) === ((dh2, ones2)))
  }

  test("edge stats: planted flat vs textured images order by gradient mass") {
    // recipe-synthesized thumbnails are textured by construction; assert
    // the invariants the curation filter relies on: every gradient field
    // is consistent (n_edges bounded by the number of differences, max
    // gradient witnessed by the sums) and a REAL decode feeds it (any
    // codec drift would already fail the oracle — this pins the shape)
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
      .limit(8)
    val rows = Multimodal.edgeStats(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sumDx = r.getAs[Long]("sum_dx"); val sumDy = r.getAs[Long]("sum_dy")
      val mg = r.getAs[Int]("max_grad"); val ne = r.getAs[Long]("n_edges")
      assert(mg >= 0 && mg <= 255)
      assert(sumDx >= 0 && sumDy >= 0)
      // 39×24 horizontal + 40×23 vertical differences per 40×24 thumbnail
      assert(ne <= 39L * 24 + 40L * 23)
      if (ne > 0) assert(mg >= Multimodal.EdgeThreshold)
      if (mg > 0) assert(sumDx + sumDy >= mg)
    }
  }

  test("corrupt payloads fail loudly, never decode to garbage") {
    intercept[Exception] { // unknown magic
      HeaderDecoder.decode(MediaFile(1L, Array[Byte](1, 2, 3, 4, 5)))
    }
    intercept[Exception] { // PNG signature but first chunk is not IHDR
      val b = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        Array.fill[Byte](25)(0)
      HeaderDecoder.decode(MediaFile(2L, b))
    }
    intercept[Exception] { // JPEG with no SOF before EOF
      HeaderDecoder.decode(MediaFile(3L, Array(0xff, 0xd8, 0xff, 0xfe, 0, 4, 65, 66).map(_.toByte)))
    }
  }

  // -- synthesis round-trip -------------------------------------------------

  test("synthesize -> decode round-trips the recipe on real documents") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val got = Multimodal.decodeHeaders(Multimodal.synthesizeMedia(docs))
      .collect().map(m => m.doc_id -> m).toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(want.nonEmpty)
    for ((id, text) <- want) {
      val body = text.getBytes("UTF-8")
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5").digest(body)
          .map("%02x".format(_)).mkString.take(15), 16)
      val r = Multimodal.Recipe((id % 4).toInt, h)
      val expect = r.fmt match {
        case 0 => HeaderMeta(id, "png", Some(r.width), Some(r.height),
          r.pngBitDepth, Map(0 -> 1, 2 -> 3, 6 -> 4)(r.pngColorType), None, None)
        case 1 => HeaderMeta(id, "jpeg", Some(r.width), Some(r.height),
          8, r.jpegComponents, None, None)
        case 2 => HeaderMeta(id, "gif", Some(r.width), Some(r.height),
          r.gifDepth, 1, None, None)
        case _ => HeaderMeta(id, "wav", None, None, 16, r.wavChannels,
          Some(r.wavSampleRate), Some(r.wavSamples))
      }
      assert(got(id) === expect, s"doc $id")
    }
  }

  test("pixel histogram bins partition the pixels exactly") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents").limit(40)
    val binSum = (0 until 8).map(i => col(s"h$i")).reduce(_ + _)
    val joined = Multimodal.pixelHistogram(docs)
      .join(Multimodal.pixelStats(docs), "doc_id")
      .select(col("doc_id"), binSum.as("bs"), col("n_px"),
        col("min_px"), col("max_px"), col("h0"), col("h7"))
      .collect()
    assert(joined.nonEmpty)
    for (r <- joined) {
      assert(r.getAs[Long]("bs") === r.getAs[Int]("n_px").toLong,
        s"doc ${r.getLong(0)}: bins must sum to the pixel count")
      // bin/range consistency: a populated end bin implies the range
      // reaches into it and vice versa
      assert((r.getAs[Long]("h0") > 0) === (r.getAs[Int]("min_px") < 32))
      assert((r.getAs[Long]("h7") > 0) === (r.getAs[Int]("max_px") >= 224))
    }
  }

  test("header decode is scan-stage only: no shuffle in the plan") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    val plan = Multimodal.decodeHeaders(Multimodal.synthesizeMedia(docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("image compute plans: no key shuffle; only the decode-spread round robin") {
    val docs = Tables.load(spark, TestSpark.sf0001, "documents")
    // phash is memoized + checkpointed (shared intermediate): its plan is
    // a cached-RDD scan with no Exchange at all
    val pPlan = Multimodal.phash(docs).queryExecution.executedPlan.toString
    assert(!pPlan.contains("Exchange"), pPlan)
    // pixelStats decodes inline; the ONLY exchange allowed is the explicit
    // round-robin that decouples codec parallelism from the input's split
    // count — never a hash/range shuffle (no key ever leaves the row)
    val sPlan = Multimodal.pixelStats(docs).queryExecution.executedPlan.toString
    assert(!sPlan.contains("hashpartitioning") && !sPlan.contains("rangepartitioning"), sPlan)
  }

  test("gray PNG encode -> decode round-trips pixels through real zlib bytes") {
    val px = Array.tabulate(40 * 24)(k => (k * 37 + 11) % 256)
    val bytes = Multimodal.encodeGrayPng(40, 24, px)
    // it is a REAL PNG: the header decoder reads it like any other file
    val meta = HeaderDecoder.decode(MediaFile(7L, bytes))
    assert(meta.format === "png" && meta.width === Some(40) &&
      meta.height === Some(24) && meta.bit_depth === 8 && meta.channels === 1)
    val (w, h, back) = Multimodal.decodeGrayPng(7L, bytes)
    assert((w, h) === ((40, 24)))
    assert(back.toSeq === px.toSeq)
  }

  test("gray GIF encode -> decode round-trips pixels through real LZW bytes") {
    val px = Array.tabulate(40 * 24)(k => (k * 91 + 5) % 256)
    val bytes = Multimodal.encodeGifGray(40, 24, px)
    val meta = HeaderDecoder.decode(MediaFile(9L, bytes))
    assert(meta.format === "gif" && meta.width === Some(40) && meta.height === Some(24))
    val (w, h, back) = Multimodal.decodeGifGray(9L, bytes)
    assert((w, h) === ((40, 24)))
    assert(back.toSeq === px.toSeq)
  }

  test("animated GIF: frames round-trip in order and ImageIO sees every frame") {
    val rnd = new scala.util.Random(7)
    val (w, h) = (40, 24)
    val frames = Seq.fill(5)(Array.fill(w * h)(rnd.nextInt(256)))
    val bytes = Multimodal.encodeGifGrayAnimated(w, h, frames)
    // our decoder: every frame, in order, bit-exact
    val (bw, bh, back) = Multimodal.decodeGifGrayFrames(1L, bytes)
    assert((bw, bh) === ((w, h)))
    assert(back.length === 5)
    frames.zip(back).zipWithIndex.foreach { case ((want, got), t) =>
      assert(got.toSeq === want.toSeq, s"frame $t")
    }
    // independent reference: ImageIO's GIF plugin reads the same count
    // and the same first frame (later frames go through ImageIO's
    // disposal compositing, so frame 0 is the clean differential)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) === 5)
    val img0 = reader.read(0)
    val got0 = Array.tabulate(w * h)(k => img0.getRaster.getSample(k % w, k / w, 0))
    assert(got0.toSeq === frames.head.toSeq, "frame 0 vs ImageIO")
    // single-frame files still decode through the same walker
    val single = Multimodal.decodeGifGray(2L,
      Multimodal.encodeGifGray(w, h, frames.head))
    assert(single._3.toSeq === frames.head.toSeq)
  }

  test("motion stats: planted static vs scrolling clips") {
    // static clip: all frames identical -> zero motion everywhere
    val base = Array.tabulate(40 * 24)(k => (k * 37) % 256)
    val static = Multimodal.encodeGifGrayAnimated(40, 24, Seq.fill(4)(base))
    val (_, _, fs) = Multimodal.decodeGifGrayFrames(3L, static)
    assert(fs.length === 4 && fs.forall(_.toSeq == base.toSeq))
    // hard-cut clip: frame 2 inverts -> one cut-grade transition pair
    val inv = base.map(255 - _)
    val cut = Seq(base, base, inv, inv)
    val bytes = Multimodal.encodeGifGrayAnimated(40, 24, cut)
    val (_, _, fc) = Multimodal.decodeGifGrayFrames(4L, bytes)
    val diffs = fc.sliding(2).map { p =>
      p(0).zip(p(1)).map { case (a, b) => math.abs(a - b).toLong }.sum
    }.toSeq
    assert(diffs(0) === 0L && diffs(2) === 0L)
    assert(diffs(1) >= Multimodal.CutMeanDelta.toLong * 40 * 24,
      "the inversion transition must be cut-grade")
  }

  test("both image codecs agree with the JDK's independent ImageIO decoders") {
    // a matched encoder/decoder bug pair would survive our own round-trip
    // test; ImageIO is an independent reference implementation. Random
    // noise pushes the GIF LZW code width past 9 bits; a large image
    // (200x120 = 24000 px) forces dictionary growth toward the 4096 reset.
    val rnd = new scala.util.Random(42)
    for ((w, h) <- Seq((40, 24), (200, 120))) {
      val px = Array.fill(w * h)(rnd.nextInt(256))
      for ((name, bytes) <- Seq(
        ("png", Multimodal.encodeGrayPng(w, h, px)),
        ("gif", Multimodal.encodeGifGray(w, h, px)))) {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        assert(img != null, s"$name: ImageIO could not read our bytes")
        assert(img.getWidth === w && img.getHeight === h, name)
        // raster samples, not getRGB: getRGB pushes gray through a
        // nonlinear gray->sRGB colour conversion
        val got = Array.tabulate(w * h) { k =>
          img.getRaster.getSample(k % w, k / w, 0)
        }
        assert(got.toSeq === px.toSeq, s"$name ${w}x$h: pixel mismatch vs ImageIO")
      }
    }
  }

  test("planted near-duplicate image: small perturbation stays within hamming 6, " +
    "phash pair join finds it, unrelated images stay apart") {
    import spark.implicits._
    val base = Array.tabulate(40 * 24)(k => ((k % 40) * 3 + (k / 40) * 7) % 256)
    // re-encoded near-duplicate: a handful of pixels nudged by 1 — the
    // byte stream differs (md5 dedup misses it) but block means barely move
    val near = base.clone()
    Seq(5, 333, 707).foreach(i => near(i) = (near(i) + 1) % 256)
    // an unrelated image: inverted gradient
    val far = base.map(255 - _)
    def hashOf(id: Long, px: Array[Int]): Long = {
      val (w, h, dec) =
        Multimodal.decodeGrayPng(id, Multimodal.encodeGrayPng(40, 24, px))
      Multimodal.averageHash60(w, h, dec)._1
    }
    val (hb, hn, hf) = (hashOf(1, base), hashOf(2, near), hashOf(3, far))
    assert(java.lang.Long.bitCount(hb ^ hn) <= 6,
      s"near-dup drifted: hamming ${java.lang.Long.bitCount(hb ^ hn)}")
    assert(java.lang.Long.bitCount(hb ^ hf) > 6,
      s"unrelated images collided: hamming ${java.lang.Long.bitCount(hb ^ hf)}")
    val sig = Seq((1L, hb), (2L, hn), (3L, hf)).toDF("doc_id", "phash60")
    val pairs = graft.operators.Dedup.hammingPairs60(sig, "phash60", 6)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)), s"got $pairs")
  }

  test("phash matches the pixel-recipe oracle formula on real documents") {
    import spark.implicits._
    val docs = Tables.load(spark, TestSpark.sf0001, "documents").limit(50)
    val got = Multimodal.phash(docs)
      .as[(Long, Long, Int)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    for ((id, text) <- texts) {
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hh = java.lang.Long.parseLong(md5hex.take(15), 16)
      val bs = new Array[Long](60)
      for (y <- 0 until 24; x <- 0 until 40)
        bs((x / 4) + 10 * (y / 4)) +=
          ((hh % 256 + 7L * x + 13L * y + ((x.toLong * y) % 5) * 29) % 256)
      val total = bs.sum
      var expect = 0L; var ones = 0
      for (b <- 0 until 60; if bs(b) * 60 > total) { expect |= 1L << b; ones += 1 }
      assert(got(id) === ((expect, ones)), s"doc $id")
    }
  }

  test("keyframes reconcile with motion stats: per-frame diffs sum to " +
      "sum_motion, cut count matches, frame 0 is always a key") {
    import graft.operators.Multimodal
    val docs = graft.tables.Tables.load(spark, TestSpark.sf0001, "documents")
      .limit(40)
    val kf = Multimodal.keyFrames(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val ms = Multimodal.motionStats(docs).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(4)))).toMap
    val byDoc = kf.groupBy(_._1)
    assert(byDoc.keySet === ms.keySet)
    byDoc.foreach { case (id, rows) =>
      assert(rows.length === 8, s"doc $id frame count")
      val f0 = rows.find(_._2 == 0).get
      assert(f0._3 === 0L && f0._4 === 1, s"doc $id frame 0")
      val later = rows.filter(_._2 > 0)
      assert(later.map(_._3).sum === ms(id)._1, s"doc $id sum_motion")
      assert(later.count(_._4 == 1).toLong === ms(id)._2, s"doc $id cuts")
    }
  }

  test("ssim: identical-content candidates score exactly 1.0, the pair " +
      "set is the banded candidate set, and stats replay per-doc sums") {
    import spark.implicits._
    // two docs with IDENTICAL text synthesize byte-identical thumbnails
    // (hamming 0, SSIM exactly 1 — numerator == denominator term by
    // term); the third is unrelated and must not pair
    val docs = Seq((1L, "same payload text"), (2L, "same payload text"),
      (3L, "completely different content here"))
      .toDF("doc_id", "text")
    val got = Multimodal.ssimPairs(docs, maxHamming = 2).collect()
    assert(got.length === 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getInt(2)) === ((1L, 2L, 0)))
    assert(r.getInt(3) === 960) // 40x24 thumbnail
    assert(r.getLong(4) === r.getLong(6) && r.getLong(5) === r.getLong(7),
      "identical images must carry identical sums")
    assert(r.getDouble(9) === 1.0, s"ssim of a duplicate must be exactly 1")
    // cross term of identical images IS the energy sum
    assert(r.getLong(8) === r.getLong(5))
  }
}
