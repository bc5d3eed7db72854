package graft

import graft.operators.{Embeddings, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior tests for the round-3 training-pipeline operators: PII
  * scrubbing (on synthetic PII — the test corpus contains none), repetition
  * scoring, boilerplate detection, and embedding normalization/centroids.
  * The driver's DuckDB gate checks these on the real tables; here we check
  * the semantics on inputs engineered to exercise them.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readability: planted simple vs complex prose order by flesch") {
    import spark.implicits._
    val docs = Seq(
      // short words, short sentences -> high flesch
      (1L, "The cat sat. The dog ran. It was fun.", "en", "simple", 0L),
      // polysyllabic words, one long sentence -> low flesch
      (2L, "Incomprehensibility characterizes institutionalization of " +
        "multidimensional organizational infrastructures.", "en", "hard", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.readability(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("simple").getLong(3) === 3L, "three sentences")
    assert(out("hard").getLong(3) === 1L, "one sentence")
    assert(out("simple").getDouble(7) > out("hard").getDouble(7),
      "simple prose must score higher")
    // vowel-group syllables: "The cat sat" etc. — 9 words, 9 groups
    assert(out("simple").getLong(4) === 9L)
  }

  test("piiScrub redacts emails, IPs and phone numbers, and counts them") {
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or +14155551234 now"),
      (2L, "server at 10.0.0.1 and 192.168.254.3 up"),
      (3L, "nothing sensitive here at all"),
      // the IP is inside the email: ONE redaction happens, so n_pii
      // must be 1 (sequential counting), not 2 (independent counting)
      (4L, "ping admin@10.0.0.1.example.com please")).toDF("doc_id", "text")
    val scrubbedText = regexp_replace(regexp_replace(regexp_replace(col("text"),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
      "\\+\\d{7,15}", "<PHONE>")
    val got = TextAnalysis.piiScrub(docs).orderBy("doc_id").collect()
    assert(got.map(_.getInt(1)).toSeq === Seq(2, 2, 0, 1))
    // the hash is of the tagged text, not the original
    val tagged = docs.select(col("doc_id"), md5(scrubbedText).as("h"))
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(got.map(_.getString(2)).toSeq === tagged)
    assert(tagged.head !=
      docs.select(md5(col("text"))).orderBy("doc_id").collect()(0).getString(0))
  }

  test("tfidf top terms rank document-distinctive terms first, scores exact") {
    val d = Seq(
      (1L, "apple apple apple common common"),
      (2L, "banana common common common"),
      (3L, "cherry cherry common common")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(d, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val rank1 = top.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    assert(rank1 === Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    // doc1 "apple": tf=3, df=1, n_docs=3 -> 3*3/1 = 9.0 exactly
    assert(top.find(t => t._1 == 1L && t._3 == "apple").get._6 === 9.0)
    // "common" appears in all docs: idf factor 1 -> doc2 score = tf = 3.0
    assert(top.find(t => t._1 == 2L && t._3 == "common").get._6 === 3.0)
  }

  test("curation covers every document: short docs emit keep=0, not vanish") {
    val d = Seq(
      (1L, "one two"), // < 3 tokens
      (2L, ""), // no tokens at all
      // 40 distinct letter-only words (digits would tokenize away)
      (3L, Seq.tabulate(40)(i =>
        s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.curation(d).orderBy("doc_id").collect()
    assert(got.length === 3)
    assert(got(0).getInt(got(0).fieldIndex("keep")) === 0)
    assert(got(1).getInt(got(1).fieldIndex("keep")) === 0)
    assert(got(1).getDouble(got(1).fieldIndex("ttr")) === 0.0)
    assert(got(0).getDouble(got(0).fieldIndex("dup3")) === 1.0)
    assert(got(2).getInt(got(2).fieldIndex("keep")) === 1)
  }

  test("repetitionScores: a fully repeated doc scores high, unique doc zero") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionScores(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("dup_3gram_ratio") > 0.8)
    assert(r(1).getAs[Double]("dup_3gram_ratio") === 0.0)
    assert(r(1).getAs[Double]("dup_2gram_ratio") === 0.0)
  }

  test("boilerplateScores flags n-grams shared by most documents") {
    // 10 docs all end with the same footer phrase; unique letter-only
    // bodies (digits would be stripped by the letter tokenizer)
    val docs = (0 until 10).map { i =>
      val u = ('a' + i).toChar
      (i.toLong, s"body$u word$u token$u all rights reserved")
    }.toDF("doc_id", "text")
    val r = TextAnalysis.boilerplateScores(docs, minShare = 0.8)
      .orderBy("doc_id").collect()
    // "all rights" and "rights reserved" are in all 10 docs; the
    // bodyN/wordN bigrams are unique per doc
    assert(r.forall(_.getAs[Long]("n_boilerplate") === 2L))
    assert(r.forall(_.getAs[Double]("bp_ratio") > 0.3))
  }

  test("normalized embeddings have unit norm; centroids average components") {
    val emb = Seq(
      (1L, Array(3.0f, 4.0f), 0),
      (2L, Array(0.0f, 0.0f), 0),
      (3L, Array(1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val unit = Embeddings.normalized(emb).orderBy("vec_id").collect()
    val v1 = unit(0).getSeq[Double](unit(0).fieldIndex("unit"))
    assert(math.abs(v1(0) - 0.6) < 1e-12 && math.abs(v1(1) - 0.8) < 1e-12)
    assert(unit(1).getSeq[Double](unit(1).fieldIndex("unit")).toSeq
      === Seq(0.0, 0.0)) // zero passthrough
    val cents = Embeddings.centroids(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(cents((0, 0)) === 1.5 && cents((0, 1)) === 2.0)
    assert(cents((1, 0)) === 1.0 && cents((1, 1)) === 0.0)
  }

  test("kmeansExact: separated groups converge; ties to lowest index; " +
      "empty cluster keeps centroid; floor-div mean on negatives") {
    // two well-separated groups; seeds (ids 0,1) land one per group
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(0.9f, 0.1f), 0), (3L, Array(0.1f, 0.9f), 0),
      (4L, Array(1.1f, 0.0f), 0), (5L, Array(0.0f, 1.1f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Embeddings.kmeansExact(emb, k = 2, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(Seq(0L, 2L, 4L).forall(r(_) == 0) &&
      Seq(1L, 3L, 5L).forall(r(_) == 1))

    // iters=0 assigns against the raw seeds: (1,0) is exactly equidistant
    // from (0,0) and (2,0) -> the argmin tie goes to cluster 0
    val tie = Seq(
      (0L, Array(0.0f), 0), (1L, Array(2.0f), 0), (2L, Array(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val t = Embeddings.kmeansExact(tie, k = 2, iters = 0)
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(t(2L) == 0)

    // fully degenerate corpus (all vectors identical): every SSD ties to
    // cluster 0 every iteration, cluster 1 stays empty and keeps its seed
    // centroid (no crash, no NaN, no resurrection)
    val dup = Seq(
      (0L, Array(1.0f), 0), (1L, Array(1.0f), 0), (2L, Array(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val d = Embeddings.kmeansExact(dup, k = 2, iters = 2).collect()
    assert(d.forall(_.getInt(1) == 0))

    // signed floor-div mean: q-grid components -4 and 1 (sum -3, n=2) must
    // mean to floor(-3/2) = -2, never the toward-zero -1 — final SSDs
    // against the updated 1-cluster centroid prove which division ran
    val neg = Seq(
      (0L, Array(-0.0035f), 0), (1L, Array(0.0012f), 0))
      .toDF("vec_id", "embedding", "label")
    val n = Embeddings.kmeansExact(neg, k = 1, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(n(0L) == 4L && n(1L) == 9L) // centroid -2: (-4+2)^2, (1+2)^2
  }

  test("poly31 rolling hash column matches the JVM fold and stays in codegen") {
    // over a real scan — a literal input would constant-fold away the plan
    val df = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("text"), graft.functions.hashes.poly31Hash(col("text")).as("h"))
    val row = df.limit(1).collect()(0)
    assert(row.getLong(1) === graft.functions.FnvHash.poly31(
      org.apache.spark.unsafe.types.UTF8String.fromString(row.getString(0))))
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "poly31 must not break whole-stage codegen")
  }

  test("embedding stats match hand-computed norms") {
    val emb = Seq((1L, Array(3.0f, 4.0f), 0)).toDF("vec_id", "embedding", "label")
    val s = Embeddings.stats(emb).collect()(0)
    assert(s.getInt(1) === 2)
    assert(s.getDouble(2) === 5.0)
    assert(s.getDouble(3) === 4.0)
  }

  test("packSequences == the naive global running sum, with tiny buckets") {
    // irregular ids and lengths; bucketDocs=4 forces many buckets so the
    // two-level prefix sum actually composes bucket offsets
    val lens = (0 until 23).map(i => i % 5 + 1)
    val ids = (0 until 23).map(i => i * 7L + i % 3)
    val d = ids.zip(lens).map { case (id, n) =>
      (id, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val got = TextAnalysis.packSequences(d, chunkTokens = 7, bucketDocs = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    // driver-side reference: plain sequential prefix sum in doc_id order
    var cum = 0L
    val want = ids.zip(lens).sortBy(_._1).map { case (id, n) =>
      val start = cum; cum += n
      (id, n.toLong, start, start / 7, (start + n - 1) / 7,
        (start + n - 1) / 7 - start / 7 + 1)
    }
    assert(got.toSeq === want)
  }

  test("sourceCap keeps min(cap, group size); under-cap groups skip the lottery") {
    val docs = (0 until 9).map { i =>
      (i.toLong, "text", "en", if (i < 3) "small" else "big", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextAnalysis.sourceCap(docs, cap = 4).collect()
      .map(row => (row.getLong(0), row.getString(1),
        row.getLong(3), // n_group
        if (row.isNullAt(4)) None else Some(row.getInt(4)), // rnk
        row.getInt(5))) // kept
    assert(r.length === 9)
    val small = r.filter(_._2 == "small")
    assert(small.forall(x => x._3 == 3L && x._4.isEmpty && x._5 == 1),
      "under-cap group: all kept, no rank assigned")
    val big = r.filter(_._2 == "big")
    assert(big.forall(_._3 == 6L))
    assert(big.flatMap(_._4).sorted.toSeq === (1 to 6), "over-cap ranks are 1..n")
    assert(big.count(_._5 == 1) === 4 && big.count(_._5 == 0) === 2)
    assert(big.forall(x => (x._5 == 1) == x._4.exists(_ <= 4)))
  }

  test("randomProject == driver-side exact replay on real vectors") {
    def sign(p: Int, d: Int): Double = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$p,$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(md5.take(15), 16) % 2 == 1) 1.0 else -1.0
    }
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val got = Embeddings.randomProject(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val raw = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    assert(got.size === raw.length)
    raw.take(20).foreach { case (id, v) =>
      val m = v.map(math.abs).max
      val q = if (m == 0) v.map(_ => 0.0)
              else v.map(x => math.floor(x * 127.0 / m + 0.5))
      val want = (0 until 16).map { p =>
        q.indices.map(d => sign(p, d) * q(d)).sum.toLong
      }
      assert(got(id) === want, s"projection of $id")
    }
  }

  test("knnLabel classifies well-separated clusters; vote ties go to the smaller label") {
    // two orthogonal clusters: queries 0-3 sit in cluster A (label 7),
    // candidates 100+ split between A (7) and B (2)
    val a = Array(1.0f, 0.0f); val b = Array(0.0f, 1.0f)
    def jitter(v: Array[Float], eps: Float) = Array(v(0) + eps, v(1) + eps)
    val rows =
      (0 until 4).map(i => (i.toLong, jitter(a, 0.01f * i), 7)) ++
        (0 until 5).map(i => (100L + i, jitter(a, 0.02f * i), 7)) ++
        (0 until 5).map(i => (200L + i, jitter(b, 0.02f * i), 2))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val r = Embeddings.knnLabel(emb, k = 3).collect()
      .map(row => (row.getLong(0), row.getInt(1), row.getInt(2), row.getLong(3)))
    assert(r.length === 4)
    assert(r.forall { case (_, lab, pred, votes) =>
      lab == 7 && pred == 7 && votes == 3L
    }, "every query's 3-NN are in its own cluster")
    // tie: 4 candidates at identical cosine, labels {1,1,5,5}, k=4
    val tie = (Seq((0L, a, 9)) ++
      Seq((110L, a, 1), (111L, a, 1), (112L, a, 5), (113L, a, 5)))
      .toDF("vec_id", "embedding", "label")
    val t = Embeddings.knnLabel(tie, k = 4).collect()
    assert(t.length === 1)
    assert(t(0).getInt(2) === 1, "2-2 vote tie resolves to the smaller label")
    assert(t(0).getLong(3) === 2L)
  }

  test("shuffleShards == driver replay; positions contiguous per shard") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val got = TextAnalysis.shuffleShards(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    assert(got.length === ids.length)
    def skey(id: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shuf:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(15), 16)
    }
    val want = ids.toSeq.map(id => (id, skey(id)))
      .groupBy { case (_, k) => (k % 32).toInt }
      .flatMap { case (shard, members) =>
        members.sortBy { case (id, k) => (k, id) }.zipWithIndex.map {
          case ((id, _), pos) => (id, shard, pos.toLong)
        }
      }.toSet
    assert(got.toSet === want)
    // positions are a contiguous 0..n-1 range inside every shard
    got.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $s positions")
    }
  }

  test("lmScores: exact bigram corpus frequencies and rare fractions") {
    val d = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x y"), (4L, "z"))
      .toDF("doc_id", "text")
    // model: "a b"->2, "b c"->1, "b d"->1, "x y"->1; doc4 has no bigram
    val got = TextAnalysis.lmScores(d).orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val r1 = got(0)
    assert(r1.getLong(1) === 2L)
    assert(r1.getDouble(2) === 1.5) // (2 + 1) / 2
    assert(r1.getDouble(3) === 0.5) // "b c" unique
    assert(r1.getInt(4) === 1) // 0.5 <= 0.5 keeps
    val r3 = got(2)
    assert(r3.getDouble(2) === 1.0 && r3.getDouble(3) === 1.0)
    assert(r3.getInt(4) === 0) // every bigram rare -> dropped
  }

  test("pcaFromGram: eigen equation, orthonormal components, trace kept") {
    val emb = graft.tables.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val rows = Embeddings.gramMatrix(emb).collect()
    val dimSums = rows.filter(_.getInt(1) == -1)
      .map(r => r.getInt(0) -> r.getLong(2)).sortBy(_._1).map(_._2)
    val gram = rows.filter(_.getInt(1) >= 0)
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
    val n = rows.head.getLong(3)
    val d = dimSums.length
    assert(d === 64 && gram.length === d * (d + 1) / 2)
    val eig = Embeddings.pcaFromGram(gram, dimSums, n)
    // covariance rebuilt independently for the residual checks
    val c = Array.ofDim[Double](d, d)
    gram.foreach { case ((i, j), s) =>
      val v = (s.toDouble - dimSums(i).toDouble * dimSums(j) / n) / n
      c(i)(j) = v; c(j)(i) = v
    }
    // eigenvalues descending, non-negative (covariance is PSD)
    assert(eig.map(_._1).sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(eig.last._1 > -1e-9)
    // trace preserved: Σλ == ΣC_ii
    val trace = (0 until d).map(i => c(i)(i)).sum
    assert(math.abs(eig.map(_._1).sum - trace) < 1e-6 * math.abs(trace))
    // components orthonormal
    for (a <- 0 until 3; b <- 0 until 3) {
      val dot = (0 until d).map(k => eig(a)._2(k) * eig(b)._2(k)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8,
        s"v${a}.v$b=$dot")
    }
    // eigen equation: C·v ≈ λ·v for the top components
    for ((lambda, v) <- eig.take(3)) {
      val res = (0 until d).map { i =>
        val cv = (0 until d).map(j => c(i)(j) * v(j)).sum
        math.pow(cv - lambda * v(i), 2)
      }.sum
      assert(math.sqrt(res) < 1e-6 * math.max(1.0, math.abs(lambda)),
        s"residual for lambda=$lambda")
    }
  }

  test("pcaProject: component variances == eigenvalues, decorrelated") {
    val emb = graft.tables.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val proj = Embeddings.pcaProject(emb, topK = 4).collect()
    val n = proj.length.toDouble
    assert(n > 0)
    val cols = (0 until 4).map(k => proj.map(_.getDouble(k + 1)))
    // recompute the eigenvalues from the same stats
    val rows = Embeddings.gramMatrix(emb).collect()
    val dimSums = rows.filter(_.getInt(1) == -1)
      .map(r => r.getInt(0) -> r.getLong(2)).sortBy(_._1).map(_._2)
    val gram = rows.filter(_.getInt(1) >= 0)
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
    val eig = Embeddings.pcaFromGram(gram, dimSums, rows.head.getLong(3))
    for (k <- 0 until 4) {
      val mean = cols(k).sum / n
      val variance = cols(k).map(x => (x - mean) * (x - mean)).sum / n
      val lambda = eig(k)._1
      // population variance of the projection IS the eigenvalue (up to
      // the 6-decimal rounding of the component matrix)
      assert(math.abs(variance - lambda) < 0.01 * math.max(1.0, lambda),
        s"component $k: var $variance vs lambda $lambda")
    }
    // distinct components are uncorrelated
    val m0 = cols(0).sum / n
    val m1 = cols(1).sum / n
    val cov01 = cols(0).zip(cols(1))
      .map { case (a, b) => (a - m0) * (b - m1) }.sum / n
    val denom = math.sqrt(eig(0)._1 * eig(1)._1)
    assert(math.abs(cov01) / denom < 0.01, s"corr(p0,p1) = ${cov01 / denom}")
  }

  test("pcaContract: all laws hold and trace_num replays from the Gram") {
    val emb = graft.tables.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val panel = Embeddings.pcaContract(emb).collect()
    assert(panel.length === 8)
    assert(panel.map(_.getInt(0)).toSeq === (0 until 8))
    panel.foreach { r =>
      assert(r.getBoolean(3), s"k=${r.getInt(0)}: var_matches false")
      assert(r.getBoolean(4), "orthonormal_ok false")
      assert(r.getBoolean(5), "descending_ok false")
      assert(r.getBoolean(6), "explained_le_trace false")
    }
    // independent replay of the exact trace numerator from the Gram rows
    val rows = Embeddings.gramMatrix(emb).collect()
    val n = rows.head.getLong(3)
    val sums = rows.filter(_.getInt(1) == -1)
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val diag = rows.filter(r => r.getInt(1) == r.getInt(0))
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    val want = sums.keys.map(i => n * diag(i) - sums(i) * sums(i)).sum
    panel.foreach { r =>
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === want, "trace_num mismatch")
    }
  }

  test("q37 incremental LWW merge == global latest-event rule") {
    val dir = TestSpark.sf0001
    val got = graft.queries.Relational.defs("q37_cdc_upsert")(spark, dir)
      .collect().map(_.toString).toSeq
    val e = graft.tables.Tables.events(spark, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val want = e.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_type").as("last_type"),
        col("value").as("last_value"), col("ts_us").as("last_ts_us"))
      .orderBy("user_id").collect().map(_.toString).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("gopherRules: each rule flags its own violation") {
    // letter-only distinct fill words (digits are token separators)
    val fill = (0 until 60)
      .map(i => s"fy${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
      .mkString(" ")
    val docs = Seq(
      (1L, s"the of and $fill"),            // clean: every rule passes
      (2L, "the of tiny"),                  // too short -> r_wc = 0
      (3L, s"the of ${Seq.fill(60)("spam").mkString(" ")}"), // r_rep = 0
      (4L, fill)                            // no stopwords -> r_stop = 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0),
        r.getAs[Int]("r_wc"), r.getAs[Int]("r_mwl"),
        r.getAs[Int]("r_stop"), r.getAs[Int]("r_rep"),
        r.getAs[Int]("keep"))).toSeq
    assert(got(0) === ((1L, 1, 1, 1, 1, 1)))
    assert(got(1)._2 === 0 && got(1)._6 === 0) // word count
    assert(got(2)._5 === 0 && got(2)._6 === 0) // repetition
    assert(got(3)._4 === 0 && got(3)._6 === 0) // stopwords
  }

  test("weightedSample: zero-weight never kept, max-weight always kept") {
    val docs = (0L until 200L).map(i =>
      (i, "x", "s", if (i % 2 == 0) 0L else 400L))
      .toDF("doc_id", "text", "source", "n_chars")
    val kept = TextAnalysis.weightedSample(docs).collect().map(_.getLong(0)).toSet
    assert(kept.forall(_ % 2 == 1), "a zero-weight doc was sampled")
    assert((1L until 200L by 2).forall(kept), "a max-weight doc was dropped")
  }

  test("weightedSample: empirical rate tracks mean(w)/max(w)") {
    val docs = graft.tables.Tables.load(spark, TestSpark.sf0001, "documents")
    val n = docs.count().toDouble
    val expected = docs.agg(sum(col("n_chars")).cast("double")
      / (count(lit(1)) * max(col("n_chars")))).head().getDouble(0)
    val rate = TextAnalysis.weightedSample(docs).count() / n
    assert(math.abs(rate - expected) < 0.08,
      s"rate $rate vs expected $expected")
  }

  test("bm25TopDocs: hand-computed scores on a 3-doc corpus") {
    // corpus: T = 2+3+4 = 9 tokens, N = 3
    val docs = Seq(
      (1L, "spark spark"),          // dl=2, tf_spark=2
      (2L, "join alpha beta"),      // dl=3, tf_join=1
      (3L, "gamma delta eps zeta")  // dl=4, no query terms
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopDocs(docs, Seq("spark", "join"), k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // score(d1) = 22·9·2·3 / ((10·9·2 + 3·9 + 9·2·3)·1) = 1188/261
    assert(out(1L) === 22.0 * 9 * 2 * 3 / ((10 * 9 * 2 + 3 * 9 + 9 * 2 * 3) * 1))
    // score(d2) = 22·9·1·3 / ((10·9·1 + 3·9 + 9·3·3)·1) = 594/198 = 3.0
    assert(out(2L) === 22.0 * 9 * 1 * 3 / ((10 * 9 * 1 + 3 * 9 + 9 * 3 * 3) * 1))
    assert(out(3L) === 0.0)
  }

  test("bm25TopDocs: higher tf wins at equal dl; longer doc loses at equal tf") {
    val docs = Seq(
      (1L, "spark spark filler"), (2L, "spark other filler"),
      (3L, "spark pad pad pad pad pad")).toDF("doc_id", "text")
    val ranked = TextAnalysis.bm25TopDocs(docs, Seq("spark"), k = 3)
      .collect().map(_.getLong(0))
    assert(ranked.toSeq == Seq(1L, 2L, 3L))
  }

  test("hashingTf: per-doc bucket counts == driver-side replay; buckets bounded") {
    val docs = graft.tables.Tables.load(spark, TestSpark.sf0001, "documents")
      .limit(50)
    val got = TextAnalysis.hashingTf(docs, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val expect = texts.flatMap { case (id, t) =>
      t.split("[^\\p{L}]+").filter(_.nonEmpty)
        .map(w => (id, (h60("htf:" + w) % 16).toInt))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(got == expect)
    assert(got.keys.forall { case (_, b) => b >= 0 && b < 16 })
  }

  test("diversityScores: hand-computed Simpson; concentration ranks below variety") {
    val docs = Seq(
      (1L, "a a a b"),          // ss = 9 + 1 = 10, T = 4
      (2L, "big red old cat")   // ss = 4, T = 4 — fully diverse
    ).toDF("doc_id", "text")
    val out = TextAnalysis.diversityScores(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out(1L) === ((10L, 10.0 / 16.0, 16.0 / 10.0)))
    assert(out(2L) === ((4L, 4.0 / 16.0, 4.0)))
    // same length + same TTR can't fool Simpson: repetition scores higher
    assert(out(1L)._2 > out(2L)._2)
  }

  test("dsirWeights: target-language docs weigh higher; weights ≤ scale") {
    val docs = graft.tables.Tables.load(spark, TestSpark.sf0001, "documents")
    val w = TextAnalysis.dsirWeights(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select("lang", "weight_scaled").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(w.forall(_._2 <= 1000000L), "a ratio mean exceeded the scale")
    val (en, rest) = w.partition(_._1 == "en")
    val meanEn = en.map(_._2).sum.toDouble / en.length
    val meanRest = rest.map(_._2).sum.toDouble / rest.length
    // the corpus shares one vocabulary across languages, so the gap is
    // driven by the en share of each bucket — en must still sit above
    assert(meanEn > meanRest,
      s"target docs not up-weighted: en $meanEn vs rest $meanRest")
  }

  test("noveltyScores: first copy scores 1, an exact duplicate scores 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"), // duplicate of 1 → nothing novel
      (3L, "zeta eta theta iota")     // fresh content → fully novel
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScores(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0 && out(2L) == 0.0 && out(3L) == 1.0, out.toString)
  }

  test("hybridRrf: scores recompute exactly from the exported ranks, sorted") {
    val docs = graft.tables.Tables.load(spark, TestSpark.sf0001, "documents")
    val emb = graft.tables.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val rows = graft.operators.Similarity.hybridRrf(docs, emb).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map { r =>
      val lex = if (r.isNullAt(1)) 0.0 else 1.0 / (60 + r.getInt(1))
      val sem = if (r.isNullAt(2)) 0.0 else 1.0 / (60 + r.getInt(2))
      val expect = lex + sem
      assert(r.getDouble(3) == expect, s"rrf mismatch: $r")
      expect
    }
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "fusion output not rank-sorted")
    // both retrievers contributed: at least one row carries each rank kind
    assert(rows.exists(!_.isNullAt(1)) && rows.exists(!_.isNullAt(2)))
  }

  test("outlierFlags: planted far vector flagged, tight cluster clean") {
    // label 0: 40 copies of (100,0,...) plus one at (0,100): the stray's
    // dist² is ~2·100² while the mean is dominated by near-zero distances
    val vecs =
      (0L until 40L).map(i => (i, Array(100f, 0f, 0f), 0)) :+
        (40L, Array(0f, 0f, 100f), 0)
    val emb = vecs.toDF("vec_id", "embedding", "label")
    val out = Embeddings.outlierFlags(emb).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out(40L) == 1, "planted outlier not flagged")
    assert((0L until 40L).forall(out(_) == 0), "inlier flagged")
  }

  test("outlierFlags: dist2 matches the exact centroid arithmetic") {
    // two vectors, one label: codes ±127 on dim 0 → centroid 0, each
    // dist² = 127² exactly; nothing flagged (both AT the mean, 4× rule)
    val emb = Seq(
      (1L, Array(1f, 0f), 7), (2L, Array(-1f, 0f), 7))
      .toDF("vec_id", "embedding", "label")
    val rows = Embeddings.outlierFlags(emb).collect()
    assert(rows.forall(_.getDouble(2) == 127.0 * 127.0))
    assert(rows.forall(_.getInt(3) == 0))
  }

  test("isotropyPanel: hand-computed identities on a planted corpus, " +
      "zero-scatter NULL share, and a Gram-rows replay on the real table") {
    // [1,0],[1,0],[0,1] -> codes [127,0]x2,[0,127]: s=(254,127),
    // g=(32258,16129); both dims tie at var 32258 -> top_dim 0
    val emb = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 0f)),
      (3L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val r = Embeddings.isotropyPanel(emb).collect()
    assert(r.length === 1)
    assert((r(0).getLong(0), r(0).getLong(1), r(0).getLong(2),
      r(0).getLong(3), r(0).getLong(4), r(0).getLong(5), r(0).getLong(6),
      r(0).getLong(7), r(0).getLong(8), r(0).getLong(9)) ===
      ((3L, 2L, 48387L, 80645L, 32258L, 6L, 64516L, 0L, 32258L, 500000L)))
    // two identical vectors: all scatter vanishes -> ppm NULL, not 0/0
    val flat = Seq((1L, Array(1f, 1f)), (2L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val f = Embeddings.isotropyPanel(flat).collect()(0)
    assert(f.getLong(4) === 64516L) // pair dot: 2 ordered pairs x 2*127^2
    assert(f.getLong(6) === 0L && f.isNullAt(9))
    // real-table cross-check: the panel must replay from gramMatrix rows
    val real = graft.tables.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val g = Embeddings.gramMatrix(real).collect()
    val n = g.head.getLong(3)
    val sums = g.filter(_.getInt(1) == -1).map(_.getLong(2))
    val diag = g.filter(x => x.getInt(0) == x.getInt(1)).map(_.getLong(2))
    val p = Embeddings.isotropyPanel(real).collect()(0)
    assert(p.getLong(0) === n)
    assert(p.getLong(2) === diag.sum)
    assert(p.getLong(3) === sums.map(s => s * s).sum)
    assert(p.getLong(6) === n * diag.sum - sums.map(s => s * s).sum)
  }

  test("whitening: identity covariance on a planted corpus, rank-floor " +
      "drop on a degenerate line, all laws green on the real table") {
    // axis-aligned corpus: covariance diag(127^2/2, 127^2/2), both axes
    // retained; whitened variance must be 1 on each
    val emb = Seq((1L, Array(1f, 0f)), (2L, Array(-1f, 0f)),
      (3L, Array(0f, 1f)), (4L, Array(0f, -1f)))
      .toDF("vec_id", "embedding")
    val panel = Embeddings.whitenContract(emb, topK = 2).collect()
    assert(panel.length === 2)
    panel.foreach { r =>
      assert(r.getBoolean(3), s"k=${r.getInt(0)}: unit_var_ok false")
      assert(r.getBoolean(4) && r.getBoolean(5))
    }
    // collinear corpus (per-vector max-abs quantization maps [2,2] and
    // [1,1] to the SAME code): rank 1 -> exactly one retained axis, and
    // no axis is divided by a near-zero eigenvalue
    val line = Seq((1L, Array(1f, 1f)), (2L, Array(-1f, -1f)),
      (3L, Array(2f, 2f))).toDF("vec_id", "embedding")
    val w = Embeddings.whitenProject(line, topK = 2)
    assert(w.columns.toSeq === Seq("vec_id", "w0"), "rank floor must drop w1")
    val vals = w.collect().map(_.getDouble(1))
    assert(vals.forall(x => !x.isNaN && !x.isInfinite))
    // the dropped-axis panel rows publish vacuous TRUE laws
    val dPanel = Embeddings.whitenContract(line, topK = 2).collect()
    assert(dPanel.length === 2 && dPanel.forall(_.getBoolean(3)))
    // real corpus: every law green at full width
    val real = graft.tables.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val rp = Embeddings.whitenContract(real).collect()
    assert(rp.length === 8)
    rp.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5),
        s"k=${r.getInt(0)} law failed")
    }
  }

  test("procrustes: the planted signed reversal is recovered exactly on " +
      "a full-rank corpus; a rank-deficient corpus reports full_rank_ok " +
      "false instead of inventing a rotation") {
    // identity basis at d=4: codes 127·e_r, G = 127²·I, M = 127²·S·J —
    // the polar factor IS the planted signed reversal; trace(M) = 0
    // (no fixed point of the reversal at even d)
    val emb = (0 until 4).map(r =>
      (r.toLong, Array.tabulate(4)(i => if (i == r) 1f else 0f)))
      .toDF("vec_id", "embedding")
    val p = Embeddings.procrustesContract(emb).collect()(0)
    assert(p.getLong(0) === 4L)
    assert(p.getLong(1) === 4L * 127 * 127, "code energy")
    assert(p.getLong(2) === 0L, "reversal has no diagonal at even d")
    assert(p.getBoolean(3) && p.getBoolean(4) && p.getBoolean(5)
      && p.getBoolean(6), s"laws: $p")
    // rank-1 corpus: MᵀM has zero eigenvalues -> the polar factor is not
    // unique; the panel must SAY so rather than pass a fabricated R
    val flat = Seq((1L, Array(1f, 1f, 1f, 1f)), (2L, Array(1f, 1f, 1f, 1f)))
      .toDF("vec_id", "embedding")
    val f = Embeddings.procrustesContract(flat).collect()(0)
    assert(!f.getBoolean(3), "rank deficiency must be reported")
    // real table: full rank, all laws green, exact ints replay from the
    // gram diagonal (q_energy == Σ gii)
    val real = graft.tables.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val rp = Embeddings.procrustesContract(real).collect()(0)
    val g = Embeddings.gramMatrix(real).collect()
    val qEnergy = g.filter(r => r.getInt(0) == r.getInt(1))
      .map(_.getLong(2)).sum
    assert(rp.getLong(1) === qEnergy)
    assert(rp.getBoolean(3) && rp.getBoolean(4) && rp.getBoolean(5)
      && rp.getBoolean(6), s"real-table laws: $rp")
  }

  test("canonicalizeUrl: each normalization hazard alone and together; " +
      "urlCanon collapses a planted variant run to one keeper") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443//a//b/?utm_source=x&b=2&a=1#frag",
      "http://Host.com:80", // scheme folds, default port strips, "/" path
      "https://h.com/Case/Path", // path case preserved
      "https://h.com:8080/x?utm_a=1", // non-default port kept
      "https://h.com/") // bare trailing slash stays "/"
      .toDF("url").select(TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(urls === Seq(
      "https://www.example.com/a/b?a=1&b=2",
      "https://host.com/",
      "https://h.com/Case/Path",
      "https://h.com:8080/x",
      "https://h.com/"))
    // doc_ids 0..6 share (source, lang) and doc_id div 7 = 0: every messy
    // variant (port, case, slashes, utm sides, fragment) collapses to ONE
    // canonical url; doc_id 7 starts the next group
    val docs = (0L to 7L).map(i => (i, "en", "s"))
      .toDF("doc_id", "lang", "source")
    val got = TextAnalysis.urlCanon(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(
      ("https://s.example.com/en/doc0?id=0", 7L, 0L),
      ("https://s.example.com/en/doc1?id=1", 1L, 7L)))
  }
}
