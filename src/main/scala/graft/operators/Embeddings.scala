package graft.operators

import graft.tables.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Embedding-column operators for a training-data pipeline: per-vector
  * statistics, L2 normalization, and per-label centroids. The embeddings
  * table carries `Array[Float]`; all math widens to double FIRST and folds
  * left-to-right, so the per-vector reductions are bit-identical to the
  * oracle's list functions (same IEEE op sequence).
  *
  * Cross-row reductions (centroids) cannot rely on accumulation order —
  * Spark's partial aggregation sums in partition order. Components are
  * therefore rounded to 6 decimals (exact: no float widens to an exact
  * 7th-decimal midpoint, floats being dyadic rationals) and summed as
  * DECIMAL(18,6), which is order-independent; only the final mean leaves
  * as double. Same pattern as the money columns in [[graft.queries.Relational]].
  *
  * Scale notes: stats/normalize are scan-stage only. Centroids explode to
  * (row x dim) before the partial agg — shuffle volume is O(labels x dim),
  * independent of row count, because the map-side combine collapses each
  * partition to its local per-(label,pos) sums.
  */
object Embeddings {

  private def sq(c: Column): Column = c * c

  /** Left-fold sum of squares in double — matches DuckDB's
    * list_aggregate(list_transform(CAST(e AS DOUBLE[]), x -> x*x), 'sum').
    */
  def l2NormSq(e: Column): Column =
    aggregate(e, lit(0.0), (acc, x) => acc + sq(x.cast("double")))

  /** Per-vector statistics: dimension, L2 norm, max |component|.
    * Norms are rounded to 6 decimals at the boundary (sqrt of the exact
    * same double is exact, but downstream joins shouldn't key on a raw
    * 17-digit double).
    */
  def stats(emb: DataFrame): DataFrame =
    emb.select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      round(sqrt(l2NormSq(col("embedding"))), 6).as("l2_norm"),
      round(array_max(transform(col("embedding"), x => abs(x.cast("double")))), 6)
        .as("max_abs"))

  /** L2-normalized copy of the embedding column (unit vectors — the form
    * cosine-similarity pipelines cache). Zero vectors pass through as-is.
    */
  def normalized(emb: DataFrame, out: String = "unit"): DataFrame = {
    val n = sqrt(l2NormSq(col("embedding")))
    emb.withColumn(out,
      when(n === 0.0, col("embedding").cast("array<double>"))
        .otherwise(transform(col("embedding"), x => x.cast("double") / n)))
  }

  /** Per-label centroids, one row per (label, component position). */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(
        (sum(round(col("x").cast("double"), 6).cast(DecimalType(18, 6)))
          .cast("double") / count(lit(1))).as("centroid"),
        count(lit(1)).as("n"))
      .orderBy("label", "pos")

  /** Int8 scalar quantization — the standard 4× embedding compression for
    * ANN serving: per-vector scale = max|x|/127, code_i = round-half-up of
    * x_i/scale. floor(x·127/m + 0.5) is used instead of round() because
    * half-up is engine-portable while round() is banker's in some engines.
    * Zero vectors quantize to all-zero codes with scale 0. The checked
    * output carries order-independent integer summaries of the codes
    * (sum/min/max — exact in any engine); the codes themselves stay
    * distributed, scan-stage only.
    */
  /** Embedding dimension inferred from the data (1-value aggregate, never
    * hardcoded). An EMPTY table has no dimension: return 1 so plane
    * construction stays well-formed and the caller's pipeline runs to an
    * empty result with the correct schema (a bare `.getInt(0)` would NPE
    * on the null aggregate).
    */
  private[operators] def dimOf(emb: DataFrame): Int = {
    val r = emb.agg(max(size(col("embedding"))).as("d")).head()
    if (r.isNullAt(0)) 1 else r.getInt(0)
  }

  /** Half-up int8 code of component `x` at scale max-abs `m` — the
    * [[quantizeInt8]] formula as a reusable column (floor yields BIGINT,
    * cast back so downstream dot products read exact small integers in
    * double). ONE definition for every exact-integer-cosine consumer
    * (quantization drift between two copies would silently break the
    * cross-operator agreement AND the DuckDB oracle parity).
    */
  def int8Code(x: Column, m: Column): Column =
    floor(x * lit(127.0) / m + lit(0.5)).cast("double")

  /** Signed squared cosine from EXACT integer dot and squared norms:
    * sign(dot)·dot² / (na·nb) — numerator and denominator exact int64,
    * one IEEE division, monotone in cosine, bit-identical in any engine
    * (a raw float cosine chain is not: FMA contraction differs).
    *
    * Zero-norm guard (r13 fuzzer): a zero or tiny vector quantizes to
    * all-zero codes, making na·nb = 0 — under Spark's ANSI default that
    * division THROWS and kills the whole job, which is exactly what a
    * 100 TB run cannot afford from one degenerate row. Cosine is
    * undefined there; such pairs score the library's −2.0 sentinel
    * (below every real scos2 ∈ [−1, 1] — the TopCentroids convention),
    * mirrored in the oracle SQL fragments.
    */
  def exactScos2(dot: Column, na: Column, nb: Column): Column =
    when(na * nb === 0, lit(-2.0)).otherwise(
      when(dot < 0, -(dot * dot)).otherwise(dot * dot).cast("double") /
        (na * nb).cast("double"))

  def quantizeInt8(emb: DataFrame): DataFrame =
    int8CodesWithId(emb)
      .select(
        col("vec_id"),
        round(col("m") / 127.0, 6).as("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"))

  /** Hyperplane sign for (plane, dim): md5-prefix parity of "rp:p,d" —
    * the [[graft.functions.hashes.portableHash60]] construction evaluated
    * driver-side, so the planes are CONSTANT vectors the executors never
    * rebuild; the oracle derives the identical ±1 matrix from the same
    * md5 parity in SQL.
    */
  private def rpSign(p: Int, d: Int): Double =
    graft.functions.hashes.md5ParitySign(s"rp:$p,$d")

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions with
    * ±1 (Achlioptas) planes — the standard cheap dimensionality reduction
    * before ANN indexing or clustering: pairwise distances are preserved
    * within (1 ± ε) while per-vector cost drops outDim/dim-fold downstream.
    *
    * Determinism: vectors are int8-quantized first (the
    * [[quantizeInt8]] half-up formula — exact small integers in double),
    * and the planes are ±1, so every projected component is a SIGN-SUM of
    * exact integers: bit-identical in any engine, no FP accumulation
    * order anywhere. Zero vectors project to the zero vector.
    *
    * Scale shape: scan-stage only — the plane matrix is a codegen
    * constant, each row's projection is outDim dot products inside the
    * same whole-stage-codegen pass, zero shuffle, zero driver state
    * beyond the outDim×dim parameter matrix.
    */
  def randomProject(emb: DataFrame, outDim: Int = 16): DataFrame = {
    import graft.functions.vector.vecDot
    val dim = dimOf(emb)
    val planes = (0 until outDim).map { p =>
      typedLit((0 until dim).map(d => rpSign(p, d)))
    }
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("m", array_max(transform(col("v"), x => abs(x))))
      .withColumn("q",
        when(col("m") === 0.0, transform(col("v"), _ => lit(0.0)))
          .otherwise(transform(col("v"), x => int8Code(x, col("m")))))
      .select(col("vec_id"),
        array(planes.map(pl => vecDot(col("q"), pl).cast("bigint")): _*)
          .as("proj"))
  }

  /** Int8 code vectors (array<bigint>) — [[quantizeInt8]]'s exact-integer
    * codes kept as a column for operators that consume whole vectors
    * (Gram accumulation, PCA projection). Zero vectors code to all-zero.
    */
  private[operators] def int8Codes(emb: DataFrame): DataFrame =
    int8CodesWithId(emb).select(col("q"))

  /** Distributed Gram-matrix sufficient statistics over the embedding
    * column: Σ qqᵀ (upper triangle), Σ q, and n — everything PCA/whitening
    * /covariance needs, in ONE pass. Vectors are int8-quantized first, so
    * every sum is exact int64 and the result hash-matches the oracle
    * replay (order of accumulation cannot matter for integers).
    *
    * This is the one operator family where `mapPartitions` beats any
    * Catalyst formulation: the SQL shape explodes each row into d(d+1)/2
    * pair structs (2080 per row at d=64 — a 2000× row inflation feeding
    * the partial aggregate), while the imperative kernel keeps ONE
    * long[2080] accumulator per partition and walks each vector with two
    * tight loops. Communication is identical (P × d² partial rows into a
    * d²-key final aggregate); the scan-stage CPU differs by orders of
    * magnitude. Same architecture as classic RowMatrix.computeGramian,
    * but the reduce is a normal tiny shuffle, not a driver treeAggregate
    * — the driver never holds more than the d×d result it asked for.
    *
    * Output rows: (i, j, s, n) for i ≤ j — s = Σ q_i·q_j; plus (i, -1,
    * Σ q_i, n) per-dimension sum rows. Overflow headroom: |q| ≤ 127 so
    * each row adds ≤ 16129 per cell — int64 saturates only past 5·10¹⁴
    * rows per cluster, far beyond 100 TB of embeddings.
    */
  def gramMatrix(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val d = dimOf(emb)
    val triples = int8Codes(emb).select(col("q")).as[Seq[Long]]
      .mapPartitions { it =>
        val nPairs = d * (d + 1) / 2
        val gram = new Array[Long](nPairs)
        val sums = new Array[Long](d)
        var n = 0L
        while (it.hasNext) {
          val q = it.next()
          // ragged or null input throws loudly (the VectorOps convention:
          // never silently truncate, zero-fill, or NPE without context)
          require(q != null,
            "gramMatrix: corpus contains a NULL embedding — filter or impute first")
          require(q.length == d,
            s"gramMatrix: $d-dim corpus contains a ${q.length}-dim vector")
          n += 1
          var i = 0
          var k = 0
          while (i < d) {
            val qi = q(i)
            sums(i) += qi
            var j = i
            while (j < d) { gram(k) += qi * q(j); j += 1; k += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty
        else {
          val dimRows = Iterator.tabulate(d)(i => (i, -1, sums(i), n))
          val gramRows = for {
            i <- Iterator.range(0, d)
            j <- Iterator.range(i, d)
          } yield (i, j, gram(i * d - i * (i - 1) / 2 + (j - i)), n)
          dimRows ++ gramRows
        }
      }
    triples.toDF("i", "j", "s_part", "n_part")
      .groupBy("i", "j")
      .agg(sum(col("s_part")).cast("long").as("s"),
        sum(col("n_part")).cast("long").as("n"))
      .orderBy("i", "j")
  }

  /** Driver-side PCA finish over [[gramMatrix]]'s sufficient statistics:
    * covariance C = (G − s·sᵀ/n)/n, then a cyclic Jacobi eigensolver on
    * the d×d matrix (d ≤ a few hundred — the DISTRIBUTED work is the one
    * Gram pass; the O(d³) finish is microseconds and belongs on the
    * driver, like the k-means centroid step). Returns eigenpairs sorted
    * by descending eigenvalue: (eigenvalue, component vector).
    */
  def pcaFromGram(gram: Array[((Int, Int), Long)], dimSums: Array[Long],
                  n: Long): Seq[(Double, Array[Double])] = {
    val d = dimSums.length
    val c = Array.ofDim[Double](d, d)
    gram.foreach { case ((i, j), s) =>
      val cij = (s.toDouble - dimSums(i).toDouble * dimSums(j) / n) / n
      c(i)(j) = cij
      c(j)(i) = cij
    }
    jacobiEigen(c)
  }

  /** Cyclic Jacobi eigensolver over a symmetric matrix (MUTATES `c`) —
    * the shared O(d³) driver-side finish of [[pcaFromGram]] and the
    * Procrustes polar factor. Returns eigenpairs sorted by descending
    * eigenvalue.
    */
  private[operators] def jacobiEigen(
      c: Array[Array[Double]]): Seq[(Double, Array[Double])] = {
    val d = c.length
    // rotate away the largest off-diagonal until negligible
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 100 && {
      var off = 0.0
      for (i <- 0 until d; j <- i + 1 until d) off += c(i)(j) * c(i)(j)
      off > 1e-18
    }) {
      for (p <- 0 until d; q <- p + 1 until d if math.abs(c(p)(q)) > 1e-15) {
        val theta = 0.5 * math.atan2(2 * c(p)(q), c(q)(q) - c(p)(p))
        val (cs, sn) = (math.cos(theta), math.sin(theta))
        for (k <- 0 until d) {
          val (ckp, ckq) = (c(k)(p), c(k)(q))
          c(k)(p) = cs * ckp - sn * ckq
          c(k)(q) = sn * ckp + cs * ckq
        }
        for (k <- 0 until d) {
          val (cpk, cqk) = (c(p)(k), c(q)(k))
          c(p)(k) = cs * cpk - sn * cqk
          c(q)(k) = sn * cpk + cs * cqk
        }
        for (k <- 0 until d) {
          val (vkp, vkq) = (v(k)(p), v(k)(q))
          v(k)(p) = cs * vkp - sn * vkq
          v(k)(q) = sn * vkp + cs * vkq
        }
      }
      sweep += 1
    }
    (0 until d).map(i => (c(i)(i), Array.tabulate(d)(k => v(k)(i))))
      .sortBy(-_._1)
  }

  /** PCA projection — the end-to-end dimensionality-reduction transform:
    * [[gramMatrix]]'s distributed sufficient statistics → driver-side
    * [[pcaFromGram]] eigensolve (bounded d×d) → every vector projected
    * onto the top-k components IN-ROW (the component matrix is a literal
    * constant, like [[randomProject]]'s planes — scan-stage, zero
    * shuffle beyond the one Gram pass).
    *
    * The projection is float (eigenvectors are irrational); the driver
    * records it rows-only, and PipelineOpsSpec pins the semantics the
    * hash cannot: per-component sample variance equals its eigenvalue
    * and distinct components are empirically uncorrelated. The Gram
    * stage underneath stays hash-checked (emb_gram).
    */
  def pcaProject(emb: DataFrame, topK: Int = 8): DataFrame = {
    val basis = pcaBasis(emb, topK)
    projectOn(emb, basis)
  }

  /** Driver-side PCA basis over one collected [[gramMatrix]] pass —
    * the shared front half of [[pcaProject]] and [[pcaContract]]:
    * top-k eigenpairs (6-dp-rounded components — the projection's
    * published grain), the code-space mean, the corpus size, and the
    * EXACT integer covariance-trace numerator
    * Σ_i (n·G_ii − s_i²) = n²·trace(C) — the oracle-checkable scalar
    * the contract panel publishes (each term ≤ n²·127², so the sum is
    * far inside int64 for any driver-collectable d).
    */
  private[operators] final case class PcaBasis(
      eig: Seq[(Double, Array[Double])], mean: Array[Double],
      n: Long, traceNum: Long)

  private[operators] def pcaBasis(emb: DataFrame, topK: Int): PcaBasis = {
    val rows = gramMatrix(emb).collect()
    val dimSums = rows.filter(_.getInt(1) == -1)
      .map(r => r.getInt(0) -> r.getLong(2)).sortBy(_._1).map(_._2)
    val gram = rows.filter(_.getInt(1) >= 0)
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
    require(dimSums.nonEmpty, "pcaBasis: empty embedding table")
    val n = rows.head.getLong(3)
    val diag = gram.collect { case ((i, j), s) if i == j => i -> s }.toMap
    val traceNum = dimSums.indices
      .map(i => n * diag(i) - dimSums(i) * dimSums(i)).sum
    val eig = pcaFromGram(gram, dimSums, n).take(topK)
      .map { case (l, v) => (l, v.map(x => BigDecimal(x).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)) }
    PcaBasis(eig, dimSums.map(_.toDouble / n), n, traceNum)
  }

  /** The in-row projection onto a driver-side basis — scan-stage, zero
    * shuffle (components ride as literal constants, like
    * [[randomProject]]'s planes).
    */
  private def projectOn(emb: DataFrame, basis: PcaBasis): DataFrame = {
    import graft.functions.vector.vecDot
    val comps = basis.eig.map { case (_, v) => typedLit(v.toSeq) }
    val centered = int8CodesWithId(emb)
      .withColumn("c", transform(col("q"),
        (x, i) => x.cast("double") -
          element_at(typedLit(basis.mean.toSeq), i + 1)))
    centered.select(col("vec_id") +:
      comps.zipWithIndex.map { case (v, k) =>
        vecDot(col("c"), v).as(s"p$k")
      }: _*)
  }

  /** The hash-gated PCA CONTRACT panel — the r12 verdict's ask to close
    * the roster's last `no_oracle` entry. Float eigenvectors have no
    * cross-engine SQL replay, so (q21's accuracy-contract pattern) the
    * gated row per component k publishes what an independent engine CAN
    * check — the corpus size and the exact integer n²·trace(C) (the
    * oracle recomputes both from the raw table via the emb_gram
    * quantization) — next to four machine-checked eigen LAWS the oracle
    * asserts hold (TRUE):
    *
    *  - `var_matches`: the distributed sample variance of projection k
    *    equals its eigenvalue (rel 1e-3 — absorbs the 6-dp component
    *    rounding) — the defining property of a principal axis;
    *  - `orthonormal_ok`: pairwise |vᵢ·vⱼ − δᵢⱼ| ≤ 1e-4 over the top-k (the 6-dp
    *    rounding moves a dot by ≤ 2·√d·5e-7 ≈ 8e-6 at d=64);
    *  - `descending_ok`: eigenvalues sorted non-increasing;
    *  - `explained_le_trace`: Σ top-k eigenvalues ≤ trace(C) (+1e-6) —
    *    captured variance cannot exceed total variance.
    *
    * A Jacobi regression, a broken projection, or a quantization drift
    * flips a law to FALSE and turns the entry hash-red. The full
    * per-row projections remain the library API ([[pcaProject]],
    * property-tested in PipelineOpsSpec); the Gram sufficient
    * statistics underneath stay value-gated as emb_gram.
    */
  def pcaContract(emb: DataFrame, topK: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val basis = pcaBasis(emb, topK)
    val k = basis.eig.length
    val d = basis.mean.length
    val trace = basis.traceNum.toDouble / (basis.n.toDouble * basis.n)
    val descending = basis.eig.map(_._1).sliding(2)
      .forall(p => p.length < 2 || p(0) >= p(1))
    val orthonormal = (for {
      i <- 0 until k; j <- i until k
    } yield {
      val dot = (0 until d)
        .map(x => basis.eig(i)._2(x) * basis.eig(j)._2(x)).sum
      math.abs(dot - (if (i == j) 1.0 else 0.0))
    }).forall(_ <= 1e-4)
    val explainedLe = basis.eig.map(_._1).sum <= trace + 1e-6
    // one distributed agg pass: Σp and Σp² per component
    val proj = projectOn(emb, basis)
    val aggs = (0 until k).flatMap(i => Seq(
      sum(col(s"p$i")).as(s"s$i"),
      sum(col(s"p$i") * col(s"p$i")).as(s"ss$i")))
    val m = proj.agg(aggs.head, aggs.tail: _*).first()
    val varMatches = (0 until k).map { i =>
      val s = m.getDouble(2 * i)
      val ss = m.getDouble(2 * i + 1)
      val v = ss / basis.n - (s / basis.n) * (s / basis.n)
      val lambda = basis.eig(i)._1
      math.abs(v - lambda) <= 1e-3 * math.max(math.abs(lambda), 1.0)
    }
    (0 until k).map(i => (i, basis.n, basis.traceNum, varMatches(i),
        orthonormal, descending, explainedLe))
      .toDF("k", "n", "trace_num", "var_matches", "orthonormal_ok",
        "descending_ok", "explained_le_trace")
      .orderBy("k")
  }

  /** PCA whitening projection — the decorrelation step a vector pipeline
    * runs before PQ/IVF codebook training (product quantizers assume
    * roughly isotropic residuals; OPQ's first move is exactly this
    * rotation+rescale). Per row: wₖ = (q − mean)·eₖ / √λₖ over the
    * RETAINED axes — components with λₖ ≤ 1e-9·max(tr(C)/d, 1) are
    * dropped, not divided by ≈0 (a rank-deficient corpus must not mint
    * ±∞; the planted-degenerate spec pins this). Same scan-stage shape as
    * [[pcaProject]]: basis and scales ride as literals, zero shuffle.
    */
  def whitenProject(emb: DataFrame, topK: Int = 8): DataFrame = {
    val basis = pcaBasis(emb, topK)
    val d = basis.mean.length
    val floor = 1e-9 * math.max(
      basis.traceNum.toDouble / (basis.n.toDouble * basis.n * d), 1.0)
    val kept = basis.eig.filter(_._1 > floor)
    projectOn(emb, basis.copy(eig = kept))
      .select(col("vec_id") +: kept.indices.map(k =>
        (col(s"p$k") / math.sqrt(kept(k)._1)).as(s"w$k")): _*)
  }

  /** The hash-gated whitening CONTRACT panel (the emb_pca pattern: float
    * projections have no SQL replay, so the gate publishes what an
    * independent engine CAN check — n and the exact integer n²·trace(C),
    * oracle-recomputed from the raw table — next to machine-checked
    * LAWS the oracle asserts TRUE):
    *  - `unit_var_ok`: the distributed population variance of wₖ is 1
    *    (rel 1e-3 — absorbs the 6-dp component rounding). THE defining
    *    property of whitening;
    *  - `mean_zero_ok`: |mean(wₖ)| ≤ 1e-2 (centering survived the
    *    rounded basis);
    *  - `decorrelated_ok`: every pairwise |cov(wᵢ, wⱼ)| ≤ 1e-3 — the
    *    identity covariance off-diagonal.
    * The panel always publishes `topK` rows (the emb_pca oracle shape —
    * the oracle's row count must be data-independent): axes DROPPED by
    * the rank floor publish vacuous TRUE laws — the retention behavior
    * itself is API-level and pinned by the planted-degenerate spec, not
    * the hash gate. One distributed agg pass computes Σwₖ, Σwₖ², and all
    * Σwᵢwⱼ (k(k+3)/2 partial-agg columns — 44 at k=8); a whitening
    * regression flips a law FALSE and the entry goes hash-red.
    */
  def whitenContract(emb: DataFrame, topK: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val basis = pcaBasis(emb, topK)
    val d = basis.mean.length
    val floor = 1e-9 * math.max(
      basis.traceNum.toDouble / (basis.n.toDouble * basis.n * d), 1.0)
    val kept = basis.eig.filter(_._1 > floor)
    val k = kept.length
    val meanVarsCov: (Seq[Double], Seq[Double], Seq[Double]) =
      if (k == 0) (Nil, Nil, Nil)
      else {
        val w = projectOn(emb, basis.copy(eig = kept))
          .select(col("vec_id") +: kept.indices.map(i =>
            (col(s"p$i") / math.sqrt(kept(i)._1)).as(s"w$i")): _*)
        val aggs =
          (0 until k).flatMap(i => Seq(
            sum(col(s"w$i")).as(s"s$i"),
            sum(col(s"w$i") * col(s"w$i")).as(s"ss$i"))) ++
          (for { i <- 0 until k; j <- i + 1 until k } yield
            sum(col(s"w$i") * col(s"w$j")).as(s"c${i}_$j"))
        val m = w.agg(aggs.head, aggs.tail: _*).first()
        val n = basis.n.toDouble
        val mean = (0 until k).map(i => m.getDouble(2 * i) / n)
        val vars = (0 until k).map(i =>
          m.getDouble(2 * i + 1) / n - mean(i) * mean(i))
        val cov = (for { i <- 0 until k; j <- i + 1 until k } yield
          (i, j)).zipWithIndex.map { case ((i, j), x) =>
            m.getDouble(2 * k + x) / n - mean(i) * mean(j) }
        (mean, vars, cov)
      }
    val (mean, vars, cov) = meanVarsCov
    val meanZero = mean.forall(x => math.abs(x) <= 1e-2)
    val decorrelated = cov.forall(x => math.abs(x) <= 1e-3)
    (0 until topK).map(i => (i, basis.n, basis.traceNum,
        i >= k || math.abs(vars(i) - 1.0) <= 1e-3, meanZero, decorrelated))
      .toDF("k", "n", "trace_num", "unit_var_ok", "mean_zero_ok",
        "decorrelated_ok")
      .orderBy("k")
  }

  /** The distributed half of Procrustes: the d×d cross-Gram
    * M = Σ b qᵀ between the code space and its derived twin
    * b = σ·reverse(q) (σᵢ = +1 on even dims, −1 on odd — the planted
    * signed permutation the alignment must RECOVER), plus n and the
    * code energy Σ‖q‖². One kernel pass, d² long accumulators per
    * partition, the same partial-agg shuffle shape as [[gramMatrix]];
    * the collect is d²+1 rows — parameter-bounded, never corpus-sized.
    */
  private[operators] def crossGramReversal(
      emb: DataFrame): (Array[Array[Long]], Long, Long) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val d = dimOf(emb)
    val rows = int8Codes(emb).as[Seq[Long]]
      .mapPartitions { it =>
        val m = new Array[Long](d * d)
        var n = 0L
        var qe = 0L
        while (it.hasNext) {
          val q = it.next()
          require(q != null,
            "crossGramReversal: corpus contains a NULL embedding")
          require(q.length == d,
            s"crossGramReversal: $d-dim corpus contains a ${q.length}-dim vector")
          n += 1
          var i = 0
          while (i < d) {
            val bi = (if (i % 2 == 0) 1L else -1L) * q(d - 1 - i)
            var j = 0
            while (j < d) { m(i * d + j) += bi * q(j); j += 1 }
            qe += q(i) * q(i)
            i += 1
          }
        }
        if (n == 0) Iterator.empty
        else Iterator.single((-1, -1, qe, n)) ++
          Iterator.tabulate(d * d)(x => (x / d, x % d, m(x), n))
      }
      .toDF("i", "j", "s_part", "n_part")
      .groupBy("i", "j")
      .agg(sum(col("s_part")).cast("long").as("s"),
        sum(col("n_part")).cast("long").as("n"))
      .collect()
    require(rows.nonEmpty, "crossGramReversal: empty embedding table")
    val m = Array.ofDim[Long](d, d)
    var n = 0L
    var qe = 0L
    rows.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getLong(2))
      if (i == -1) { qe = s; n = r.getLong(3) }
      else m(i)(j) = s
    }
    (m, n, qe)
  }

  /** The hash-gated Procrustes CONTRACT panel — cross-space orthogonal
    * alignment, the operator an embedding MIGRATION runs (re-trained
    * encoder, new model version: find the rotation R = argmin Σ‖Rq − b‖²
    * s.t. RᵀR = I, then map the old index through R instead of
    * re-embedding the corpus). Space B derives row-locally as the signed
    * reversal of the codes, so the optimal R is KNOWN analytically
    * (R* = S·J — polar(S·J·G) with G ⪰ 0), and the contract checks the
    * pipeline actually recovers it:
    *  - `full_rank_ok`: every eigenvalue of MᵀM clears 1e-12·λmax (the
    *    polar factor is unique);
    *  - `orthonormal_ok`: max |RᵀR − I| ≤ 1e-6;
    *  - `permutation_ok`: R matches the planted signed reversal entry by
    *    entry (pattern cells within 1e-6 of ±1, every other cell ≤ 1e-6);
    *  - `residual_ok`: relative residual (2Σ‖q‖² − 2·tr(RMᵀ)) / 2Σ‖q‖²
    *    ≤ 1e-9 — b IS an orthogonal map of q, so alignment is exact.
    * Published next to the oracle-replayable exact integers: n, the code
    * energy Σ‖q‖², and tr(M) = Σᵢ σᵢ·Σ q_{d−1−i}·qᵢ (both SQL-derivable
    * from the raw table). The SVD finish is the driver-side d×d Jacobi
    * ([[jacobiEigen]] on MᵀM) — the distributed work is the ONE
    * cross-Gram pass.
    */
  def procrustesContract(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (mL, n, qe) = crossGramReversal(emb)
    val d = mL.length
    val m = mL.map(_.map(_.toDouble))
    val mtm = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => m(k)(i) * m(k)(j)).sum)
    val eig = jacobiEigen(mtm)
    val lmax = math.max(eig.head._1, 1e-300)
    val floor = 1e-12 * lmax
    val fullRank = eig.forall(_._1 > floor)
    // R = M V Λ^{-1/2} Vᵀ over retained axes
    val r = Array.ofDim[Double](d, d)
    eig.filter(_._1 > floor).foreach { case (l, v) =>
      val mv = Array.tabulate(d)(i => (0 until d).map(k => m(i)(k) * v(k)).sum)
      val inv = 1.0 / math.sqrt(l)
      for (i <- 0 until d; j <- 0 until d) r(i)(j) += inv * mv(i) * v(j)
    }
    val rtr = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => r(k)(i) * r(k)(j)).sum)
    val orthonormal = (for (i <- 0 until d; j <- 0 until d) yield
      math.abs(rtr(i)(j) - (if (i == j) 1.0 else 0.0))).max <= 1e-6
    val permutation = (for (i <- 0 until d; j <- 0 until d) yield {
      val want = if (j == d - 1 - i) (if (i % 2 == 0) 1.0 else -1.0) else 0.0
      math.abs(r(i)(j) - want)
    }).max <= 1e-6
    val trRM = (for (i <- 0 until d; j <- 0 until d) yield r(i)(j) * m(i)(j)).sum
    val residual = (2.0 * qe - 2.0 * trRM) / math.max(2.0 * qe, 1e-300)
    val xgramTrace = (0 until d).map(i => mL(i)(i)).sum
    Seq((n, qe, xgramTrace, fullRank, orthonormal, permutation,
        residual <= 1e-9))
      .toDF("n", "q_energy", "xgram_trace", "full_rank_ok",
        "orthonormal_ok", "permutation_ok", "residual_ok")
  }

  /** THE int8 code builder — (vec_id, m, q) with m = max|component| and q
    * the exact-integer code array. Every quantization consumer
    * ([[quantizeInt8]], [[int8Codes]], [[pcaProject]]) derives from this
    * one pipeline: a second copy of the half-up formula is exactly the
    * silent-drift hazard the [[int8Code]] scaladoc warns about.
    */
  private[operators] def int8CodesWithId(emb: DataFrame,
                                         keep: Seq[String] = Nil): DataFrame =
    emb.select(col("vec_id") +: keep.map(col) :+
        col("embedding").cast("array<double>").as("v"): _*)
      .withColumn("m", array_max(transform(col("v"), x => abs(x))))
      .select(col("vec_id") +: keep.map(col) :+ col("m") :+
        when(col("m") === 0.0, transform(col("v"), _ => lit(0L)))
          .otherwise(transform(col("v"),
            x => int8Code(x, col("m")).cast("bigint"))).as("q"): _*)

  /** Corpus isotropy diagnostics — the "is there a dominant common
    * direction?" panel a training-data pipeline runs before cosine-based
    * dedup/ANN (anisotropic corpora make every pair look similar:
    * Mu & Viswanath 2018 "all-but-the-top", Ethayarajh 2019). One summary
    * row of EXACT integers over the int8 codes, from two algebraic
    * identities that need only per-dimension sufficient statistics
    * (sᵢ = Σ qᵢ, gᵢᵢ = Σ qᵢ², shared with the Gram/PCA family):
    *   Σ_{a≠b} qₐ·q_b = ‖Σq‖² − Σ‖q‖²     (mean pairwise dot, NO pair join)
    *   n²·tr(C)       = n·Σ‖q‖² − ‖Σq‖²   (total centered scatter)
    *   top-dim share  = maxᵢ(n·gᵢᵢ − sᵢ²) / Σᵢ(n·gᵢᵢ − sᵢ²)
    * A corpus with a strong common direction shows pair_dot_num ≫ 0 and a
    * top_share_ppm far above 1e6/d; an isotropic one hovers near both
    * floors. Squared terms ride DECIMAL(38,0) (sᵢ² passes 2⁶³ once
    * n·127 crosses ~3·10⁹, i.e. ~2·10⁷ rows — well inside 100 TB) and
    * publish through [[graft.queries.Relational.boundedLong]], so both
    * engines fail loudly and identically past the BIGINT envelope.
    *
    * Scale shape: ONE corpus scan into a d-key partial aggregate (the
    * posexplode inflates rows ×d but stays inside whole-stage codegen and
    * combines map-side), then two aggregates over the d-row frame and a
    * broadcast of the 1-row argmax — no pair join, no second scan, no
    * driver collect. The quadratic quantities come from algebra, not
    * enumeration, which is the only shape that survives n ~ 10¹⁰.
    */
  def isotropyPanel(emb: DataFrame): DataFrame =
    isotropyFromPerDim(perDimStats(emb))

  /** The per-dimension sufficient-statistic fold (sᵢ, gᵢᵢ, n per dim) —
    * factored so the streaming twin can run it as a Complete-mode
    * aggregate (the embedding-DRIFT monitor: anisotropy as ingest
    * proceeds) and finalize sink-side.
    */
  private[graft] def perDimStats(emb: DataFrame): DataFrame =
    int8CodesWithId(emb)
      .select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(sum(col("x")).as("si"),
        sum(col("x") * col("x")).as("gii"),
        count(lit(1)).as("nd"))

  /** The isotropy finalization over any (i, si, gii, nd) per-dim frame. */
  private[graft] def isotropyFromPerDim(per0: DataFrame): DataFrame = {
    import Exact.{D38 => D}
    import graft.queries.Relational.boundedLong
    val per = per0
      .withColumn("var_num",
        col("nd").cast(D) * col("gii").cast(D)
          - col("si").cast(D) * col("si").cast(D))
    val tot = per.agg(
      max(col("nd")).as("n"),
      count(lit(1)).as("d"),
      // exact DECIMAL accumulation; the BIGINT publish goes through
      // boundedLong below like every other wide column, so both engines
      // fail loudly and IDENTICALLY on overflow (a raw .cast("long")
      // silently wraps/NULLs under non-ANSI Spark while the oracle's
      // CAST raises — the one asymmetric overflow contract left in r13)
      sum(col("gii").cast(D)).as("sum_norm2_d"),
      sum(col("si").cast(D) * col("si").cast(D)).as("sv2"),
      sum(col("var_num")).as("scatter"))
    // d-row frame → 1-row argmax (ties → lowest dim); broadcast-bounded
    val top = per.orderBy(col("var_num").desc, col("i").asc).limit(1)
      .select(col("i").cast("long").as("top_dim"),
        col("var_num").as("top_var"))
    tot.crossJoin(broadcast(top)).select(
      col("n"), col("d"),
      boundedLong(col("sum_norm2_d"), "sum_norm2").as("sum_norm2"),
      boundedLong(col("sv2"), "sumvec_norm2").as("sumvec_norm2"),
      boundedLong(col("sv2") - col("sum_norm2_d"), "pair_dot_num")
        .as("pair_dot_num"),
      boundedLong(col("n").cast(D) * (col("n") - 1).cast(D), "pair_den")
        .as("pair_den"),
      boundedLong(col("scatter"), "scatter_num").as("scatter_num"),
      col("top_dim"),
      boundedLong(col("top_var"), "top_var_num").as("top_var_num"),
      // integral div of two non-negative DECIMALs: trunc ≡ floor, and
      // Spark `div` ≡ DuckDB `//` (both truncate — the r13 fuzzer law)
      when(col("scatter") > 0,
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * top_var)" +
          " div scatter AS BIGINT)")).as("top_share_ppm"))
  }

  /** Per-label embedding outlier flags — the mislabeled/noisy-vector
    * filter of a curation pipeline: each vector's squared L2 distance to
    * its label centroid, flagged when it exceeds 4× the label's mean
    * squared distance (the ">2σ-equivalent radius" rule, kept as a single
    * integer cross-multiplication instead of a mean + sqrt).
    *
    * Exactness: vectors are int8-quantized ([[int8CodesWithId]] — THE one
    * quantization source), so with per-label code sums S and count n the
    * centroid is the rational S/n and
    *   dist²·n² = Σ_j (n·q_j − S_j)²
    * is an EXACT integer (DECIMAL(38,0) — the per-dim square passes 2^63
    * once n·|q| crosses ~3·10⁹, i.e. ~10⁷ rows per label, well inside
    * 100 TB). The flag dist²·n > 4·Σdist² and the exported double
    * dist2 = int(dist²·n²)/int(n²) are a decimal comparison and one
    * IEEE division of exactly-converted integers: engine-portable.
    *
    * Scale shape: two corpus scans — one partial-agg pass building the
    * O(labels × dim) per-label sufficient statistics (Σq, Σq², n), one
    * scoring pass — with the statistics BROADCAST back (class-cardinality-
    * bounded); the corpus itself never shuffles. The label's TOTAL squared
    * distance needs no third pass: Σᵢdistᵢ²·n² = n²·ΣⱼQⱼ − n·ΣⱼSⱼ²
    * algebraically (Qⱼ = Σᵢq²ᵢⱼ), so the threshold comes from the same
    * bounded statistics. Zero vectors participate like any other code (no
    * division by norms anywhere).
    */
  def outlierFlags(emb: DataFrame): DataFrame = {
    import Exact.{D38 => D, dec}
    val codes = int8CodesWithId(emb, keep = Seq("label"))
      .select(col("vec_id"), col("label"), col("q"))
    val labelStats = codes
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(sum(col("x")).as("s"), sum(col("x") * col("x")).as("q2"),
        count(lit(1)).as("n_part"))
      .groupBy("label")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          e => e.getField("s")).as("s_vec"),
        sum(col("q2")).as("sq2"),
        max(col("n_part")).as("n"))
      // Σᵢ dist²ᵢ·n² = n²·ΣQ − n·ΣS² (exact decimal, bounded rows only)
      .withColumn("sum_dist",
        dec(col("n")) * dec(col("n")) * dec(col("sq2")) -
          dec(col("n")) * aggregate(col("s_vec"),
            lit(java.math.BigDecimal.ZERO).cast(D),
            (acc, s) => acc + dec(s) * dec(s)))
    codes
      .join(broadcast(labelStats), "label")
      .withColumn("dist_num",
        aggregate(
          zip_with(col("q"), col("s_vec"), (qi, si) => col("n") * qi - si),
          lit(java.math.BigDecimal.ZERO).cast(D),
          (acc, x) => acc + dec(x) * dec(x)))
      .select(col("vec_id"), col("label"),
        (col("dist_num").cast("double") /
          (col("n") * col("n")).cast("double")).as("dist2"),
        (col("dist_num") * dec(col("n")) >
          lit(4).cast(D) * col("sum_dist")).cast("int").as("is_outlier"))
  }

  /** Nonzero int8 code vectors as exact small integers in DOUBLE — the
    * form the exact-cosine kernels consume ([[knnLabel]],
    * [[Similarity.hybridRrf]]): zero vectors have no cosine and are
    * excluded, like the oracles. ONE definition next to
    * [[int8CodesWithId]] (whose bigint codes INCLUDE zero vectors — the
    * Gram/PCA contract) for the same anti-drift reason.
    */
  private[operators] def nonZeroCodes(emb: DataFrame,
                                      keep: Seq[String] = Nil): DataFrame =
    emb.select(col("vec_id") +: keep.map(col) :+
        col("embedding").cast("array<double>").as("v"): _*)
      .withColumn("m", array_max(transform(col("v"), x => abs(x))))
      .filter(col("m") > 0.0)
      .select(col("vec_id") +: keep.map(col) :+
        transform(col("v"), x => int8Code(x, col("m"))).as("q"): _*)

  /** k-NN majority-label classification over the embedding column — the
    * label-propagation / weak-supervision primitive: each query vector is
    * assigned the majority label of its k nearest neighbors (ties toward
    * the smaller label id so the vote is total and deterministic).
    *
    * Neighbor ranking uses the exact-integer quantized cosine of
    * [[Dedup.semanticDedup]]: sign(dot)·dot² / (‖a‖²·‖b‖²) over
    * int8-quantized vectors — one IEEE division of exact int64s, monotone
    * in cosine, bit-identical in every engine (a raw double-cosine ranking
    * can flip under FMA contraction). Zero vectors have no cosine and are
    * excluded from both sides, like the oracle.
    *
    * Scale shape: the query side is bounded (`nQueries`) and explicitly
    * broadcast — the corpus side streams through the scan, never shuffles
    * for the join; the per-query top-k is a window over that query's
    * candidate rows. This is the exact brute-force baseline by
    * construction (like [[Similarity.bruteForceTopK]]); the LSH/IVF paths
    * in [[Similarity]] are the sub-linear variants at corpus scale.
    */
  def knnLabel(emb: DataFrame, k: Int = 5, nQueries: Int = 100): DataFrame = {
    import graft.functions.vector.vecDot
    import org.apache.spark.sql.expressions.Window
    val qv = nonZeroCodes(emb, keep = Seq("label"))
    val queries = broadcast(qv.filter(col("vec_id") < nQueries).limit(nQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("q").as("qq")))
    val dot = vecDot(col("qq"), col("q")).cast("long")
    val scored = qv.join(queries, col("vec_id") =!= col("qid"))
      .withColumn("dot", dot)
      .withColumn("na", vecDot(col("qq"), col("qq")).cast("long"))
      .withColumn("nb", vecDot(col("q"), col("q")).cast("long"))
      .withColumn("scos2", exactScos2(col("dot"), col("na"), col("nb")))
    val byQ = Window.partitionBy("qid")
    val topk = scored
      .withColumn("rn", row_number().over(
        byQ.orderBy(col("scos2").desc, col("vec_id").asc)))
      .filter(col("rn") <= k)
    val votes = topk.groupBy(col("qid"), col("qlabel"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    votes
      .withColumn("vr", row_number().over(
        byQ.orderBy(col("n_votes").desc, col("label").asc)))
      .filter(col("vr") === 1)
      .select(col("qid").as("vec_id"), col("qlabel").as("label"),
        col("label").as("pred_label"), col("n_votes"))
  }

  // --- driver-checked query surface ---

  /** Simplified silhouette — per-vector cluster-quality: a = squared
    * distance to the OWN label's centroid, b = squared distance to the
    * nearest OTHER centroid (deterministic argmin: (d², label) order),
    * s = (b − a)/max(a, b) — the centroid-only silhouette variant
    * (Hruschka et al.), which needs |labels| distance probes per vector
    * instead of the full silhouette's all-pairs scan. Distances fold
    * over zip_with in POSITION order (a deterministic left fold) and
    * every published float is rounded to 6 decimals — the emb_stats
    * convention that absorbs sub-ulp fold differences across engines.
    * The measurement that tells a curation pipeline whether its labels
    * actually cluster in embedding space.
    *
    * Scale: centroids are one partial agg; the probe is a labels-sized
    * broadcast cross — |labels| ≪ corpus by construction.
    */
  def silhouette(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val carr = centroids(emb)
      .groupBy(col("label").as("c_label"))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"), col("centroid")))),
        s => s.getField("centroid")).as("carr"))
    val dists = emb
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("e"))
      .crossJoin(broadcast(carr))
      .withColumn("d2", round(aggregate(
        zip_with(col("e"), col("carr"), (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, y) => acc + y), 6))
    val own = dists.filter(col("label") === col("c_label"))
      .select(col("vec_id"), col("label"), col("d2").as("a2"))
    val nearest = dists.filter(col("label") =!= col("c_label"))
      .withColumn("rn", row_number().over(
        W.partitionBy("vec_id").orderBy(col("d2"), col("c_label"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_label").as("nearest_other"),
        col("d2").as("b2"))
    own.join(nearest, "vec_id")
      .select(col("vec_id"), col("label"), col("a2"),
        col("nearest_other"), col("b2"),
        when(greatest(col("a2"), col("b2")) > 0,
          round((col("b2") - col("a2"))
            / greatest(col("a2"), col("b2")), 6)).as("silhouette"))
      .orderBy("vec_id")
  }

  /** Engine-exact Lloyd k-means over the embedding column — the clustering
    * primitive a curation pipeline runs BEFORE SemDeDup-style semantic
    * dedup or cluster-balanced sampling. [[graft.operators.Similarity]]
    * has carried Lloyd refinement since round 5 (`kmeansCentroids`), but
    * only ungated: float centroid means sum in engine-dependent order, so
    * the refined quantizer could never hash against an oracle. This
    * variant makes Lloyd itself oracle-checkable by keeping every step in
    * exact integer arithmetic:
    *
    *  - components quantize to a GLOBAL milli-grid `⌊x·1000⌋` (float →
    *    double widening is exact, one correctly-rounded multiply, exact
    *    floor — bit-identical in any IEEE engine), unlike the per-vector
    *    int8 scale of [[quantizeInt8]] (a per-vector scale would warp
    *    inter-vector distances);
    *  - assignment = argmin of exact int64 SSDs, ties to the LOWEST
    *    cluster index (array_position finds the first minimum);
    *  - the centroid update is a component-wise FLOOR-division mean,
    *    `(s − pmod(s, n)) div n`: component sums are signed, and Spark's
    *    `div` truncates toward zero where DuckDB's `//` floors — they
    *    disagree on negatives — so the pmod subtraction makes the
    *    numerator exactly divisible first, after which every integral
    *    division is exact in both engines (the q159 signed-quotient rule,
    *    solved with modular arithmetic instead of IEEE);
    *  - a cluster that comes up empty keeps its PREVIOUS centroid.
    *
    * Scale shape: assignment is scan-stage in-row math against the k×dim
    * literal centroid matrix (no crossJoin, no window); the update is one
    * posexplode + partial-agg shuffle whose key space is k×dim —
    * independent of row count; the driver holds k×dim longs between
    * passes (the same parameter-bounded collect as `centroidsLocal` /
    * the IVF codebooks). `iters` is fixed, so the whole job is
    * iters+1 scans. Component sums ride int64: |comp| ≤ 1000·max|x|, so
    * overflow needs ~9·10¹⁵ unit-scale rows per cluster; the 100 TB form
    * swaps the sum column to DECIMAL(38,0) unchanged.
    */
  def kmeansExact(emb: DataFrame, k: Int = 4, iters: Int = 3): DataFrame = {
    val qv = emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1000).cast("long")).as("q"))
    // bounded collect: the k seed vectors — parameters, never the corpus
    val seeds: Seq[Seq[Long]] = qv.orderBy("vec_id").limit(k).collect().toSeq
      .map(_.getSeq[Long](1).toVector)
    require(seeds.nonEmpty,
      "emb_kmeans: embeddings table is empty — no seed centroids")
    val dim = seeds.head.length

    def assign(cents: Seq[Seq[Long]]): DataFrame = {
      val ssds = cents.map { c =>
        aggregate(zip_with(col("q"), typedLit(c), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, y) => acc + y)
      }
      qv.withColumn("ssds", array(ssds: _*))
        .withColumn("ssd", array_min(col("ssds")))
        .withColumn("cluster",
          (array_position(col("ssds"), col("ssd")) - 1).cast("int"))
    }

    var cents = seeds
    for (_ <- 0 until iters) {
      // one distributed pass: k×dim keys out of the partial agg
      val upd = assign(cents)
        .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .withColumn("c", expr("(s - pmod(s, n)) div n"))
        .select("cluster", "pos", "c")
        .collect() // bounded: k × dim rows
      val m = upd.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      cents = cents.zipWithIndex.map { case (prev, j) =>
        if (m.contains((j, 0))) Vector.tabulate(dim)(p => m((j, p)))
        else prev // empty cluster: previous centroid survives
      }
    }
    assign(cents)
      .select(col("vec_id"), col("cluster"), col("ssd"))
      .orderBy("vec_id")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_silhouette" -> ((s, d) =>
      silhouette(Tables.load(s, d, "embeddings"))),
    "emb_kmeans" -> ((s, d) =>
      kmeansExact(Tables.load(s, d, "embeddings"))),
    "emb_stats" -> ((s, d) =>
      stats(Tables.load(s, d, "embeddings")).orderBy("vec_id")),
    "emb_centroids" -> ((s, d) =>
      centroids(Tables.load(s, d, "embeddings"))),
    "emb_quantize" -> ((s, d) =>
      quantizeInt8(Tables.load(s, d, "embeddings")).orderBy("vec_id")),
    // checked output is the exploded (vec_id, p, x) long form: the
    // driver's hash compare (like this repo's check.py) can't factorize
    // array cells; the library API keeps the per-row projected vector
    "emb_rp" -> ((s, d) =>
      randomProject(Tables.load(s, d, "embeddings"))
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("p", "x")))
        .orderBy("vec_id", "p")),
    "emb_knn_label" -> ((s, d) =>
      knnLabel(Tables.load(s, d, "embeddings")).orderBy("vec_id")),
    "emb_outlier" -> ((s, d) =>
      outlierFlags(Tables.load(s, d, "embeddings")).orderBy("vec_id")),
    "emb_gram" -> ((s, d) =>
      gramMatrix(Tables.load(s, d, "embeddings"))),
    // hash-gated CONTRACT panel (float eigenvectors have no SQL replay,
    // so the gate is q21's accuracy-contract pattern: oracle-checkable
    // exact integers + machine-checked eigen laws); the per-row
    // projections remain the pcaProject library API, property-tested in
    // PipelineOpsSpec, and the Gram stage stays value-gated as emb_gram
    "emb_pca" -> ((s, d) =>
      pcaContract(Tables.load(s, d, "embeddings"))),
    "emb_isotropy" -> ((s, d) =>
      isotropyPanel(Tables.load(s, d, "embeddings"))),
    "emb_whitening" -> ((s, d) =>
      whitenContract(Tables.load(s, d, "embeddings"))),
    "emb_procrustes" -> ((s, d) =>
      procrustesContract(Tables.load(s, d, "embeddings"))),
  )

  def oracle: Map[String, String] = Map(
    // emb_kmeans: the full Lloyd replay, unrolled — per iteration, a
    // k-bounded cross to exact int64 SSDs, the (ssd, c) argmin, and the
    // pmod-floor-division centroid mean ((s − ((s%n)+n)%n) // n ≡ Spark's
    // (s − pmod(s,n)) div n on an exactly-divisible numerator); empty
    // clusters coalesce to the previous iteration's centroid
    "emb_kmeans" -> {
      def it(t: Int): String =
        s"""a$t AS (
           |  SELECT vec_id, q, c,
           |    list_aggregate(list_transform(list_zip(q, cent),
           |      p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum') AS ssd
           |  FROM qv, c${t - 1}),
           |b$t AS (
           |  SELECT vec_id, q, c, ssd, row_number() OVER (
           |    PARTITION BY vec_id ORDER BY ssd, c) AS rn
           |  FROM a$t),
           |u$t AS (
           |  SELECT c, i.p AS pos,
           |    CAST(sum(q[i.p]) AS BIGINT) AS s, count(*) AS n
           |  FROM b$t, idx i WHERE rn = 1 GROUP BY 1, 2),
           |n$t AS (
           |  SELECT c, list(CAST((s - ((s % n) + n) % n) // n AS BIGINT)
           |                 ORDER BY pos) AS cent
           |  FROM u$t GROUP BY 1),
           |c$t AS (
           |  SELECT p.c, coalesce(n$t.cent, p.cent) AS cent
           |  FROM c${t - 1} p LEFT JOIN n$t ON n$t.c = p.c)""".stripMargin
      val iters = 3
      s"""WITH qv AS (
         |  SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]),
         |      x -> CAST(floor(x * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |idx AS (SELECT unnest(range(1,
         |  (SELECT CAST(max(len(embedding)) AS BIGINT) + 1
         |   FROM embeddings))) AS p),
         |c0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, q AS cent
         |  FROM (SELECT vec_id, q FROM qv ORDER BY vec_id LIMIT 4)),
         |${(1 to iters).map(it).mkString(",\n")},
         |fin AS (
         |  SELECT vec_id, c,
         |    list_aggregate(list_transform(list_zip(q, cent),
         |      p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum') AS ssd
         |  FROM qv, c$iters)
         |SELECT vec_id, CAST(c AS INTEGER) AS cluster,
         |  CAST(ssd AS BIGINT) AS ssd
         |FROM (SELECT vec_id, c, ssd, row_number() OVER (
         |        PARTITION BY vec_id ORDER BY ssd, c) AS rn FROM fin)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin
    },
    // emb_silhouette: the same rounded-DECIMAL centroid means, the
    // same position-order zip fold (round-6 on both engines — the
    // emb_stats convention), the same (d2, label) argmin order
    "emb_silhouette" ->
      """WITH x AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |px AS (
        |  SELECT label, generate_subscripts(e, 1) AS pos,
        |         unnest(e) AS v
        |  FROM x),
        |cen AS (
        |  SELECT label, pos,
        |    CAST(sum(CAST(round(v, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*) AS c
        |  FROM px GROUP BY 1, 2),
        |carr AS (SELECT label AS c_label, list(c ORDER BY pos) AS carr
        |         FROM cen GROUP BY 1),
        |d AS (
        |  SELECT x.vec_id, x.label, carr.c_label,
        |    round(list_aggregate(list_transform(list_zip(x.e, carr.carr),
        |      p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 6) AS d2
        |  FROM x, carr),
        |own AS (SELECT vec_id, label, d2 AS a2 FROM d
        |        WHERE label = c_label),
        |oth AS (
        |  SELECT vec_id, c_label, d2,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY d2, c_label) AS rn
        |  FROM d WHERE label <> c_label)
        |SELECT own.vec_id, own.label, a2,
        |  oth.c_label AS nearest_other, oth.d2 AS b2,
        |  CASE WHEN greatest(a2, oth.d2) > 0 THEN
        |    round((oth.d2 - a2) / greatest(a2, oth.d2), 6) END
        |    AS silhouette
        |FROM own JOIN oth ON oth.vec_id = own.vec_id AND rn = 1
        |ORDER BY own.vec_id""".stripMargin,
    "emb_gram" ->
      """WITH qq AS (
        |  SELECT CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |       ELSE list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))
        |    END AS q
        |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |                                  x -> abs(x))) AS m
        |        FROM embeddings)),
        |idx AS (SELECT unnest(range(1,
        |  (SELECT CAST(max(len(embedding)) AS BIGINT) + 1 FROM embeddings))) AS p),
        |gram AS (
        |  SELECT CAST(a.p - 1 AS INTEGER) AS i, CAST(b.p - 1 AS INTEGER) AS j,
        |    CAST(sum(q[a.p] * q[b.p]) AS BIGINT) AS s, count(*) AS n
        |  FROM qq, idx a, idx b WHERE a.p <= b.p GROUP BY 1, 2),
        |dims AS (
        |  SELECT CAST(p - 1 AS INTEGER) AS i, CAST(-1 AS INTEGER) AS j,
        |    CAST(sum(q[p]) AS BIGINT) AS s, count(*) AS n
        |  FROM qq, idx GROUP BY 1)
        |SELECT i, j, s, n FROM gram
        |UNION ALL SELECT i, j, s, n FROM dims
        |ORDER BY i, j""".stripMargin,
    // emb_isotropy: the same diagonal statistics as emb_pca's trace,
    // extended with the sum-vector identities; HUGEINT mirrors Spark's
    // DECIMAL(38,0) and the bounded CASEs mirror boundedLong
    "emb_isotropy" -> {
      import graft.queries.Relational.boundedLongSql
      s"""WITH qq AS (
        |  SELECT CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |       ELSE list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))
        |    END AS q
        |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |                                  x -> abs(x))) AS m
        |        FROM embeddings)),
        |idx AS (SELECT unnest(range(1,
        |  (SELECT CAST(max(len(embedding)) AS BIGINT) + 1 FROM embeddings))) AS p),
        |pv AS (
        |  SELECT i, si, gii, nd, nd * gii - si * si AS var_num FROM (
        |    SELECT a.p AS i,
        |      CAST(sum(q[a.p]) AS HUGEINT) AS si,
        |      CAST(sum(q[a.p] * q[a.p]) AS HUGEINT) AS gii,
        |      CAST(count(*) AS HUGEINT) AS nd
        |    FROM qq, idx a GROUP BY 1)),
        |tot AS (
        |  SELECT CAST(max(nd) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS d,
        |    sum(gii) AS sum_norm2_h,
        |    sum(si * si) AS sv2, sum(var_num) AS scatter
        |  FROM pv),
        |top AS (SELECT CAST(i - 1 AS BIGINT) AS top_dim, var_num AS top_var
        |        FROM pv ORDER BY var_num DESC, i LIMIT 1)
        |SELECT n, d,
        |  ${boundedLongSql("sum_norm2_h", "sum_norm2")} AS sum_norm2,
        |  ${boundedLongSql("sv2", "sumvec_norm2")} AS sumvec_norm2,
        |  ${boundedLongSql("sv2 - sum_norm2_h", "pair_dot_num")} AS pair_dot_num,
        |  ${boundedLongSql("CAST(n AS HUGEINT) * (n - 1)", "pair_den")} AS pair_den,
        |  ${boundedLongSql("scatter", "scatter_num")} AS scatter_num,
        |  top_dim,
        |  ${boundedLongSql("top_var", "top_var_num")} AS top_var_num,
        |  CASE WHEN scatter > 0
        |    THEN CAST((1000000 * top_var) // scatter AS BIGINT)
        |  END AS top_share_ppm
        |FROM tot, top""".stripMargin
    },
    // emb_procrustes: the alignment laws assert TRUE; the exact integers
    // (n, code energy, cross-Gram trace under the signed reversal)
    // replay from the raw table
    "emb_procrustes" ->
      """WITH qq AS (
        |  SELECT CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |       ELSE list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))
        |    END AS q
        |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |                                  x -> abs(x))) AS m
        |        FROM embeddings)),
        |idx AS (SELECT unnest(range(1,
        |  (SELECT CAST(max(len(embedding)) AS BIGINT) + 1 FROM embeddings))) AS p),
        |dd AS (SELECT CAST(max(len(embedding)) AS BIGINT) AS d
        |       FROM embeddings),
        |base AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qq),
        |qe AS (SELECT CAST(sum(q[a.p] * q[a.p]) AS BIGINT) AS q_energy
        |       FROM qq, idx a),
        |xt AS (
        |  SELECT CAST(sum(CASE WHEN (a.p - 1) % 2 = 0
        |                  THEN q[dd.d + 1 - a.p] * q[a.p]
        |                  ELSE -(q[dd.d + 1 - a.p] * q[a.p]) END) AS BIGINT)
        |    AS xgram_trace
        |  FROM qq, idx a, dd)
        |SELECT n, q_energy, xgram_trace,
        |  TRUE AS full_rank_ok, TRUE AS orthonormal_ok,
        |  TRUE AS permutation_ok, TRUE AS residual_ok
        |FROM base, qe, xt""".stripMargin,
    // emb_whitening: emb_pca's oracle shape — the exact integers replay
    // from the raw table, the whitening laws are asserted TRUE
    "emb_whitening" ->
      """WITH qq AS (
        |  SELECT CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |       ELSE list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))
        |    END AS q
        |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |                                  x -> abs(x))) AS m
        |        FROM embeddings)),
        |idx AS (SELECT unnest(range(1,
        |  (SELECT CAST(max(len(embedding)) AS BIGINT) + 1 FROM embeddings))) AS p),
        |cell AS (
        |  SELECT a.p AS i,
        |    CAST(sum(q[a.p] * q[a.p]) AS BIGINT) AS gii,
        |    CAST(sum(q[a.p]) AS BIGINT) AS si,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM qq, idx a GROUP BY 1),
        |tr AS (
        |  SELECT CAST(sum(n * gii - si * si) AS BIGINT) AS trace_num,
        |    max(n) AS n
        |  FROM cell)
        |SELECT CAST(ks.k AS INTEGER) AS k, n, trace_num,
        |  TRUE AS unit_var_ok, TRUE AS mean_zero_ok,
        |  TRUE AS decorrelated_ok
        |FROM tr, (SELECT unnest(range(8)) AS k) ks
        |ORDER BY k""".stripMargin,
    // emb_pca: the contract panel — the oracle independently recomputes
    // the corpus size and the exact integer n²·trace(C) from the raw
    // table (the emb_gram quantization, diagonal + dim sums only) and
    // asserts the four eigen laws hold; the Spark side publishes the
    // actually-measured law verdicts (see Embeddings.pcaContract)
    "emb_pca" ->
      """WITH qq AS (
        |  SELECT CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |       ELSE list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))
        |    END AS q
        |  FROM (SELECT CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |                                  x -> abs(x))) AS m
        |        FROM embeddings)),
        |idx AS (SELECT unnest(range(1,
        |  (SELECT CAST(max(len(embedding)) AS BIGINT) + 1 FROM embeddings))) AS p),
        |cell AS (
        |  SELECT a.p AS i,
        |    CAST(sum(q[a.p] * q[a.p]) AS BIGINT) AS gii,
        |    CAST(sum(q[a.p]) AS BIGINT) AS si,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM qq, idx a GROUP BY 1),
        |tr AS (
        |  SELECT CAST(sum(n * gii - si * si) AS BIGINT) AS trace_num,
        |    max(n) AS n
        |  FROM cell)
        |SELECT CAST(ks.k AS INTEGER) AS k, n, trace_num,
        |  TRUE AS var_matches, TRUE AS orthonormal_ok,
        |  TRUE AS descending_ok, TRUE AS explained_le_trace
        |FROM tr, (SELECT unnest(range(8)) AS k) ks
        |ORDER BY k""".stripMargin,
    "emb_stats" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS INTEGER) AS dim,
        | round(sqrt(list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
        |                                          x -> x * x), 'sum')), 6) AS l2_norm,
        | round(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 6) AS max_abs
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "emb_quantize" ->
      """SELECT vec_id,
        | round(m / 127.0, 6) AS scale,
        | CAST(list_aggregate(q, 'sum') AS BIGINT) AS q_sum,
        | CAST(list_min(q) AS BIGINT) AS q_min,
        | CAST(list_max(q) AS BIGINT) AS q_max
        |FROM (
        |  SELECT vec_id, m,
        |    CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))
        |    END AS q
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS m
        |        FROM embeddings))
        |ORDER BY vec_id""".stripMargin,
    "emb_centroids" ->
      """SELECT label, pos,
        | CAST(sum(CAST(round(x, 6) AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS centroid,
        | count(*) AS n
        |FROM (SELECT label,
        |        CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
        |        CAST(unnest(embedding) AS DOUBLE) AS x
        |      FROM embeddings)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "emb_rp" ->
      """WITH qq AS (
        |  SELECT vec_id,
        |    CASE WHEN m = 0 THEN list_transform(v, x -> 0.0)
        |         ELSE list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS DOUBLE))
        |    END AS q
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |                                  x -> abs(x))) AS m
        |        FROM embeddings)),
        |dims AS (SELECT DISTINCT generate_subscripts(embedding, 1) AS d
        |         FROM embeddings),
        |planes AS (
        |  SELECT p, d,
        |    CASE WHEN CAST(concat('0x',
        |           substr(md5('rp:' || p || ',' || (d - 1)), 1, 15)) AS BIGINT)
        |         % 2 = 1 THEN 1.0 ELSE -1.0 END AS s
        |  FROM range(0, 16) r(p), dims),
        |proj AS (SELECT vec_id, p, CAST(sum(s * q[d]) AS BIGINT) AS x
        |         FROM qq, planes GROUP BY 1, 2)
        |SELECT vec_id, CAST(p AS INTEGER) AS p, x
        |FROM proj ORDER BY vec_id, p""".stripMargin,
    // same int8 codes; per-label sums from the exploded positions; dist²·n²
    // per row in HUGEINT (the oracle needs no algebraic Σdist shortcut —
    // it can afford the direct per-label total)
    "emb_outlier" ->
      """WITH qq AS (
        |  SELECT vec_id, label,
        |    CASE WHEN m = 0 THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |         ELSE list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS BIGINT))
        |    END AS q
        |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |                                  x -> abs(x))) AS m
        |        FROM embeddings)),
        |idx AS (SELECT unnest(range(1,
        |  (SELECT CAST(max(len(embedding)) AS BIGINT) + 1 FROM embeddings))) AS p),
        |sums AS (
        |  SELECT label, p, CAST(sum(q[p]) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM qq, idx GROUP BY 1, 2),
        |dist AS (
        |  SELECT vec_id, qq.label AS label, max(n) AS n,
        |    CAST(sum(CAST(n * q[p] - s AS HUGEINT)
        |             * CAST(n * q[p] - s AS HUGEINT)) AS HUGEINT) AS dn
        |  FROM qq JOIN sums ON qq.label = sums.label GROUP BY 1, 2),
        |tot AS (SELECT label, CAST(sum(dn) AS HUGEINT) AS sd
        |        FROM dist GROUP BY 1)
        |SELECT vec_id, label, CAST(dn AS DOUBLE) / CAST(n * n AS DOUBLE) AS dist2,
        |  CAST(dn * n > 4 * sd AS INTEGER) AS is_outlier
        |FROM dist JOIN tot USING (label)
        |ORDER BY vec_id""".stripMargin,
    "emb_knn_label" ->
      """WITH qq AS (
        |  SELECT vec_id, label,
        |    list_transform(v, x -> CAST(floor(x * 127.0 / m + 0.5) AS DOUBLE)) AS q
        |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |          list_max(list_transform(CAST(embedding AS DOUBLE[]),
        |                                  x -> abs(x))) AS m
        |        FROM embeddings) WHERE m > 0),
        |scored AS (
        |  SELECT qid, qlabel, cid, clabel,
        |    CAST(CASE WHEN dot < 0 THEN -(dot * dot) ELSE dot * dot END AS DOUBLE)
        |      / CAST(na * nb AS DOUBLE) AS scos2
        |  FROM (SELECT q.vec_id AS qid, q.label AS qlabel,
        |          c.vec_id AS cid, c.label AS clabel,
        |          CAST(list_dot_product(q.q, c.q) AS BIGINT) AS dot,
        |          CAST(list_dot_product(q.q, q.q) AS BIGINT) AS na,
        |          CAST(list_dot_product(c.q, c.q) AS BIGINT) AS nb
        |        FROM qq q JOIN qq c ON q.vec_id < 100 AND c.vec_id <> q.vec_id)),
        |topk AS (
        |  SELECT * FROM (
        |    SELECT qid, qlabel, clabel,
        |      row_number() OVER (PARTITION BY qid
        |        ORDER BY scos2 DESC, cid) AS rn
        |    FROM scored) WHERE rn <= 5),
        |votes AS (SELECT qid, qlabel, clabel, count(*) AS n_votes
        |          FROM topk GROUP BY 1, 2, 3)
        |SELECT qid AS vec_id, qlabel AS label, clabel AS pred_label, n_votes
        |FROM (SELECT votes.*, row_number() OVER (PARTITION BY qid
        |        ORDER BY n_votes DESC, clabel) AS vr FROM votes)
        |WHERE vr = 1 ORDER BY vec_id""".stripMargin,
  )
}
