package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Static vector kernels callable from generated code. */
object VectorOps {
  /** Left-to-right dot product over two array<double> columns — the same
    * summation order as `aggregate(zip_with(...))` on equal-length
    * null-free arrays, so results are bit-identical to the
    * higher-order-function formulation it replaces. Mismatched lengths
    * and null elements throw (the unsafe row format would otherwise read
    * a null slot as raw 0.0 — silently wrong, never an error; the
    * analysis-time type check on [[DotProduct]] can't see VALUES).
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_dot: $n-element vector vs ${b.numElements()}-element vector")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"vec_dot: null element at index $i — a dot product over null " +
            "components is undefined; filter or impute first")
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** SRP bucket codes for [[SrpCodes]]: code_t has bit b set when the
    * left-to-right dot of v against plane (t*bits + b) is strictly
    * positive — identical fold and identical strict `> 0` rule as the
    * `vecDot(v, plane) > 0` column form, so codes match bit-for-bit.
    * Dimension mismatches throw (never silent truncation).
    */
  def srpCodes(v: ArrayData, planes: Array[Array[Double]],
               bits: Int): ArrayData = {
    val d = v.numElements()
    val tables = planes.length / bits
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var b = 0
      while (b < bits) {
        val p = planes(t * bits + b)
        require(p.length == d,
          s"srp_codes: ${d}-element vector vs ${p.length}-element plane")
        var s = 0.0
        var i = 0
        while (i < d) { s += v.getDouble(i) * p(i); i += 1 }
        if (s > 0) code |= 1L << b
        b += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  /** The `n` nearest centroids of `v` by cosine, as cent_ids ordered by
    * (cosine desc, cent_id asc) — the kernel behind [[TopCentroids]].
    * Zero-norm vectors or centroids score -2.0 (below every real cosine)
    * instead of 0/0 = NaN; ties break to the LOWEST cent_id ([[TopCentroids]]
    * guarantees ids arrive sorted ascending, so the strict `>` keeping the
    * first seen IS lowest-id) — both exactly the semantics of the
    * sort_array(struct(csim, -cid)) formulation this replaces. A vector
    * whose dimension differs from a centroid's throws (never a silent
    * truncation).
    */
  def topCentroids(v: ArrayData, ids: Array[Long], cents: Array[Array[Double]],
                   norms: Array[Double], n: Int): ArrayData = {
    val d = v.numElements()
    var s = 0.0
    var i = 0
    while (i < d) { val x = v.getDouble(i); s += x * x; i += 1 }
    val vn = math.sqrt(s)
    val k = cents.length
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cn = norms(c)
      val cv = cents(c)
      require(cv.length == d,
        s"top_centroids: ${d}-element vector vs ${cv.length}-element centroid")
      sims(c) =
        if (cn == 0.0 || vn == 0.0) -2.0
        else {
          var t = 0.0
          var j = 0
          while (j < d) { t += v.getDouble(j) * cv(j); j += 1 }
          t / (vn * cn)
        }
      c += 1
    }
    val out = new Array[Long](math.min(n, k))
    val taken = new Array[Boolean](k)
    var o = 0
    while (o < out.length) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) && (best < 0 || sims(c2) > sims(best))) best = c2
        c2 += 1
      }
      taken(best) = true
      out(o) = ids(best)
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for the dot product of two array<double>
  * columns. Spark's higher-order functions (`aggregate`, `zip_with`) are
  * evaluated interpretively per row with intermediate array allocation;
  * this expression stays inside whole-stage codegen and loops over the
  * unsafe array data directly — measured ~4x on the brute-force ANN scan.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // analysis-time guard: ArrayData.getDouble on a non-double array
  // reinterprets raw bits (NaN garbage, not an error) — reject any
  // element type other than double LOUDLY before a single row flows.
  // (Spark's floor() returning BIGINT makes array<bigint> an easy slip.)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native top-n-nearest-centroid assignment over an array<double> column.
  * The k×dim centroid matrix (with ids and precomputed norms) travels as a
  * plain constructor parameter — a single reference object in generated
  * code — NOT as k×dim literal children: the round-5 formulation built k
  * structs of dim-element `typedLit`s and paid ~3 s of one-time
  * Catalyst-analysis + codegen cost per session for k=16, dim=64
  * (measured; the dominant share of the ann_ivf fixed-cost floor). The
  * expression stays inside whole-stage codegen, needs no join and no
  * shuffle, and its driver-side state is bounded by the PARAMETERS (k×dim
  * doubles), never the data.
  */
case class TopCentroids(child: Expression, ids: Array[Long],
                        cents: Array[Array[Double]], n: Int)
    extends UnaryExpression {
  require(ids.length == cents.length && cents.nonEmpty && n >= 1)
  // the kernel's tie-break (strict > keeps first seen) equals the
  // documented lowest-id rule only when ids ascend — an exact k-way tie
  // is REAL (a zero-norm input scores every centroid -2.0)
  require(ids.zip(ids.tail).forall { case (a, b) => a < b },
    "TopCentroids ids must be strictly ascending (vector.topCentroids sorts)")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_centroids"

  // same fold as VectorOps.dot(c, c), so norms are bit-identical to what
  // sqrt(vecDot(cv, cv)) computed in the expression formulation
  @transient private lazy val norms: Array[Double] =
    cents.map { cv =>
      var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      math.sqrt(s)
    }

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.topCentroids(v.asInstanceOf[ArrayData], ids, cents, norms, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("centIds", ids, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("centNorms", norms, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorOps.topCentroids($v, $idsRef, $centsRef, $normsRef, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}

/** Native sign-random-projection bucket codes: one long code per table,
  * bit b of table t = (dot(v, plane[t*bits+b]) > 0). The planes matrix
  * travels as ONE codegen reference object — the column formulation built
  * tables×bits dim-element `typedLit` planes (2048 literals at 8×4×64,
  * TWICE per lshTopK call for query and candidate sides) and paid the
  * same per-session Catalyst-analysis + codegen cost class that
  * [[TopCentroids]] removed from ann_ivf. Dots fold left-to-right exactly
  * like [[VectorOps.dot]], so codes are bit-identical to the
  * `vecDot(v, plane) > 0` column form this replaces.
  */
case class SrpCodes(child: Expression, planes: Array[Array[Double]], bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits < 63 && planes.nonEmpty &&
    planes.length % bits == 0,
    s"SrpCodes: ${planes.length} planes not a multiple of $bits bits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_codes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_codes requires array<double>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    VectorOps.srpCodes(v.asInstanceOf[ArrayData], planes, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorOps.srpCodes($v, $planesRef, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpCodes =
    copy(child = newChild)
}

/** Elementwise mean of an array<double> column, computed over exact
  * micro-fixed-point longs: each element is rounded HALF_UP to 6 decimals
  * (the same `round(x, 6)` the decimal formulation used), scaled to an
  * integer micro count, and summed in ONE Array[Long] buffer — long
  * addition is commutative/associative, so the result is independent of
  * shuffle arrival order, exactly like the decimal(18,6) sum it replaces.
  * The replaced form was `dim` separate round→cast→sum(decimal) aggregate
  * columns, whose generated aggregate class cost ~1.7 s of one-time Janino
  * compilation for dim=64 (the largest slice of the ann_ivf fixed-cost
  * floor). Partial aggregation (map-side combine) works as usual; the
  * shuffle carries one (dim+1)-long buffer per (partition, group).
  *
  * Bounds: the int64 buffer holds ~9.2e12 micro-units per group; the
  * decimal(18,6) sum it replaced widens to decimal(28,6) (~1e22), so the
  * integer form DOES overflow earlier — which is why both update and
  * merge add with Math.addExact: an overflowing group throws loudly
  * instead of wrapping into a silently wrong mean. Ample for unit-scale
  * embedding corpora (1e12 rows of |x| ≤ 1 per cell before the throw).
  *
  * Inputs must all have exactly `dim` elements — a shorter or longer
  * vector throws (the element_at formulation this replaces failed the
  * same way under ANSI), never silently truncates or zero-fills.
  */
case class VecMicroMean(child: Expression, dim: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(dim >= 1)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_micro_mean"

  // buffer layout: [0, dim) element micro sums, [dim] row count
  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim + 1)

  private def micros(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      require(a.numElements() == dim,
        s"vec_micro_mean(dim=$dim) got a ${a.numElements()}-element vector")
      var i = 0
      while (i < dim) { b(i) = Math.addExact(b(i), micros(a.getDouble(i))); i += 1 }
      b(dim) += 1
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= dim) { b(i) = Math.addExact(b(i), o(i)); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any =
    if (b(dim) == 0) null
    else {
      val n = b(dim)
      val out = new Array[Double](dim)
      var i = 0
      // same boundary as sum(decimal(18,6)).cast(double) / count: one
      // exact-decimal-to-double conversion, then one IEEE division
      while (i < dim) {
        out(i) = java.math.BigDecimal.valueOf(b(i), 6).doubleValue() / n
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * b.length)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): VecMicroMean =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VecMicroMean =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): VecMicroMean =
    copy(child = newChild)
}

object vector {
  /** Dot product of two array<double> columns (codegen'd). */
  def vecDot(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))

  /** Order-independent elementwise mean of an array<double> column
    * (6-decimal fixed point; see [[VecMicroMean]]).
    */
  def vecMicroMean(v: Column, dim: Int): Column =
    GraftShims.column(VecMicroMean(GraftShims.expression(v), dim)
      .toAggregateExpression())

  /** Per-table SRP bucket codes of an array<double> column (codegen'd;
    * planes indexed [t*bits + b] — see [[SrpCodes]]).
    */
  def srpCodes(v: Column, planes: Seq[Seq[Double]], bits: Int): Column =
    GraftShims.column(SrpCodes(GraftShims.expression(v),
      planes.map(_.toArray).toArray, bits))

  /** cent_ids of the `n` nearest centroids of `v`, cosine-descending with
    * ties to the lowest id (codegen'd; see [[TopCentroids]]). Accepts
    * centroids in any order — sorted by id here so the tie-break holds.
    */
  def topCentroids(v: Column, cents: Seq[(Long, Seq[Double])], n: Int): Column = {
    val sorted = cents.sortBy(_._1)
    GraftShims.column(TopCentroids(GraftShims.expression(v),
      sorted.map(_._1).toArray, sorted.map(_._2.toArray).toArray, n))
  }
}
