package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** q-digest — the DETERMINISTIC-ERROR mergeable quantile sketch
  * (Shrivastava, Buragohain, Agrawal, Suri: "Medians and Beyond: New
  * Aggregation Techniques for Sensor Networks", SenSys'04), completing
  * the portable-sketch family next to HLL (q36), CMS (q38) and KMV
  * (q53/q82): distinct-count, frequency, set-ops — and now quantiles.
  *
  * Universe is [0, 2^L) integers arranged as a complete binary tree
  * (node 1 = the whole range, children 2i/2i+1, leaves at depth L);
  * the sketch is a node→count map maintained under the q-digest
  * compression invariant with threshold ⌊n/k⌋. Properties that make it
  * the right Spark aggregation sketch:
  *
  *  - FULLY MERGEABLE (Agarwal et al., "Mergeable Summaries", PODS'12):
  *    merge = add counts + recompress, and the rank-error bound
  *    ε·n with ε = L/k survives ANY merge tree — exactly the guarantee
  *    needed under Spark's nondeterministic partial-aggregation order.
  *    (GK, the comparison-based alternative, is only one-way mergeable:
  *    its error grows along uncontrolled merge chains.)
  *  - size ≤ 3k nodes after compression, independent of n;
  *  - no randomness: the bound is worst-case, not probabilistic, so a
  *    correctness gate can assert it as a hard boolean.
  *
  * The sketch CONTENTS depend on the merge order (which children got
  * folded up when), so oracle-gated queries publish only
  * order-invariant facts: n (exact by construction — compression
  * conserves mass) and the ε-rank acceptance booleans verified against
  * exact ranks (see q99_qdigest).
  */
final class QDigest(val levels: Int, val k: Int) extends Serializable {
  require(levels >= 1 && levels <= 40, s"levels out of range: $levels")
  require(k >= 2, s"compression factor k must be >= 2: $k")

  /** node id -> count; node ids in [1, 2^(levels+1)). */
  private[functions] val counts = scala.collection.mutable.LongMap.empty[Long]
  private[functions] var total: Long = 0L

  def n: Long = total
  def nodes: Int = counts.size

  private def leafBase: Long = 1L << levels

  def insert(v: Long): Unit = insertWeighted(v, 1L)

  def insertWeighted(v: Long, w: Long): Unit = {
    require(v >= 0 && v < leafBase,
      s"value $v outside the q-digest universe [0, ${leafBase})")
    require(w > 0, s"weight must be positive: $w")
    val leaf = leafBase | v
    counts(leaf) = counts.getOrElse(leaf, 0L) + w
    total += w
    // amortized compaction: let the map grow to a small multiple of the
    // compressed bound, then fold — keeps insert O(1) amortized and the
    // working set O(k)
    if (counts.size > 6 * k) compress()
  }

  def merge(other: QDigest): QDigest = {
    require(other.levels == levels && other.k == k,
      s"incompatible q-digests: ($levels,$k) vs (${other.levels},${other.k})")
    other.counts.foreach { case (id, c) =>
      counts(id) = counts.getOrElse(id, 0L) + c
    }
    total += other.total
    compress()
    this
  }

  /** Enforce the q-digest invariant: any (node, sibling, parent) triple
    * summing to ≤ ⌊n/k⌋ folds into the parent. Bottom-up by depth;
    * processing order within a depth does not affect the error bound
    * (only which of several valid digests results), but is made
    * deterministic (sorted ids) so a single-threaded build is
    * reproducible.
    */
  def compress(): Unit = {
    val t = total / k
    if (t == 0) return // fewer than k points: the digest is exact
    var depth = levels
    while (depth >= 1) {
      val lo = 1L << depth
      val hi = lo << 1
      val ids = counts.keys.filter(id => id >= lo && id < hi).toArray
      java.util.Arrays.sort(ids)
      var i = 0
      while (i < ids.length) {
        val id = ids(i)
        // canonical visit: handle a sibling pair once, via the left child
        if ((id & 1L) == 0L || !counts.contains(id ^ 1L)) {
          val left = id & ~1L
          val cl = counts.getOrElse(left, 0L)
          val cr = counts.getOrElse(left | 1L, 0L)
          val p = id >> 1
          val cp = counts.getOrElse(p, 0L)
          if (cl + cr > 0 && cl + cr + cp <= t) {
            counts -= left
            counts -= (left | 1L)
            counts(p) = cp + cl + cr
          }
        }
        i += 1
      }
      depth -= 1
    }
  }

  /** ε-approximate q-quantile: nodes in increasing upper-bound order
    * (ties: smaller range first), first upper bound whose cumulative
    * count reaches ⌈q·n⌉. Rank error ≤ (levels/k)·n.
    */
  def quantile(q: Double): Long = {
    require(q > 0.0 && q <= 1.0, s"quantile out of (0,1]: $q")
    quantileAtRank(math.max(1L, math.ceil(q * total).toLong))
  }

  /** Integer-rank form — callers who must agree bit-for-bit with an
    * external integer rank rule (q99's oracle gate) pass the exact
    * target rank and skip the IEEE ceil.
    */
  def quantileAtRank(target: Long): Long = {
    require(total > 0, "empty q-digest has no quantiles")
    require(target >= 1 && target <= total,
      s"rank $target outside [1, $total]")
    // sort by (upper bound, depth descending) — deeper = smaller range
    val ids = counts.keys.toArray
      .sortBy(id => (ub(id), -depthOf(id)))
    var cum = 0L
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      cum += counts(id)
      if (cum >= target) return ub(id)
      i += 1
    }
    ub(ids(ids.length - 1))
  }

  private def depthOf(id: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(id)

  /** Largest value covered by node `id`. */
  private def ub(id: Long): Long = {
    val d = depthOf(id)
    val span = 1L << (levels - d)
    val lb = (id - (1L << d)) * span
    lb + span - 1
  }

  /** Portable byte form: levels, k, n, size, then delta-coded sorted
    * (id, count) pairs — the cross-system exchange format, like the
    * HLL/KMV register dumps.
    */
  def serialize(): Array[Byte] = {
    compress()
    val ids = counts.keys.toArray
    java.util.Arrays.sort(ids)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeByte(levels)
    out.writeInt(k)
    out.writeLong(total)
    out.writeInt(ids.length)
    var prev = 0L
    var i = 0
    while (i < ids.length) {
      val id = ids(i)
      out.writeLong(id - prev)
      out.writeLong(counts(id))
      prev = id
      i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object QDigest {
  def deserialize(bytes: Array[Byte]): QDigest = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val levels = in.readByte().toInt
    val k = in.readInt()
    val total = in.readLong()
    val size = in.readInt()
    val qd = new QDigest(levels, k)
    var prev = 0L
    var i = 0
    var sum = 0L
    while (i < size) {
      val id = prev + in.readLong()
      val c = in.readLong()
      qd.counts(id) = c
      sum += c
      prev = id
      i += 1
    }
    require(sum == total, s"corrupt q-digest: counts $sum != n $total")
    qd.total = total
    qd
  }

  /** Typed-Dataset / SQL-registrable aggregator: values in, portable
    * sketch bytes out. Register for SQL with
    * `spark.udf.register("qdigest", functions.udaf(QDigest.aggregator(24, 2000)))`.
    */
  def aggregator(levels: Int, k: Int): Aggregator[Long, QDigest, Array[Byte]] =
    new Aggregator[Long, QDigest, Array[Byte]] {
      override def zero: QDigest = new QDigest(levels, k)
      override def reduce(b: QDigest, v: Long): QDigest = { b.insert(v); b }
      override def merge(a: QDigest, b: QDigest): QDigest = a.merge(b)
      override def finish(b: QDigest): Array[Byte] = b.serialize()
      // java serialization, not kryo: kryo's field-level reconstruction of
      // scala.collection.mutable.LongMap corrupts its open-addressing
      // invariants (observed as a JIT-compiled foreach SIGSEGV); LongMap's
      // own writeObject path round-trips correctly
      override def bufferEncoder: Encoder[QDigest] =
        Encoders.javaSerialization[QDigest]
      override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    }
}
