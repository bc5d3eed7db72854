package graft

import graft.functions.QDigest
import org.scalatest.funsuite.AnyFunSuite

/** q-digest guarantees, asserted as hard booleans (the sketch is
  * deterministic-error — see the QDigest scaladoc): exactness below k,
  * the L·⌊n/k⌋ rank bound on adversarial input, bound survival under
  * arbitrary merge trees, mass conservation, size bound, and the
  * portable byte round-trip.
  */
class QDigestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rankWindow(sorted: Array[Long], v: Long): (Long, Long) = {
    var lo = 0L
    var hi = 0L
    var i = 0
    while (i < sorted.length) {
      if (sorted(i) < v) lo += 1
      if (sorted(i) <= v) hi += 1
      i += 1
    }
    (lo, hi)
  }

  private def assertBound(qd: QDigest, sorted: Array[Long], pcts: Seq[Int]): Unit = {
    val n = sorted.length.toLong
    assert(qd.n === n, "mass not conserved")
    assert(qd.nodes <= 3 * qd.k, s"${qd.nodes} nodes > 3k=${3 * qd.k}")
    val bound = qd.levels * (n / qd.k)
    for (p <- pcts) {
      val target = (p * n + 99) / 100
      val est = qd.quantileAtRank(target)
      val (lo, hi) = rankWindow(sorted, est)
      assert(lo <= target + bound && hi >= target - bound,
        s"p$p: est $est rank window [$lo,$hi] misses target $target ± $bound")
    }
  }

  test("below k points the digest is exact") {
    val qd = new QDigest(16, 10000)
    val vals = (0 until 1000).map(i => ((i * 2654435761L) % 65536)).toArray
    vals.foreach(qd.insert)
    val sorted = vals.sorted
    for (p <- Seq(1, 10, 50, 90, 100)) {
      val target = (p * 1000L + 99) / 100
      // exact: the estimate IS the order statistic at the target rank
      assert(qd.quantileAtRank(target) === sorted((target - 1).toInt))
    }
  }

  test("adversarial sorted input respects the L*floor(n/k) rank bound") {
    val qd = new QDigest(17, 64)
    val n = 100000
    (0 until n).foreach(i => qd.insert(i.toLong % 131072))
    assertBound(qd, (0 until n).map(_.toLong % 131072).sorted.toArray,
      Seq(1, 5, 25, 50, 75, 95, 99))
  }

  test("the bound survives any merge tree; n and compactness hold") {
    val n = 60000
    val data = (0 until n).map(i => (i * 48271L) % 131072).toArray
    val chunks = data.grouped(n / 16 + 1).toArray
    def sketchOf(c: Array[Long]) = {
      val q = new QDigest(17, 64); c.foreach(q.insert); q
    }
    // balanced pairwise tree
    var level = chunks.map(sketchOf).toSeq
    while (level.size > 1)
      level = level.grouped(2).map {
        case Seq(a, b) => a.merge(b)
        case Seq(a) => a
      }.toSeq
    assertBound(level.head, data.sorted, Seq(1, 25, 50, 75, 99))
    // left-fold chain (worst-case merge depth)
    val chain = chunks.map(sketchOf).reduceLeft(_.merge(_))
    assertBound(chain, data.sorted, Seq(1, 25, 50, 75, 99))
  }

  test("portable bytes round-trip the digest exactly") {
    val qd = new QDigest(17, 64)
    (0 until 50000).foreach(i => qd.insert((i * 69621L) % 131072))
    val back = QDigest.deserialize(qd.serialize())
    assert(back.n === qd.n && back.levels === qd.levels && back.k === qd.k)
    for (p <- Seq(1, 50, 99))
      assert(back.quantile(p / 100.0) === qd.quantile(p / 100.0))
  }

  test("registrable as a SQL UDAF") {
    import org.apache.spark.sql.functions
    spark.udf.register("qdigest_test",
      functions.udaf(QDigest.aggregator(16, 128)))
    val row = spark.sql(
      "SELECT qdigest_test(CAST(id % 1024 AS LONG)) FROM range(5000)")
      .head()
    val qd = QDigest.deserialize(row.getAs[Array[Byte]](0))
    assert(qd.n === 5000)
    assert(qd.nodes <= 3 * 128)
  }

  test("misuse fails loudly") {
    val qd = new QDigest(8, 16)
    intercept[IllegalArgumentException] { qd.insert(256) } // off-universe
    intercept[IllegalArgumentException] { qd.insert(-1) }
    intercept[IllegalArgumentException] { qd.quantile(0.5) } // empty
    qd.insert(5)
    intercept[IllegalArgumentException] { qd.merge(new QDigest(9, 16)) }
    intercept[IllegalArgumentException] { qd.quantileAtRank(2) } // > n
  }
}
