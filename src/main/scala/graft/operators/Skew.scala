package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join. When one join key dominates (a hot
  * customer, an empty-string document, a null-ish sentinel), a plain
  * shuffle join lands the whole hot key in one task. Salting splits each
  * key into `salts` sub-keys: the big side gets a pseudo-random salt per
  * row, the small side is replicated once per salt — the hot key's rows
  * then spread across `salts` tasks. Complements (does not replace) AQE's
  * runtime skew-join splitting, which only helps sort-merge joins.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the big side `salts` ways.
    * Result is exactly the unsalted inner join (salt only refines the
    * partitioning). `small` is replicated `salts` times — keep it the
    * dimension side.
    *
    * Salt derivation: by default a content hash over to_json of the row
    * (works for every type incl. MapType, and is deterministic under task
    * retry even when `big` is shuffle output whose partition-internal row
    * order is not). The one shape it can't spread is a hot key whose rows
    * are fully IDENTICAL — for that, opt into `spreadIdenticalRows`, which
    * salts by per-partition row index; that salt is only retry-safe when
    * the input's row order is deterministic (e.g. a fresh file scan), so
    * it is not the default.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16, spreadIdenticalRows: Boolean = false): DataFrame = {
    require(salts > 0)
    val saltExpr =
      if (spreadIdenticalRows) pmod(monotonically_increasing_id(), lit(salts.toLong))
      else pmod(xxhash64(to_json(struct(big.columns.map(col).toIndexedSeq: _*))),
        lit(salts.toLong))
    val salted = big.withColumn("__salt", saltExpr)
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("bigint"))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-n most frequent values of `key` with their share — the probe a
    * pipeline runs before deciding to salt.
    */
  def keySkewProfile(df: DataFrame, key: Column, topN: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / total)
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
