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
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0)
    // salt from the per-partition row index, not a row hash or rand():
    // fully identical rows (hot sentinel keys are often exact duplicates)
    // still spread across salts, unhashable column types (MapType) work,
    // and re-execution under task retry is deterministic as long as the
    // upstream partition order is (same contract as any zipWithIndex)
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
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
