package graft.functions

import graft.core.MrApp
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference's generic `reducef(key, values) -> value` surfaced as a
  * Spark `Aggregator`, so any [[MrApp]] reduce function is usable from the
  * typed Dataset API AND registrable for SQL via
  * `spark.udf.register(name, functions.udaf(ReduceFAggregator(app)))` —
  * the optional UDAF wrapper from SURVEY §4.
  *
  * Semantics: the buffer accumulates ALL values for the key (the
  * reference's list contract, src/mr/worker.go:197-207 — no partial
  * reduction is possible for an opaque reducef); reducef is applied once
  * at finish. A Spark UDAF cannot see the grouping key, so this fits the
  * reference apps whose reducef ignores the key (all 8 do). For skewed
  * keys at scale prefer the native formulations in
  * [[graft.queries.MrQueries]] — this wrapper, like the reference, buffers
  * the full value list per key.
  */
object ReduceFAggregator {
  def apply(app: MrApp): Aggregator[String, List[String], String] =
    new Aggregator[String, List[String], String] {
      override def zero: List[String] = Nil
      override def reduce(b: List[String], v: String): List[String] = v :: b
      override def merge(b1: List[String], b2: List[String]): List[String] = b1 ::: b2
      override def finish(values: List[String]): String = app.reduce("", values)
      override def bufferEncoder: Encoder[List[String]] = Encoders.kryo[List[String]]
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }
}
