package graft

import graft.streaming.EventStream
import graft.queries.Relational
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch parity: the streaming operators must agree with their
  * batch twins when the finite events table is replayed as a stream.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sf0001

  test("streaming windowed counts == batch q17_time_window") {
    val stream = EventStream.readEvents(spark, dir)
    EventStream.runToMemory(
      EventStream.windowedCounts(stream), "wc_stream", OutputMode.Complete)
    val streamed = spark.table("wc_stream")
      .select("bucket", "event_type", "n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = Relational.defs("q17_time_window")(spark, dir)
      .select("bucket", "event_type", "n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("stateful sessionization: emitted + open sessions == batch sessions") {
    import spark.implicits._
    val stream = EventStream.readEvents(spark, dir)
      .select(col("event_id"), col("ts_ns"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStream.Event]
    EventStream.runToMemory(
      EventStream.sessionize(stream).toDF(), "sess_stream", OutputMode.Append)
    val emitted = spark.table("sess_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList

    val batch = Relational.defs("q16_sessionize")(spark, dir)
      .select("user_id", "session_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val users = batch.map(_._1).distinct.size

    // the stream emits a session only when the gap that closes it arrives,
    // so each user's last session remains open in state
    assert(emitted.size === batch.size - users)
    val batchClosed = batch.groupBy(_._1).flatMap { case (_, ss) =>
      ss.sortBy(_._2).dropRight(1)
    }.toSet
    assert(emitted.toSet === batchClosed)
  }
}
