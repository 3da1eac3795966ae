package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming smoke tests: the structured-streaming twins run to completion
  * over the sf0.001 events files (availableNow trigger) and agree with
  * their batch formulations on closed windows.
  *
  * Append-mode caveat: windows newer than the final watermark stay in
  * state and are not emitted, so the streaming result is a PREFIX of the
  * batch result — the assertions check non-emptiness and containment,
  * which is the correct batch/stream parity contract.
  */
class EventStreamsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("tumbling-window stream matches batch on emitted windows") {
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.tumblingCounts(EventStreams.readEvents(spark, dir)),
      "t_tumbling")
    val batch = graft.SparkEntry.queries("q18_tumbling_window")(spark, dir)
    val s = streamed.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = batch.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(s.nonEmpty)
    assert(s.subsetOf(b))
  }

  test("session-window stream emits per-user sessions consistent with batch") {
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.sessionCounts(EventStreams.readEvents(spark, dir)),
      "t_session")
    val batch = graft.SparkEntry.queries("q20_session_window")(spark, dir)
    val s = streamed.select("user_id", "session_start_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = batch.select("user_id", "session_start_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s.nonEmpty)
    assert(s.subsetOf(b))
  }

  test("mapGroupsWithState running totals match batch per-user counts") {
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.userTotalsWithState(EventStreams.readEvents(spark, dir)).toDF(),
      "t_state", outputMode = "update")
    val s = streamed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = spark.read.parquet(s"$dir/events.parquet")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s.nonEmpty)
    assert(s == b) // one availableNow batch -> final state equals batch counts
  }

  test("watermarked dedup stream keeps one row per key within watermark") {
    val streamed = EventStreams.runToMemory(spark,
      EventStreams.dedupedEvents(EventStreams.readEvents(spark, dir)),
      "t_dedup")
    val n = streamed.count()
    val keys = streamed.select(countDistinct(col("user_id"), col("event_type")))
      .collect().head.getLong(0)
    assert(n > 0)
    assert(n >= keys) // at least one row per surviving key
    val batchKeys = graft.SparkEntry.queries("q21_keyed_dedup")(spark, dir).count()
    assert(keys == batchKeys) // same key universe as the batch dedup
  }
}
