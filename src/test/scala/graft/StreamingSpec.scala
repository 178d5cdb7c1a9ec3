package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._

/** Streaming twins must agree with their batch counterparts on the same
  * data (one micro-batch drains the whole parquet file).
  */
class StreamingSpec extends SparkSuite {

  test("streaming windowed counts equal the batch window aggregation") {
    val sq = EventsStream.windowedCounts(spark, sf)
      .writeStream.format("memory").queryName("wc_stream")
      .outputMode("complete").start()
    try sq.processAllAvailable() finally sq.stop()
    val streamed = spark.table("wc_stream")
      .select(date_format(col("win_start"), "yyyy-MM-dd HH:mm:ss")
        .as("win_start"), col("event_type"), col("n"))
    val batch = q("events_window_agg")
      .select(col("win_start"), col("event_type"), col("n"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stateful sessionization equals the batch lag-window version") {
    val sq = EventsStream.sessionCounts(spark, sf)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("update").start()
    try sq.processAllAvailable() finally sq.stop()
    val streamed = spark.table("sess_stream")
    val batch = q("events_sessionize")
      .select(col("user_id"), col("n_sessions"), col("n_events"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
