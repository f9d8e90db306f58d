package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming hourly counts equal the batch events_hourly result") {
    // file stream sources require a directory — stage the fixture file
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = EventStream.readEvents(spark, dir.toString)
    assert(stream.isStreaming)
    val query = EventStream.runToMemory(EventStream.hourlyCounts(stream), "hourly_smoke")
    try {
      val streamed = spark.table("hourly_smoke")
        .select("hour_start", "event_type", "n_events", "sum_value")
      val batch = q("events_hourly")
      assert(streamed.count() == batch.count())
      // exact equality of every (window, type) group
      val mismatches = streamed.alias("s")
        .join(batch.alias("b"), Seq("hour_start", "event_type"), "full_outer")
        .filter(col("s.n_events").isNull || col("b.n_events").isNull ||
          col("s.n_events") =!= col("b.n_events") ||
          col("s.sum_value") =!= col("b.sum_value"))
      assert(mismatches.count() == 0)
    } finally query.stop()
  }
}
