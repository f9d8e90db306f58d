package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver fixture's `events.ts` physical encoding has changed across
  * generations — INT64 TIMESTAMP(NANOS) early, TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) later. A loader hard-coded to either one
  * mis-scales the other by 1000× (micros pushed through the nanos
  * `div 1000` lands every 2024 event in January 1970, which zeroed the
  * as-of join and collapsed every session/day rollup in round 10).
  * These specs pin the footer-sniffing loader on both generations.
  */
class EventsTsEncodingSpec extends SparkSpec {

  private val wallClock = "2024-03-01 12:34:56.789012"
  private val wallMicros = java.time.LocalDateTime
    .parse(wallClock.replace(' ', 'T'))
    .toInstant(java.time.ZoneOffset.UTC)
  private def microsSinceEpoch: Long =
    wallMicros.getEpochSecond * 1000000L + wallMicros.getNano / 1000L

  private def writeFixture(tsCol: org.apache.spark.sql.Column): String = {
    val dir = Files.createTempDirectory("graft-ts-enc").toString
    val p = s"$dir/events.parquet"
    spark.range(1).select(
      lit(7L).alias("event_id"), tsCol.alias("ts"), lit(3L).alias("user_id"),
      lit("click").alias("event_type"), lit(1.5).alias("value"),
      lit("{}").alias("props"))
      .coalesce(1).write.mode("overwrite").parquet(p)
    p
  }

  private def readBack(p: String): Row =
    Tables.eventsFrom(spark, p)
      .select(col("event_id"), unix_micros(col("ts")).alias("us"),
        col("user_id"), col("value"))
      .head()

  test("micros-generation events.ts (TIMESTAMP_NTZ footer) reads at wall-clock scale") {
    val p = writeFixture(
      lit(wallClock).cast(TimestampNTZType))
    val row = readBack(p)
    assert(row.getAs[Long]("us") == microsSinceEpoch)
    assert(Tables.eventsFrom(spark, p).schema("ts").dataType == TimestampType)
  }

  test("micros-generation events.ts (plain TIMESTAMP footer) reads at wall-clock scale") {
    val p = writeFixture(lit(wallClock).cast(TimestampType))
    assert(readBack(p).getAs[Long]("us") == microsSinceEpoch)
  }

  test("an empty-dir sniff is not pinned: the schema retries once data lands") {
    // the stale-fallback trap: a streaming input dir sniffed while empty
    // (or during a transient IO failure) used to cache the nanos long
    // fallback for the JVM lifetime, so a micros generation arriving
    // later was read through the div-1000 arm — 2024 events in 1970.
    // Only SUCCESSFUL inference is cached now; the fallback answer is
    // per-call.
    val dir = Files.createTempDirectory("graft-ts-empty").toString
    val p = s"$dir/events.parquet"
    Files.createDirectories(java.nio.file.Paths.get(p))
    assert(Tables.eventsSchemaFor(spark, p)("ts").dataType == LongType,
      "empty dir must fall back to the long-typed nanos schema")
    // the micros generation lands at the SAME path
    spark.range(1).select(
      lit(7L).alias("event_id"),
      lit(wallClock).cast(TimestampNTZType).alias("ts"),
      lit(3L).alias("user_id"), lit("click").alias("event_type"),
      lit(1.5).alias("value"), lit("{}").alias("props"))
      .coalesce(1).write.mode("overwrite").parquet(p)
    assert(Tables.eventsSchemaFor(spark, p)("ts").dataType == TimestampType,
      "populated dir must re-sniff to the timestamp schema, not serve the stale fallback")
    assert(readBack(p).getAs[Long]("us") == microsSinceEpoch)
  }

  test("nanos-generation events.ts (long footer) floors nanos to micros") {
    // Spark cannot write TIMESTAMP(NANOS) parquet; a plain INT64 column
    // exercises the same loader arm (footer that does not infer as a
    // timestamp → long fallback + nanos div), including the floor on a
    // non-multiple-of-1000 nanos value.
    val p = writeFixture(lit(microsSinceEpoch * 1000L + 999L))
    assert(readBack(p).getAs[Long]("us") == microsSinceEpoch)
  }

  test("driver fixture reads at 2024 wall-clock scale end-to-end") {
    val bounds = Tables.events(spark, sf)
      .agg(min(year(col("ts"))).alias("lo"), max(year(col("ts"))).alias("hi"))
      .head()
    assert(bounds.getAs[Int]("lo") >= 2020,
      s"events.ts decoded to year ${bounds.getAs[Int]("lo")} — ts unit mis-scaled")
    assert(bounds.getAs[Int]("hi") <= 2100)
  }

  test("streaming reader agrees with the batch reader on the driver fixture") {
    val dir = Files.createTempDirectory("graft-ts-enc-stream")
    Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = graft.streaming.EventStream.readEvents(spark, dir.toString)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType)
    val q = graft.streaming.EventStream.runToMemory(
      stream.select(col("event_id"), col("ts")), "ts_enc_smoke", "append")
    try {
      val streamed = spark.table("ts_enc_smoke")
      val batch = Tables.events(spark, sf).select(col("event_id"), col("ts"))
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally q.stop()
  }
}
