package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("asOf picks the latest right row at-or-before each left time, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), (2L, 100L, 25L), (3L, 100L, 5L), (4L, 200L, 50L))
      .toDF("lid", "k", "lt")
    val right = Seq(
      (7L, 100L, 10L), (8L, 100L, 20L), (9L, 300L, 1L))
      .toDF("rid", "rk", "rt")
    val out = AsOfJoin.asOf(left, right,
        leftKey = "k", rightKey = "rk",
        leftTimeUs = col("lt"), rightTimeUs = col("rt"),
        carries = Seq("rid"), rightTiebreak = "rid")
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // lid 1 at t=10 → rid 7 (inclusive match); lid 2 at t=25 → rid 8;
    // lid 3 at t=5 → no earlier right row → dropped (inner semantics);
    // lid 4 key 200 → no right rows → dropped.
    assert(out == Map(1L -> 7L, 2L -> 8L))
  }

  test("asOf left semantics keep unmatched rows with all-null carries") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), (2L, 100L, 25L), (3L, 100L, 5L), (4L, 200L, 50L))
      .toDF("lid", "k", "lt")
    val right = Seq(
      (7L, 100L, 10L), (8L, 100L, 20L), (9L, 300L, 1L))
      .toDF("rid", "rk", "rt")
    val out = AsOfJoin.asOf(left, right,
        leftKey = "k", rightKey = "rk",
        leftTimeUs = col("lt"), rightTimeUs = col("rt"),
        carries = Seq("rid"), rightTiebreak = "rid",
        joinType = "left")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // matched rows identical to inner; lid 3 (no earlier right row) and
    // lid 4 (key absent from right) survive with null carries
    assert(out == Map(1L -> Some(7L), 2L -> Some(8L), 3L -> None, 4L -> None))
  }

  test("events_asof_order: attached order is at-or-before the event and rows are unique") {
    val df = q("events_asof_order")
    assert(df.count() > 0)
    assert(df.select("event_id").distinct().count() == df.count())
    val violations = df.join(
        Tables.events(spark, sf).select(col("event_id"), col("ts")), "event_id")
      .filter(unix_micros(col("asof_order_ts")) > unix_micros(col("ts"))).count()
    assert(violations == 0)
  }

  test("stale-bound as-of: fresh rows sit inside the 30-day window, stale" +
      " rows null both carries together, both classes occur") {
    val tolUs = 30L * 24 * 3600 * 1000000L
    val bound = q("events_last_purchase_stale_bound")
      .join(Tables.events(spark, sf).select(col("event_id"),
        unix_micros(col("ts")).alias("ts_us")), "event_id")
    // all-or-nothing: id null ⟺ ts null ⟺ !fresh
    assert(bound.filter(col("fresh") =!=
      (col("last_purchase_id").isNotNull && col("last_purchase_ts").isNotNull))
      .count() == 0)
    // fresh matches are at-or-before ts AND within tolerance
    assert(bound.filter(col("fresh") &&
      (unix_micros(col("last_purchase_ts")) > col("ts_us") ||
        unix_micros(col("last_purchase_ts")) < col("ts_us") - tolUs))
      .count() == 0)
    // a stale/absent row has NO purchase by that user inside the window
    // (the nulled match may not hide a qualifying one)
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").alias("p_user"),
        unix_micros(col("ts")).alias("p_ts"))
    val hidden = bound.filter(!col("fresh"))
      .join(purchases, col("user_id") === col("p_user") &&
        col("p_ts") <= col("ts_us") && col("p_ts") >= col("ts_us") - lit(tolUs))
      .count()
    assert(hidden == 0)
    assert(bound.filter(col("fresh")).count() > 0)
    assert(bound.filter(!col("fresh")).count() > 0)
  }
}
