package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from built-ins per the preference order (SURVEY.md §4): for
  * each left row, attach the LATEST right row with the same key and
  * `rightTime <= leftTime`.
  *
  * Implementation: the union-and-carry technique rather than a
  * join-then-max — both sides are tagged and unioned, then ONE window
  * pass per key (ordered by time, right-before-left on ties) carries the
  * most recent right-side values forward with `last(_, ignoreNulls)` over
  * an unbounded-preceding frame.
  *
  * 100 TB posture: exactly one shuffle of (|L|+|R|) rows on the join key
  * and one within-partition sort — the same cost profile as a sort-merge
  * join, with no candidate blowup. The naive alternative (inequality join
  * → per-left-row max) materializes every (left, earlier-right) pair —
  * quadratic per key — and is what this formulation avoids.
  */
object AsOfJoin {

  /** Internal tag columns; inputs must not use these names. */
  private val ReservedNames = Seq("__k", "__t", "__side", "__carry", "__tie")

  /** Generic as-of join. `carries` are the right-side columns to attach
    * (they must exist in `right`). Inner semantics: left rows with no
    * matching earlier right row are dropped (matching DuckDB's ASOF JOIN).
    * `rightTiebreak` orders simultaneous right rows (the last one wins) —
    * it must be UNIQUE within each (key, time) group of `right`, or the
    * carried row among exact time ties is engine-arbitrary; pre-reduce
    * the right side (as [[eventsAsofOrder]] does with max-per-(key, ts))
    * when the natural tiebreak isn't unique.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTimeUs: Column, rightTimeUs: Column,
      carries: Seq[String], rightTiebreak: String): DataFrame = {

    val carryClash = carries.filter(left.columns.contains)
    require(carryClash.isEmpty,
      s"carry columns ${carryClash.mkString(", ")} collide with left columns; " +
        "rename them on the right side before the as-of join")
    val reservedClash =
      (left.columns ++ right.columns).filter(ReservedNames.contains).distinct
    require(reservedClash.isEmpty,
      s"input columns ${reservedClash.mkString(", ")} collide with internal " +
        s"as-of tags (${ReservedNames.mkString(", ")}); rename them first")

    // The carried right-side values travel as ONE struct so a match is
    // all-or-nothing: carrying each column independently with
    // last(ignoreNulls) would stitch values from DIFFERENT right rows
    // whenever a carry column is null (and a null carry value would be
    // indistinguishable from "no match at all").
    val leftCols = left.columns.toSeq
    val carryStruct = struct(carries.map(col): _*)
    val carryType = {
      import org.apache.spark.sql.types.StructType
      StructType(carries.map(c => right.schema(c)))
    }
    val tagged = left.select(
      (Seq(col(leftKey).alias("__k"), leftTimeUs.alias("__t"), lit(1).alias("__side"),
        lit(null).cast(carryType).alias("__carry"),
        lit(null).cast(right.schema(rightTiebreak).dataType).alias("__tie")) ++
        leftCols.map(col)): _*)
    val taggedRight = right.select(
      (Seq(col(rightKey).alias("__k"), rightTimeUs.alias("__t"), lit(0).alias("__side"),
        carryStruct.alias("__carry"),
        col(rightTiebreak).alias("__tie")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).alias(c))): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = tagged.unionByName(taggedRight)
      .select((Seq(col("__side"),
        last(col("__carry"), ignoreNulls = true).over(w).alias("__carry")) ++
        leftCols.map(col)): _*)

    carried.filter(col("__side") === 1 && col("__carry").isNotNull)
      .select((leftCols.map(col) ++
        carries.map(c => col(s"__carry.$c").alias(c))): _*)
  }

  /** Query: for each event, the user's most recent order at or before the
    * event timestamp (the canonical "state as of" point-in-time lookup —
    * e.g. attributing behavior to the order that preceded it). The right
    * side is pre-reduced to one row per (customer, order timestamp) —
    * multiple same-day orders share a midnight timestamp, and an as-of
    * match among equal timestamps is engine-arbitrary; the max-key
    * reduction pins it. Oracle: DuckDB's native ASOF JOIN over the same
    * reduction.
    */
  def eventsAsofOrder(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).alias("ts_us"))
    val ordersPerTs = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).alias("asof_order_ts_us"))
      .agg(max(col("o_orderkey")).alias("asof_order_key"))

    asOf(
      left = events, right = ordersPerTs,
      leftKey = "user_id", rightKey = "o_custkey",
      leftTimeUs = col("ts_us"),
      rightTimeUs = col("asof_order_ts_us"),
      carries = Seq("asof_order_key", "asof_order_ts_us"),
      rightTiebreak = "asof_order_key")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("asof_order_key"),
        timestamp_micros(col("asof_order_ts_us")).alias("asof_order_ts"))
      .orderBy("event_id")
  }

  val oracles: Map[String, String] = Map(
    "events_asof_order" ->
      """WITH op AS (
        |  SELECT o_custkey, o_orderdate AS ots, max(o_orderkey) AS asof_order_key
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.event_type,
        |       op.asof_order_key, op.ots AS asof_order_ts
        |FROM events e ASOF JOIN op
        |  ON e.user_id = op.o_custkey AND op.ots <= e.ts
        |ORDER BY event_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_order" -> eventsAsofOrder _,
  )
}
