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

  /** Generic as-of join. `carries` are the right-side columns to attach
    * (they must exist in `right`). Inner semantics: left rows with no
    * matching earlier right row are dropped (matching DuckDB's ASOF JOIN).
    * `rightTiebreak` orders simultaneous right rows (the last one wins).
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTimeUs: Column, rightTimeUs: Column,
      carries: Seq[String], rightTiebreak: String): DataFrame = {

    val leftCols = left.columns.toSeq
    val tagged = left.select(
      (Seq(col(leftKey).alias("__k"), leftTimeUs.alias("__t"), lit(1).alias("__side")) ++
        leftCols.map(col) ++
        carries.map(c => lit(null).cast(right.schema(c).dataType).alias(c)) ++
        Seq(lit(null).cast(right.schema(rightTiebreak).dataType).alias("__tie"))): _*)
    val taggedRight = right.select(
      (Seq(col(rightKey).alias("__k"), rightTimeUs.alias("__t"), lit(0).alias("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).alias(c)) ++
        carries.map(col) ++
        Seq(col(rightTiebreak).alias("__tie"))): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = tagged.unionByName(taggedRight)
      .select((Seq(col("__side")) ++ leftCols.map(col) ++
        carries.map(c => last(col(c), ignoreNulls = true).over(w).alias(c))): _*)

    carried.filter(col("__side") === 1)
      .filter(carries.map(c => col(c).isNotNull).reduce(_ && _))
      .drop("__side")
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
