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
    * (they must exist in `right`). Inner semantics (default): left rows
    * with no matching earlier right row are dropped (matching DuckDB's
    * ASOF JOIN); `joinType = "left"` keeps them with null carries
    * (DuckDB's ASOF LEFT JOIN — the production-safe default when a
    * missing match is data, not an error; round 10's fixture shift
    * turned exactly this distinction into an empty inner result).
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
      carries: Seq[String], rightTiebreak: String,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asOf supports inner|left, got '$joinType'")

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

    // left semantics: unmatched left rows survive with null carries (the
    // struct is null, so every projected carry field is null together —
    // never a half-stitched row)
    val kept =
      if (joinType == "left") carried.filter(col("__side") === 1)
      else carried.filter(col("__side") === 1 && col("__carry").isNotNull)
    kept.select((leftCols.map(col) ++
      carries.map(c => col(s"__carry.$c").alias(c))): _*)
  }

  /** Forward as-of join: for each left row, attach the EARLIEST right row
    * with the same key and `rightTime >= leftTime`. Implemented as the
    * backward join on the negated time axis — same single-shuffle,
    * no-candidate-blowup cost profile. Equal timestamps match (>= not >),
    * mirroring DuckDB's `ASOF JOIN ... ON rt >= lt`.
    */
  def asOfForward(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTimeUs: Column, rightTimeUs: Column,
      carries: Seq[String], rightTiebreak: String): DataFrame =
    asOf(left, right, leftKey, rightKey,
      leftTimeUs = -leftTimeUs, rightTimeUs = -rightTimeUs,
      carries, rightTiebreak)

  /** Query: for each event, the user's most recent order at or before the
    * event timestamp (the canonical "state as of" point-in-time lookup —
    * e.g. attributing behavior to the order that preceded it). The right
    * side is pre-reduced to one row per (customer, order timestamp) —
    * multiple same-day orders share a midnight timestamp, and an as-of
    * match among equal timestamps is engine-arbitrary; the max-key
    * reduction pins it. Oracle: DuckDB's native ASOF JOIN over the same
    * reduction.
    */
  def eventsAsofOrder(spark: SparkSession, sfDir: String): DataFrame =
    eventsAsofOrderWith(spark, sfDir, "inner")

  /** Left twin of [[eventsAsofOrder]]: users whose first order postdates
    * an event (or who never ordered) keep the event row with null order
    * columns — the monitoring-safe spelling where "no state yet" is an
    * answer rather than a dropped row.
    */
  def eventsAsofOrderLeft(spark: SparkSession, sfDir: String): DataFrame =
    eventsAsofOrderWith(spark, sfDir, "left")

  private def eventsAsofOrderWith(
      spark: SparkSession, sfDir: String, joinType: String): DataFrame = {
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
      rightTiebreak = "asof_order_key",
      joinType = joinType)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("asof_order_key"),
        timestamp_micros(col("asof_order_ts_us")).alias("asof_order_ts"))
      .orderBy("event_id")
  }

  /** Query: forward as-of funnel — for each non-purchase event, the same
    * user's next purchase at or after it ("did this behavior convert").
    * The purchase side is pre-reduced to one row per (user, ts) — an
    * as-of match among equal timestamps is engine-arbitrary otherwise;
    * the max-id reduction pins it. Inner semantics: events after the
    * user's last purchase drop. Oracle: DuckDB's native forward ASOF.
    */
  def eventsNextPurchase(spark: SparkSession, sfDir: String): DataFrame = {
    val all = Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).alias("ts_us"))
    val nonPurchase = all.filter(col("event_type") =!= "purchase")
    val purchases = all.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").alias("p_user"),
        col("ts_us").alias("next_purchase_ts_us"))
      .agg(max(col("event_id")).alias("next_purchase_id"))

    asOfForward(
      left = nonPurchase, right = purchases,
      leftKey = "user_id", rightKey = "p_user",
      leftTimeUs = col("ts_us"),
      rightTimeUs = col("next_purchase_ts_us"),
      carries = Seq("next_purchase_id", "next_purchase_ts_us"),
      rightTiebreak = "next_purchase_id")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("next_purchase_id"),
        timestamp_micros(col("next_purchase_ts_us")).alias("next_purchase_ts"))
      .orderBy("event_id")
  }

  /** Interval (temporal range) join: per purchase event, the same user's
    * non-purchase activity in the preceding 30 minutes (the attribution
    * window). The join is an equi-join on the user key with the time band
    * as a residual predicate — it shuffles once on the key and never
    * materializes pairs beyond each user's own (purchases × events);
    * inner semantics (purchases with no in-window activity are absent).
    */
  def purchaseAttribution30m(spark: SparkSession, sfDir: String): DataFrame = {
    val WindowUs = 30L * 60L * 1000000L
    val all = Tables.events(spark, sfDir).select(
      col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).alias("ts_us"), col("value"))
    val p = all.filter(col("event_type") === "purchase").select(
      col("event_id").alias("purchase_id"), col("user_id").alias("p_user"),
      col("ts_us").alias("p_us"))
    val e = all.filter(col("event_type") =!= "purchase")
    p.join(e, p("p_user") === e("user_id") &&
        e("ts_us") < p("p_us") && e("ts_us") >= p("p_us") - WindowUs)
      .groupBy(col("purchase_id"), col("p_user").alias("user_id"))
      .agg(count(lit(1)).alias("n_prior_events"),
        graft.functions.Deterministic.exactSum(col("value"), 2)
          .alias("sum_prior_value"))
      .orderBy("purchase_id")
  }

  /** TOLERANCE-BOUNDED as-of join (the feature-store staleness rule): for
    * every non-purchase interaction, the user's latest purchase counts
    * only if it is no older than 30 days — a serving stack refuses
    * features staler than its freshness SLA, so "stale" and "absent"
    * must coincide in the output. Implemented as the LEFT as-of join
    * carrying (purchase id, ts) as one struct, then a map-side
    * post-filter nulls BOTH carries together when the match is outside
    * tolerance — the single-shuffle union-carry shape is untouched
    * (tolerance is a projection, not a join-condition change), and the
    * all-or-nothing struct rule from [[asOf]] still holds. DuckDB has no
    * ASOF tolerance either; its oracle applies the same CASE over the
    * plain ASOF LEFT JOIN, so the semantics are pinned cross-engine.
    */
  def eventsLastPurchaseStaleBound(spark: SparkSession, sfDir: String): DataFrame = {
    val tolUs = 30L * 24 * 3600 * 1000000L
    val events = Tables.events(spark, sfDir)
      .filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).alias("ts_us"))
    val purchasesPerTs = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id").alias("p_user"),
        unix_micros(col("ts")).alias("purchase_ts_us"))
      .agg(max(col("event_id")).alias("last_purchase_id"))
    val fresh = col("purchase_ts_us").isNotNull &&
      col("purchase_ts_us") >= col("ts_us") - lit(tolUs)
    asOf(
      left = events, right = purchasesPerTs,
      leftKey = "user_id", rightKey = "p_user",
      leftTimeUs = col("ts_us"),
      rightTimeUs = col("purchase_ts_us"),
      carries = Seq("last_purchase_id", "purchase_ts_us"),
      rightTiebreak = "last_purchase_id",
      joinType = "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        when(fresh, col("last_purchase_id")).alias("last_purchase_id"),
        when(fresh, timestamp_micros(col("purchase_ts_us")))
          .alias("last_purchase_ts"),
        fresh.alias("fresh"))
      .orderBy("event_id")
  }

  val oracles: Map[String, String] = Map(
    "events_last_purchase_stale_bound" ->
      """WITH p AS (
        |  SELECT user_id AS p_user, ts AS pts, max(event_id) AS last_purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |j AS (
        |  SELECT e.event_id, e.user_id, e.event_type, e.ts,
        |         p.last_purchase_id, p.pts
        |  FROM events e ASOF LEFT JOIN p
        |    ON e.user_id = p.p_user AND p.pts <= e.ts
        |  WHERE e.event_type != 'purchase')
        |SELECT event_id, user_id, event_type,
        |       CASE WHEN fresh THEN last_purchase_id END AS last_purchase_id,
        |       CASE WHEN fresh THEN pts END AS last_purchase_ts,
        |       fresh
        |FROM (SELECT *,
        |        pts IS NOT NULL AND epoch_us(CAST(pts AS TIMESTAMP))
        |          >= epoch_us(CAST(ts AS TIMESTAMP)) - 2592000000000 AS fresh
        |      FROM j)
        |ORDER BY event_id""".stripMargin,
    "events_next_purchase" ->
      """WITH p AS (
        |  SELECT user_id AS p_user, ts AS pts, max(event_id) AS next_purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.event_type,
        |       p.next_purchase_id, p.pts AS next_purchase_ts
        |FROM events e ASOF JOIN p
        |  ON e.user_id = p.p_user AND p.pts >= e.ts
        |WHERE e.event_type != 'purchase'
        |ORDER BY event_id""".stripMargin,
    "purchase_attribution_30m" ->
      s"""SELECT p.event_id AS purchase_id, p.user_id AS user_id,
         |       CAST(count(*) AS BIGINT) AS n_prior_events,
         |       ${graft.functions.Deterministic.exactSumSql("e.value", 2)} AS sum_prior_value
         |FROM events p JOIN events e
         |  ON p.user_id = e.user_id
         | AND epoch_us(CAST(e.ts AS TIMESTAMP)) < epoch_us(CAST(p.ts AS TIMESTAMP))
         | AND epoch_us(CAST(e.ts AS TIMESTAMP))
         |     >= epoch_us(CAST(p.ts AS TIMESTAMP)) - 1800000000
         |WHERE p.event_type = 'purchase' AND e.event_type != 'purchase'
         |GROUP BY 1, 2
         |ORDER BY purchase_id""".stripMargin,
    "events_asof_order" ->
      """WITH op AS (
        |  SELECT o_custkey, o_orderdate AS ots, max(o_orderkey) AS asof_order_key
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.event_type,
        |       op.asof_order_key, op.ots AS asof_order_ts
        |FROM events e ASOF JOIN op
        |  ON e.user_id = op.o_custkey AND op.ots <= e.ts
        |ORDER BY event_id""".stripMargin,
    "events_asof_order_left" ->
      """WITH op AS (
        |  SELECT o_custkey, o_orderdate AS ots, max(o_orderkey) AS asof_order_key
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.event_type,
        |       op.asof_order_key, op.ots AS asof_order_ts
        |FROM events e ASOF LEFT JOIN op
        |  ON e.user_id = op.o_custkey AND op.ots <= e.ts
        |ORDER BY event_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_order"        -> eventsAsofOrder _,
    "events_asof_order_left"   -> eventsAsofOrderLeft _,
    "events_last_purchase_stale_bound" -> eventsLastPurchaseStaleBound _,
    "events_next_purchase"     -> eventsNextPurchase _,
    "purchase_attribution_30m" -> purchaseAttribution30m _,
  )
}
