package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic

/** Event-stream operators over the `events` table: JSON property
  * extraction, tumbling event-time windows, gap-based sessionization, and
  * latest-per-key dedup (north-star spec; the reference has no event/JSON
  * surface at all).
  *
  * Batch forms here; `graft.streaming.EventStream` carries the Structured
  * Streaming forms of the same pipelines (same `window()` semantics — the
  * function is shared between batch and streaming in Spark).
  *
  * Scale notes:
  *  - JSON extraction (`get_json_object`) is a per-row codegen'd path — at
  *    100 TB prefer `from_json` with an explicit schema once per pipeline
  *    (schema below in [[propsSchema]]) so Catalyst prunes unused fields.
  *  - The tumbling window is `window(ts, "1 hour")` — group key is derived
  *    per-row, so the aggregation shuffles once on (window, type).
  *  - Sessionization shuffles once on `user_id` for the window functions;
  *    the session rollup reuses that partitioning (no second shuffle of raw
  *    rows thanks to partial aggregation).
  */
object Events {

  import org.apache.spark.sql.types._

  /** Schema of the `props` JSON column — for the `from_json` fast path. */
  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  /** Schema-first JSON parsing: `from_json` with [[propsSchema]] — the
    * 100 TB path (one declared schema per pipeline; Catalyst prunes
    * unread fields) versus the ad-hoc `get_json_object` below.
    */
  def fromJsonProps(spark: SparkSession, sfDir: String): DataFrame =
    // spread: the per-row from_json parse is the map cost — see
    // Tables.eventsSpread
    Tables.eventsSpread(spark, sfDir)
      .select(col("event_id"),
        from_json(col("props"), propsSchema).alias("p"))
      .select(col("event_id"), col("p.k").alias("k"))
      .orderBy("event_id")

  /** Per-type rollup with a JSON-extracted measure. Demonstrates both JSON
    * paths: `get_json_object` (ad-hoc) feeding the aggregate, with
    * `from_json` available via [[propsSchema]].
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    // spread: per-row get_json_object parse; sums are exact — see
    // Tables.eventsSpread
    Tables.eventsSpread(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").alias("k"),
        col("value"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).alias("n_events"),
        sum(col("k")).alias("sum_k"),
        Deterministic.exactSum(col("value"), 2).alias("sum_value"))
      .orderBy("event_type")

  /** Semi-structured extraction through Spark 4's VARIANT type:
    * `parse_json` decodes the props string ONCE into the binary variant
    * encoding, then typed `variant_get` paths read fields without
    * re-parsing — at 100 TB the parse cost is paid at ingestion and every
    * downstream field access is a cheap binary probe, vs
    * `get_json_object` re-parsing the string per call (the
    * [[jsonExtract]] twin keeps that spelling for comparison). Output is
    * plain typed columns, so the oracle is engine-neutral.
    */
  def variantExtract(spark: SparkSession, sfDir: String): DataFrame =
    // spread: per-row parse_json into variant; aggregates exact — see
    // Tables.eventsSpread
    Tables.eventsSpread(spark, sfDir)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).alias("n_with_k"),
        sum(col("k")).alias("sum_k"),
        min(col("k")).alias("min_k"),
        max(col("k")).alias("max_k"))
      .orderBy("event_type")

  /** Markov transition matrix over per-user event sequences: lag pairs
    * (prev_type → type) within each user's timeline, tie-broken by
    * event_id like every other sequence operator here, then one tiny
    * (type × type) count aggregation. The shuffle is per-user (the lag
    * window); the matrix itself is bounded by |event types|².
    */
  def transitionMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").alias("next_type"))
      .agg(count(lit(1)).alias("n_transitions"))
      .orderBy("prev_type", "next_type")
  }

  /** Daily active users + trailing-7-day active users. Rolling DISTINCT
    * counts are the one thing window frames cannot express (no
    * `countDistinct` over a moving frame), so the WAU side is a range
    * join: the distinct (day, user) pairs joined to a day spine on
    * `day ∈ [spine_day − 6, spine_day]`, then a distinct count per spine
    * day. At 100 TB the (day, user) table is already tiny relative to
    * the raw events (one row per user-day), and the range join fans each
    * row to ≤ 7 spine days — linear, never quadratic.
    */
  def dauWau(spark: SparkSession, sfDir: String): DataFrame = {
    val userDays = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).alias("day"), col("user_id")).distinct()
    val dau = userDays.groupBy(col("day"))
      .agg(count(lit(1)).alias("dau"))
    val spine = userDays.select(col("day").alias("spine_day")).distinct()
    val wau = spine.join(userDays,
        col("day") >= date_sub(col("spine_day"), 6) &&
          col("day") <= col("spine_day"))
      .groupBy(col("spine_day"))
      .agg(countDistinct(col("user_id")).alias("wau"))
    dau.join(wau, col("day") === col("spine_day"))
      .select(col("day"), col("dau"), col("wau"))
      .orderBy("day")
  }

  /** Tumbling 1-hour event-time window (epoch-aligned, UTC session TZ). */
  def hourlyWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).alias("n_events"),
        Deterministic.exactSum(col("value"), 2).alias("sum_value"))
      .select(col("window.start").alias("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("hour_start", "event_type")

  /** Sliding event-time window (1 hour long, sliding every 15 minutes):
    * each event lands in 4 overlapping windows. Spark derives all window
    * memberships per row map-side (`window(ts, len, slide)` explodes to
    * len/slide rows), so the aggregation still shuffles once on
    * (window, type) with partial aggregation — the 100 TB cost is the 4×
    * pre-aggregation row expansion, not 4 passes over the input.
    */
  def slidingWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(
        count(lit(1)).alias("n_events"),
        Deterministic.exactSum(col("value"), 2).alias("sum_value"))
      .select(col("window.start").alias("window_start"),
        col("window.end").alias("window_end"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Gap-based sessionization (30-minute inactivity gap): lag → boundary
    * flag → running sum = session id → per-session rollup. Batch analog of
    * `flatMapGroupsWithState` sessionization; microsecond arithmetic so
    * both engines compare exact integers.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        unix_micros(col("ts")).alias("ts_us"))
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > gapUs || lag(col("ts_us"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).alias("n_events"),
        min(col("ts")).alias("session_start"),
        max(col("ts")).alias("session_end"),
        Deterministic.exactSum(col("value"), 2).alias("session_value"))
      .orderBy("user_id", "session_id")
  }

  /** Gap-based sessions via the BUILT-IN `session_window` (Spark's
    * SessionWindowing/MergingSessionsExec path — merge-on-overlap
    * aggregation, usable identically in Structured Streaming), versus
    * [[sessionize]] which builds the same sessions manually with
    * lag + running-sum windows. Session end is exclusive:
    * last event + gap, per `session_window` semantics.
    */
  def sessionWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).alias("n_events"),
        Deterministic.exactSum(col("value"), 2).alias("session_value"))
      .select(col("user_id"),
        col("session_window.start").alias("session_start"),
        col("session_window.end").alias("session_end"),
        col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** Per-user ordered event-type path (first 20 events): list aggregation
    * with a PINNED order — `collect_list` alone is partition-order-
    * nondeterministic, so the elements carry their (ts, event_id) sort key
    * into the array and `sort_array` orders them post-aggregation (struct
    * ordering is field-by-field), making the result engine-reproducible.
    * One shuffle on user_id; the path string never exceeds 20 segments.
    */
  def userEventPaths(spark: SparkSession, sfDir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).alias("ts_us"),
        col("event_id"), col("event_type"))
      // rank FIRST so the collected list is bounded (≤20 structs per key)
      // — an unbounded per-key collect is the classic 100 TB state bomb;
      // collect_list skips the nulls the rank filter leaves behind
      .withColumn("rn", row_number().over(byTime))
      .groupBy(col("user_id"))
      .agg(
        collect_list(when(col("rn") <= 20,
          struct(col("ts_us"), col("event_id"), col("event_type")))).alias("evs"),
        count(lit(1)).cast("int").alias("n_events"))
      .select(col("user_id"),
        array_join(transform(sort_array(col("evs")), e => e.getField("event_type")),
          ">").alias("path"),
        col("n_events"))
      .orderBy("user_id")
  }

  /** Multi-step funnel: of the users who signed up, how many clicked at
    * or after their first signup, and of those how many purchased at or
    * after that first click — per-user min-timestamps per stage, compared
    * in sequence. One aggregation keyed on user (conditional mins), one
    * tiny rollup; no self-joins, no row explosion — the 100 TB funnel
    * shape.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).alias("ts_us"))
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts_us"))).alias("t_signup"))
    // stage gates: click counts only at-or-after the first signup; the
    // purchase only at-or-after that gated click — recompute the gated
    // times from the raw table to keep min-per-condition exact
    val gated = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).alias("ts_us"))
      .join(perUser.select(col("user_id"), col("t_signup")), Seq("user_id"))
      .filter(col("t_signup").isNotNull)
      .groupBy(col("user_id"), col("t_signup"))
      .agg(min(when(col("event_type") === "click" && col("ts_us") >= col("t_signup"),
        col("ts_us"))).alias("t_click"))
    val gated2 = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).alias("ts_us"))
      .join(gated, Seq("user_id"))
      .groupBy(col("user_id"), col("t_signup"), col("t_click"))
      .agg(min(when(col("event_type") === "purchase" && col("ts_us") >= col("t_click"),
        col("ts_us"))).alias("t_buy"))
    gated2.agg(
      count(lit(1)).alias("n_signup"),
      count(col("t_click")).alias("n_click_after_signup"),
      count(col("t_buy")).alias("n_purchase_after_click"))
  }

  /** Cohort retention: users grouped by first-activity day-bucket
    * (7-day cohorts from the corpus epoch), counted by how many distinct
    * users of each cohort are active in each subsequent bucket. The
    * composite shape — per-key min, re-join to raw activity, double
    * aggregation — is the standard engagement pipeline; bucketing uses
    * floored integer day-arithmetic, so the oracle is exact.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val epochDay = to_date(lit("2024-01-01"))
    // floor (not int-cast truncation): pre-epoch events have negative day
    // diffs, where truncation would disagree with the oracle's floor
    val withBucket = Tables.events(spark, sfDir)
      .select(col("user_id"),
        floor(datediff(to_date(col("ts")), epochDay) / 7).cast("int").alias("bucket"))
    // min-per-key via a window: one shuffle on user_id, no re-join branch
    val byUser = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    withBucket
      .withColumn("cohort", min(col("bucket")).over(byUser))
      .groupBy(col("cohort"), col("bucket"))
      .agg(countDistinct(col("user_id")).alias("active_users"))
      .withColumn("weeks_since_cohort", col("bucket") - col("cohort"))
      .select("cohort", "weeks_since_cohort", "active_users")
      .orderBy("cohort", "weeks_since_cohort")
  }

  /** Latest event per user — the canonical CDC/dedup-by-key pattern:
    * row_number over (key, recency) then rank=1.
    */
  def latestPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .orderBy("user_id")
  }

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: per-user event counts spread across one column per type.
    * Explicit pivot values avoid the extra distinct-collection pass the
    * value-less form needs (a full scan at 100 TB); absent combinations
    * coalesce to 0 so the shape is dense.
    */
  def pivotByType(spark: SparkSession, sfDir: String): DataFrame = {
    val pivoted = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .count()
    pivoted.select(
      col("user_id") +: EventTypes.map(t => coalesce(col(t), lit(0L)).alias(t)): _*)
      .orderBy("user_id")
  }

  /** Unpivot (melt): the wide per-user type-count matrix of
    * [[pivotByType]] back to long form — `Dataset.unpivot` plans as a
    * single `Expand` (each input row emits one row per value column,
    * map-side; no shuffle beyond the pivot's own). Zero counts are kept,
    * so pivot→unpivot is lossless and the long form is
    * (users × |EventTypes|) exactly.
    */
  def unpivotByType(spark: SparkSession, sfDir: String): DataFrame =
    pivotByType(spark, sfDir)
      .unpivot(Array(col("user_id")), EventTypes.map(col).toArray,
        "event_type", "n_events")
      .orderBy("user_id", "event_type")

  val oracles: Map[String, String] = Map(
    "events_unpivot_by_type" ->
      """WITH types AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type),
        |users AS (SELECT DISTINCT user_id FROM events),
        |counts AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT u.user_id AS user_id, t.event_type AS event_type,
        |       COALESCE(c.n, 0) AS n_events
        |FROM users u CROSS JOIN types t
        |LEFT JOIN counts c ON c.user_id = u.user_id AND c.event_type = t.event_type
        |ORDER BY u.user_id, t.event_type""".stripMargin,
    "events_from_json" ->
      """SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "events_cohort_retention" ->
      """WITH wb AS (
        |  SELECT user_id,
        |         CAST(floor(date_diff('day', DATE '2024-01-01',
        |              CAST(ts AS DATE)) / 7.0) AS INT) AS bucket
        |  FROM events),
        |cohorts AS (
        |  SELECT user_id, min(bucket) AS cohort FROM wb GROUP BY user_id)
        |SELECT cohort,
        |       CAST(bucket - cohort AS INT) AS weeks_since_cohort,
        |       CAST(count(DISTINCT wb.user_id) AS BIGINT) AS active_users
        |FROM wb JOIN cohorts ON wb.user_id = cohorts.user_id
        |GROUP BY cohort, bucket
        |ORDER BY cohort, weeks_since_cohort""".stripMargin,
    "events_pivot_by_type" -> {
      val counts = EventTypes.map(t =>
        s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS $t").mkString(",\n       ")
      s"""SELECT user_id,
         |       $counts
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },
    "events_json_extract" ->
      s"""SELECT event_type,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
         |       ${Deterministic.exactSumSql("value", 2)} AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_transition_matrix" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type,
        |       CAST(count(*) AS BIGINT) AS n_transitions
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY prev_type, next_type""".stripMargin,
    "events_dau_wau" ->
      """WITH user_days AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |dau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM user_days GROUP BY 1),
        |spine AS (SELECT DISTINCT day AS spine_day FROM user_days),
        |wau AS (
        |  SELECT spine_day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM spine JOIN user_days
        |    ON day >= spine_day - 6 AND day <= spine_day
        |  GROUP BY 1)
        |SELECT day, dau, wau
        |FROM dau JOIN wau ON day = spine_day
        |ORDER BY day""".stripMargin,
    "events_variant_extract" ->
      """SELECT event_type,
        |       CAST(count(props->>'k') AS BIGINT) AS n_with_k,
        |       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
        |       CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_hourly" ->
      s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       ${Deterministic.exactSumSql("value", 2)} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    // same gap-merge as the manual sessionize CTE; session_end is
    // last event + the 30-minute gap (session_window's exclusive end)
    "events_session_window" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         -- >= not >: session_window merges only on strict overlap
         |         -- (an event exactly gap after the last starts a new session)
         |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
         |              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sessions AS (
         |  SELECT user_id, ts, value,
         |         -- the running sum MUST use the same (ts, event_id) order as
         |         -- the lag window: with ts ties, an order-by-ts-only ROWS
         |         -- frame could place a tied flag-0 row before its session's
         |         -- flag-1 opener and misassign it to the previous session
         |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged)
         |SELECT user_id,
         |       min(ts) AS session_start,
         |       max(ts) + INTERVAL 30 MINUTES AS session_end,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       ${Deterministic.exactSumSql("value", 2)} AS session_value
         |FROM sessions GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,
    "user_event_paths" ->
      """SELECT user_id,
        |       array_to_string(list_slice(
        |         list(event_type ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id),
        |         1, 20), '>') AS path,
        |       CAST(count(*) AS INT) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_funnel" ->
      """WITH per_user AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'signup'
        |             THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_signup
        |  FROM events GROUP BY 1),
        |gated AS (
        |  SELECT e.user_id, p.t_signup,
        |         min(CASE WHEN e.event_type = 'click'
        |                  AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= p.t_signup
        |             THEN epoch_us(CAST(e.ts AS TIMESTAMP)) END) AS t_click
        |  FROM events e JOIN per_user p ON e.user_id = p.user_id
        |  WHERE p.t_signup IS NOT NULL
        |  GROUP BY 1, 2),
        |gated2 AS (
        |  SELECT e.user_id, g.t_signup, g.t_click,
        |         min(CASE WHEN e.event_type = 'purchase'
        |                  AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= g.t_click
        |             THEN epoch_us(CAST(e.ts AS TIMESTAMP)) END) AS t_buy
        |  FROM events e JOIN gated g ON e.user_id = g.user_id
        |  GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_signup,
        |       CAST(count(t_click) AS BIGINT) AS n_click_after_signup,
        |       CAST(count(t_buy) AS BIGINT) AS n_purchase_after_click
        |FROM gated2""".stripMargin,
    // Window starts replicate Spark's epoch-aligned assignment: for slide
    // s and length L, the k-th window of an event is
    // floor_s(ts) - k·s for k = 0..L/s-1 — all µs-integer arithmetic.
    "events_sliding_window" ->
      s"""WITH e AS (
         |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_type, value
         |  FROM events),
         |expanded AS (
         |  SELECT ts_us - ts_us % 900000000 - k * 900000000 AS ws_us,
         |         event_type, value
         |  FROM e CROSS JOIN generate_series(0, 3) t(k))
         |SELECT make_timestamp(ws_us) AS window_start,
         |       make_timestamp(ws_us + 3600000000) AS window_end,
         |       event_type,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       ${Deterministic.exactSumSql("value", 2)} AS sum_value
         |FROM expanded GROUP BY 1, 2, 3
         |ORDER BY window_start, event_type""".stripMargin,
    "events_sessionize" ->
      s"""WITH flagged AS (
         |  SELECT user_id, event_id, ts, value,
         |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         |              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sessions AS (
         |  SELECT user_id, event_id, ts, value,
         |         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       min(ts) AS session_start,
         |       max(ts) AS session_end,
         |       ${Deterministic.exactSumSql("value", 2)} AS session_value
         |FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    "events_latest_per_user" ->
      """SELECT user_id, event_id, ts, event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_from_json"       -> fromJsonProps _,
    "events_cohort_retention" -> cohortRetention _,
    "events_pivot_by_type"   -> pivotByType _,
    "events_json_extract"    -> jsonExtract _,
    "events_variant_extract" -> variantExtract _,
    "events_transition_matrix" -> transitionMatrix _,
    "events_dau_wau"         -> dauWau _,
    "events_hourly"          -> hourlyWindow _,
    "events_sliding_window"  -> slidingWindow _,
    "user_event_paths"       -> userEventPaths _,
    "events_funnel"          -> funnel _,
    "events_unpivot_by_type" -> unpivotByType _,
    "events_sessionize"      -> sessionize _,
    "events_session_window"  -> sessionWindow _,
    "events_latest_per_user" -> latestPerUser _,
  )
}
