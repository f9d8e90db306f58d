package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ZOrder

/** Data-LAYOUT queries: the write-side lever the scan-side machinery
  * assumes. `ZOrder.cluster` itself lives in functions/ZOrder.scala and
  * is differential-tested plus payoff-measured in ScalePostureSpec; this
  * module drives the full layout path — cluster → parquet write → scan
  * with a two-dimensional predicate — through the registered-query
  * correctness gate, so the DuckDB oracle proves the re-layout LOSSLESS
  * (identical rows through the round trip) while the plan's pushed
  * filters hit the laid-out files' tight per-file bounding boxes
  * (north-star tier; no reference analog).
  */
object Layout {

  /** Files in the demo layout — small because the smallest fixture has
    * 1500 orders; production sizes this to ~1 GB per file.
    */
  private val ZFiles = 8

  private val CustLo = 40L
  private val CustHi = 90L
  private val DateLo = "1997-01-01"
  private val DateHi = "1997-07-01"
  private def epochDay(d: String): Long = java.time.LocalDate.parse(d).toEpochDay
  private[graft] val DayLo = epochDay(DateLo)
  private[graft] val DayHi = epochDay(DateHi)

  /** Canonical tmp path for a per-sfDir durable side-effect dir — ONE
    * spelling of the tmpdir + sanitized-sfDir idiom (shared by the
    * z-order/bucketed layouts here, the SCD2 layouts/erasure state in
    * [[WindowAnalytics]], and the JSONL round trip in
    * [[graft.sources.TextSources]]).
    */
  private[graft] def tmpPath(prefix: String, sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/$prefix-${ident(sfDir)}"

  private[graft] def layoutDir(sfDir: String): String =
    tmpPath("graft-zlayout", sfDir)

  /** Z-ORDERED SCAN: write `orders` re-clustered on
    * morton(custkey, epoch-day) — both dimensions a lakehouse slices
    * orders by — then scan it back under a conjunctive two-dimensional
    * band. The oracle runs the same band over the ORIGINAL table, so a
    * row lost, duplicated, or mutated by the layout machinery (code
    * computation, sharded ranks, identity routing, file writes) fails
    * the hash gate; the pruning PAYOFF (files skipped on the second
    * dimension) is asserted plan-level in ScalePostureSpec.
    *
    * Memoized DURABLY ([[graft.CacheLifecycle.memoizedDurable]]): the
    * cluster+write side effect runs once per JVM session and the entry
    * survives `unpersistAll`, so bench loops — which reset caches
    * between timed loops — pay only the pruned scan, the actual
    * production read path this query exists to exercise. (A plain
    * [[graft.CacheLifecycle.memoized]] entry would be cleared with the
    * caches and replay the full cluster + parquet write inside every
    * timed loop, folding disk-write I/O noise into a read measurement.)
    * The returned frame's lineage is only the parquet scan of the
    * written dir, so re-executing it after a cache reset is safe.
    */
  /** The layout carries the epoch-day dimension as a materialized LONG
    * column and the read path filters on IT, not on the timestamp:
    * Spark's default parquet writer emits INT96 timestamps, which carry
    * no row-group statistics — a timestamp predicate can never skip a
    * row group, silently voiding the layout's whole point. The long
    * column gets full min/max stats and pushdown; production lakehouse
    * layouts materialize partition-grade date keys for the same reason.
    */
  def zorderPrunedScan(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheLifecycle.memoizedDurable(s"layout.zorderPrunedScan:$sfDir") {
      val base = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"),
          datediff(to_date(col("o_orderdate")),
            lit("1970-01-01").cast("date")).cast("long").alias("o_day"))
      val dir = layoutDir(sfDir)
      ZOrder.cluster(base, col("o_custkey"), col("o_day"), ZFiles)
        .write.mode("overwrite").parquet(dir)
      prunedRead(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice"))
        .orderBy("o_orderkey")
    }

  /** The band scan over a written layout, pre-projection — shared with
    * the ScalePostureSpec pruning measurement, which needs this plan
    * WITHOUT the final global sort (the range-sort's sampling pass
    * re-executes the scan and double-counts its metrics).
    */
  private[graft] def prunedRead(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("o_custkey").between(CustLo, CustHi)
        && col("o_day") >= DayLo && col("o_day") < DayHi)

  /** Buckets in the demo layout — small because the smallest fixture has
    * ~1.5k orders; production sizes bucket count to executor-heap-sized
    * bucket files (e.g. 4096 buckets over a 100 TB fact).
    */
  private val Buckets = 8

  private def ident(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_")

  private[graft] def bucketDir(sfDir: String, t: String): String =
    tmpPath(s"graft-bucketed-$t", sfDir)

  private def bucketTable(sfDir: String, t: String): String =
    s"graft_bkt_${t}_${ident(sfDir)}"

  /** BUCKETED CO-LOCATED JOIN: write `orders` and `lineitem` as
    * hash-bucketed tables on their join key (`bucketBy` + per-bucket
    * `sortBy`, external tables so the catalog carries only metadata),
    * then run the fact join + per-order rollup over the bucketed reads.
    * This is the second write-side lever next to [[zorderPrunedScan]]'s
    * clustering: pre-hashing both fact tables on the join key at WRITE
    * time makes every subsequent orderkey join and orderkey-led
    * aggregation shuffle-free — on a 100 TB fact pair, the nightly join
    * pipeline re-pays its one bucketed rewrite within the first run.
    *
    * Plan shape the layout buys (pinned by ScalePostureSpec): both scans
    * report `HashPartitioning(orderkey, 8)`, the SortMergeJoin takes
    * them WITHOUT a ShuffleExchange on either side, and the per-order
    * aggregate reuses the same distribution (orderkey is a superset-key
    * of the grouping), so the only exchange in the whole query is the
    * final presentation sort. The DuckDB oracle runs the identical join
    * over the ORIGINAL tables, proving the bucketed rewrite lossless.
    *
    * Memoized durably for the same reason as [[zorderPrunedScan]]: the
    * bucketed write is a once-per-layout side effect; the measured query
    * is the shuffle-free read path.
    */
  def bucketedColocatedJoin(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheLifecycle.memoizedDurable(s"layout.bucketedJoin:$sfDir") {
      writeBucketedTables(spark, sfDir)
      bucketedJoinRead(spark, sfDir).orderBy("o_orderkey")
    }

  /** `suffix` exists for specs (same rationale as
    * [[writeTotalsStateTables]]): rewriting the DEFAULT tables would
    * strand the registered query's durable-memoized frame on a stale
    * part-file listing.
    */
  private[graft] def writeBucketedTables(spark: SparkSession, sfDir: String,
      suffix: String = ""): Unit = {
    def write(df: DataFrame, t: String, key: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS ${bucketTable(sfDir, t)}")
      df.write.mode("overwrite")
        .bucketBy(Buckets, key)
        .sortBy(key)
        .option("path", bucketDir(sfDir, t))
        .saveAsTable(bucketTable(sfDir, t))
    }
    write(Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority")),
      s"orders$suffix", "o_orderkey")
    write(Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      s"lineitem$suffix", "l_orderkey")
  }

  /** The join + rollup over already-written bucketed tables, pre-sort —
    * shared with ScalePostureSpec, which asserts on THIS plan (the
    * presentation sort would add a range exchange that is not part of
    * the layout's claim). The `% 17` band keeps the verified output a
    * stable ~1/17 sample of orders; Catalyst pushes it below the join
    * into the orders scan and infers the twin predicate on lineitem.
    */
  private[graft] def bucketedJoinRead(spark: SparkSession, sfDir: String,
      suffix: String = ""): DataFrame = {
    val o = spark.table(bucketTable(sfDir, s"orders$suffix"))
    val l = spark.table(bucketTable(sfDir, s"lineitem$suffix"))
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(
        count(lit(1)).alias("n_lines"),
        graft.functions.Deterministic.exactSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).alias("gross"))
      .filter(pmod(col("o_orderkey"), lit(17)) === 0)
  }

  /** BUCKETED INCREMENTAL-MAINTENANCE MERGE — the two write-side levers
    * composed into the realistic 100 TB materialized-view maintenance
    * plan: the per-product partial-state table (history partials —
    * integer-quantized sums, [[StarSchema.productTotalsPartials]]) and
    * tonight's batch partials are BOTH written hash-bucketed on the
    * group key, so the nightly merge — a full-outer join + partial-sum
    * addition — runs with ZERO ShuffleExchanges (ScalePostureSpec pins
    * it): each bucket of state merges against exactly its twin bucket of
    * delta. The delta leg pays its own delta-SCALE aggregation shuffle
    * at staging-write time; the history partials are never rescanned,
    * never reshuffled — which is the entire point at 100 TB, where
    * `fact_product_totals_incremental`'s in-plan union merge would
    * re-shuffle the full key space every night.
    *
    * Correctness gate: the oracle is the SAME from-scratch GROUP BY over
    * all rows as `fact_product_totals_incremental` — incremental ≡
    * rebuild, now through the bucketed layout. The merged longs divide
    * back to doubles only after the final addition, so the result is
    * bit-identical to the one-shot aggregate.
    *
    * Memoized durably like the other layout queries: the bucketed writes
    * are the once-per-layout side effect; the measured query is the
    * exchange-free merge read.
    */
  def bucketedIncrementalMerge(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheLifecycle.memoizedDurable(s"layout.totalsMerge:$sfDir") {
      writeTotalsStateTables(spark, sfDir)
      bucketedMergeRead(spark, sfDir).orderBy("product_key")
    }

  /** `cut`/`suffix` exist for the degenerate-CDC spec cases (empty
    * state on day-one bootstrap, empty delta on a no-op night) — the
    * registered query always uses the defaults, and variant tables get
    * their own names so a spec can never clobber the tables the
    * durable-memoized registered frame reads.
    */
  private[graft] def writeTotalsStateTables(spark: SparkSession, sfDir: String,
      cut: String = StarSchema.TotalsCutover, suffix: String = ""): Unit = {
    def write(df: DataFrame, t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS ${bucketTable(sfDir, t)}")
      df.write.mode("overwrite")
        .bucketBy(Buckets, "product_key")
        .sortBy("product_key")
        .option("path", bucketDir(sfDir, t))
        .saveAsTable(bucketTable(sfDir, t))
    }
    write(StarSchema.productTotalsPartials(spark, sfDir,
      col("o.o_orderdate") < lit(cut)), s"totals_state$suffix")
    write(StarSchema.productTotalsPartials(spark, sfDir,
      col("o.o_orderdate") >= lit(cut)), s"totals_delta$suffix")
  }

  /** The merge over already-written bucketed partial-state tables,
    * pre-sort — shared with ScalePostureSpec's zero-exchange assertion
    * (the presentation sort would add a range exchange that is not part
    * of the layout's claim). Partial longs add BEFORE the single
    * dividing double op, mirroring [[StarSchema.factProductTotalsIncremental]].
    */
  private[graft] def bucketedMergeRead(spark: SparkSession, sfDir: String,
      suffix: String = ""): DataFrame =
    StarSchema.finalizeTotals(StarSchema.mergeTotalsPartials(
      spark.table(bucketTable(sfDir, s"totals_state$suffix")),
      spark.table(bucketTable(sfDir, s"totals_delta$suffix"))))

  val oracles: Map[String, String] = Map(
    "fact_totals_bucketed_merge" ->
      s"""SELECT l_partkey AS product_key,
         |       ${graft.functions.Deterministic.exactSumSql("l_quantity", 2)} AS total_quantity_sold,
         |       ${graft.functions.Deterministic.exactSumSql(
               "l_extendedprice * (1.0 - l_discount)", 4)} AS total_revenue,
         |       CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1
         |ORDER BY product_key""".stripMargin,
    "zorder_pruned_scan" ->
      s"""SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
         |FROM orders
         |WHERE o_custkey BETWEEN $CustLo AND $CustHi
         |  AND o_orderdate >= TIMESTAMP '$DateLo'
         |  AND o_orderdate < TIMESTAMP '$DateHi'
         |ORDER BY o_orderkey""".stripMargin,
    "bucketed_colocated_join" ->
      s"""SELECT o_orderkey, o_orderpriority,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       ${graft.functions.Deterministic.exactSumSql(
               "l_extendedprice * (1.0 - l_discount)", 4)} AS gross
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderkey % 17 = 0
         |GROUP BY 1, 2
         |ORDER BY o_orderkey""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_pruned_scan" -> zorderPrunedScan _,
    "bucketed_colocated_join" -> bucketedColocatedJoin _,
    "fact_totals_bucketed_merge" -> bucketedIncrementalMerge _,
  )
}
