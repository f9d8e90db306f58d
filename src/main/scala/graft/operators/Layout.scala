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

  private[graft] def layoutDir(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-zlayout-${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"

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

  val oracles: Map[String, String] = Map(
    "zorder_pruned_scan" ->
      s"""SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
         |FROM orders
         |WHERE o_custkey BETWEEN $CustLo AND $CustHi
         |  AND o_orderdate >= TIMESTAMP '$DateLo'
         |  AND o_orderdate < TIMESTAMP '$DateHi'
         |ORDER BY o_orderkey""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_pruned_scan" -> zorderPrunedScan _,
  )
}
