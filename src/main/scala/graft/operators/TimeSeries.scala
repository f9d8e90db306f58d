package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Deterministic

/** Time-series completion operators (no reference analog — the reference's
  * only date handling is `dim_date`'s distinct calendar attributes,
  * `/root/reference/code_base/transform_to_bq.py:133-141`): a generated
  * date spine with gap fill, and year-over-year growth off a lag window.
  *
  * Scale notes:
  *  - The spine derives from a single-row global min/max aggregate and
  *    `sequence`-explodes into one row per DAY — thousands of rows for
  *    decades of data, regardless of fact size. The gap-fill join
  *    broadcasts the aggregated per-day side (one row per day), so the
  *    only shuffle at 100 TB is the partial/final daily aggregation of
  *    the fact itself.
  *  - YoY's unpartitioned lag window sees one row per YEAR (the heavy
  *    lifting happened in the aggregation below it) — a single-partition
  *    window over tens of rows is free; the usual "global window" hazard
  *    does not apply.
  *  - Revenue sums use [[Deterministic.exactSum]]; the growth ratio is a
  *    single double divide on bit-identical inputs, so it is bit-identical
  *    across engines too.
  */
object TimeSeries {

  /** Continuous daily revenue series: every calendar day between the first
    * and last order date appears exactly once, days without orders filled
    * with zeros — the classic "dense time series from sparse facts" shape
    * that any downstream windowing/charting expects.
    */
  def ordersDailyGapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).alias("date"), col("o_totalprice"))
    val daily = o.groupBy(col("date"))
      .agg(count(lit(1)).alias("n_orders"),
        Deterministic.exactSum(col("o_totalprice"), 2).alias("revenue"))
    val spine = o.agg(min(col("date")).alias("lo"), max(col("date")).alias("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).alias("date"))
    spine.join(broadcast(daily), Seq("date"), "left")
      .select(col("date"),
        coalesce(col("n_orders"), lit(0L)).alias("n_orders"),
        coalesce(col("revenue"), lit(0.0)).alias("revenue"))
      .orderBy("date")
  }

  /** Year-over-year revenue growth: yearly totals, previous year via lag,
    * growth ratio (null for the first year, as lag defines it).
    */
  def ordersYoyGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val yearly = Tables.orders(spark, sfDir)
      .select(year(to_date(col("o_orderdate"))).alias("year"), col("o_totalprice"))
      .groupBy(col("year"))
      .agg(count(lit(1)).alias("n_orders"),
        Deterministic.exactSum(col("o_totalprice"), 2).alias("revenue"))
    // constant partition key: same single-partition plan over the bounded
    // (≤ distinct-years) aggregate, without the unpartitioned-window
    // warning that would mask a real one in the logs
    val w = Window.partitionBy(Deterministic.onePartitionKey(col("year")))
      .orderBy(col("year"))
    yearly
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("yoy_growth",
        (col("revenue") - col("prev_revenue")) / col("prev_revenue"))
      .orderBy("year")
  }

  val oracles: Map[String, String] = Map(
    "orders_daily_gapfill" ->
      s"""WITH b AS (
         |  SELECT min(CAST(o_orderdate AS DATE)) AS lo,
         |         max(CAST(o_orderdate AS DATE)) AS hi
         |  FROM orders),
         |spine AS (
         |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS date
         |  FROM b),
         |daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS date,
         |         CAST(count(*) AS BIGINT) AS n_orders,
         |         ${Deterministic.exactSumSql("o_totalprice", 2)} AS revenue
         |  FROM orders GROUP BY 1)
         |SELECT spine.date AS date,
         |       coalesce(n_orders, 0) AS n_orders,
         |       coalesce(revenue, 0.0) AS revenue
         |FROM spine LEFT JOIN daily ON spine.date = daily.date
         |ORDER BY date""".stripMargin,
    "orders_yoy_growth" ->
      s"""WITH yearly AS (
         |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS year,
         |         CAST(count(*) AS BIGINT) AS n_orders,
         |         ${Deterministic.exactSumSql("o_totalprice", 2)} AS revenue
         |  FROM orders GROUP BY 1)
         |SELECT year, n_orders, revenue,
         |       lag(revenue) OVER (ORDER BY year) AS prev_revenue,
         |       (revenue - lag(revenue) OVER (ORDER BY year))
         |         / lag(revenue) OVER (ORDER BY year) AS yoy_growth
         |FROM yearly ORDER BY year""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_daily_gapfill" -> ordersDailyGapfill _,
    "orders_yoy_growth"    -> ordersYoyGrowth _,
  )
}
