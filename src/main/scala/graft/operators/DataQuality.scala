package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality audit over the star inputs — the constraint
  * classes an ingestion gate checks before anything downstream trusts the
  * data (no reference analog; the reference's schemas declare nullability
  * but never enforce it, `transform_to_bq.py:28-74`):
  *
  *  - row-level predicates (positivity, range) — ONE conditional-sum pass
  *    over the table, not one scan per rule;
  *  - key uniqueness — one aggregation counting keys seen more than once;
  *  - referential integrity — a left-anti join counting orphans.
  *
  * Output is one row per constraint with its violation count (zero on the
  * clean fixture — the point of a gate is proving zeros). All branches
  * union into a single plan, so one action audits everything; at 100 TB
  * the row-level tier is map-side only and the heavy checks shuffle
  * once each on their key.
  */
object DataQuality {

  def dqViolations(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val rowLevel = o.agg(
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
        .alias("nonpositive_total"),
      sum(when(to_date(col("o_orderdate")) < to_date(lit("1990-01-01")) ||
        to_date(col("o_orderdate")) > to_date(lit("2030-12-31")), 1L).otherwise(0L))
        .alias("orderdate_out_of_range"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
        .alias("null_custkey"))
    val rowChecks = Seq("nonpositive_total", "orderdate_out_of_range", "null_custkey")
      .map(c => rowLevel.select(lit(c).alias("rule"),
        col(c).alias("violations")))
      .reduce(_.unionAll(_))
    val dupKeys = o.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).alias("n"))
      .filter(col("n") > 1)
      .agg(count(lit(1)).alias("violations"))
      .select(lit("duplicate_orderkey").alias("rule"), col("violations"))
    val orphans = o
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).alias("violations"))
      .select(lit("orphan_custkey").alias("rule"), col("violations"))
    rowChecks.unionAll(dupKeys).unionAll(orphans).orderBy("rule")
  }

  val oracles: Map[String, String] = Map(
    "dq_violations" ->
      """WITH row_level AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nonpositive_total,
        |    CAST(SUM(CASE WHEN CAST(o_orderdate AS DATE) < DATE '1990-01-01'
        |                    OR CAST(o_orderdate AS DATE) > DATE '2030-12-31'
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS orderdate_out_of_range,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS null_custkey
        |  FROM orders)
        |SELECT 'nonpositive_total' AS rule, nonpositive_total AS violations FROM row_level
        |UNION ALL
        |SELECT 'orderdate_out_of_range', orderdate_out_of_range FROM row_level
        |UNION ALL
        |SELECT 'null_custkey', null_custkey FROM row_level
        |UNION ALL
        |SELECT 'duplicate_orderkey',
        |       CAST(count(*) AS BIGINT)
        |FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'orphan_custkey', CAST(count(*) AS BIGINT)
        |FROM orders WHERE NOT EXISTS
        |  (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |ORDER BY rule""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_violations" -> dqViolations _,
  )
}
