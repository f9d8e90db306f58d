package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Cross-engine-deterministic numeric helpers.
  *
  * Double-typed aggregates are summation-order-dependent, so a Spark result
  * and a DuckDB oracle result can drift in the last ulp and fail a
  * hash-compare even when both are "correct". The fix used across this
  * library: quantize each row to an exact integer BEFORE aggregating, sum
  * the integers (exact, associative, order-independent), and divide once at
  * the end (one double op on identical inputs → identical output bits in
  * any IEEE-754 engine).
  *
  * Why `round(x * 10^s)` is itself cross-engine safe: .5 boundaries are
  * exactly representable in binary doubles (for |x| < 2^51), so a double is
  * either exactly on a boundary (both Spark's HALF_UP and DuckDB's
  * round-half-away-from-zero agree) or unambiguously off it.
  */
object Deterministic {

  /** A constant-valued but NON-FOLDABLE window partition key for bounded
    * side tables. A bare unpartitioned window logs the WindowExec
    * single-partition warning on every execution, drowning the log tail;
    * a `lit(0)` key does not help because Spark 4's
    * `EliminateWindowPartitions` strips foldable keys back to the
    * unpartitioned spelling. `pmod(xxhash64(c), 1)` is 0 for every row —
    * the same single-partition plan — but hangs off a real column, so
    * the optimizer keeps the explicit partition spec and the intent
    * (this window is DELIBERATELY single-partition over a bounded input)
    * is visible in the plan instead of warned about.
    */
  def onePartitionKey(c: Column): Column = pmod(xxhash64(c), lit(1))

  /** Quantize a double column to an exact integer at 10^scale. */
  def quantize(c: Column, scale: Int): Column = {
    val factor = math.pow(10, scale)
    round(c * lit(factor)).cast(LongType)
  }

  /** Order-independent exact sum of a double column at 10^scale precision,
    * returned as a double. Map-side partial aggregation still applies —
    * this is a plain `sum` over longs, fully codegen'd.
    */
  def exactSum(c: Column, scale: Int): Column = {
    val factor = math.pow(10, scale)
    (sum(quantize(c, scale)) / lit(factor)).cast("double")
  }

  /** DuckDB SQL fragment equivalent of [[exactSum]] — keep in sync. */
  def exactSumSql(expr: String, scale: Int): String = {
    val factor = s"1e$scale"
    s"CAST(CAST(SUM(CAST(round(($expr) * $factor) AS BIGINT)) AS BIGINT) / $factor AS DOUBLE)"
  }
}
