package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Vector math over `array<float>` embedding columns, as Catalyst
  * higher-order expressions (`zip_with` / `transform` / `aggregate`) — no
  * UDFs, no collect.
  *
  * Two precisions:
  *  - Double path ([[dot]], [[cosine]]) — the production numeric path.
  *  - Quantized-integer path ([[quantize1000]], [[qdot]], [[qnorm2]],
  *    [[qcosine]]) — elements scaled ×1000 and rounded to exact longs, so
  *    dot products are exact integer sums (order-independent) and the final
  *    cosine is one sqrt+divide on identical integers in any IEEE engine.
  *    This is what the oracle-checked queries use; it is also a legitimate
  *    production technique (int8/int16-style quantized similarity).
  */
object VectorFunctions {

  /** Double-precision dot product — codegen'd
    * ([[graft.plans.DoubleArrayDot]]); float inputs cast up at analysis.
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.GraftFunctions.doubleDot(a, b)

  /** Reference HOF formulation of [[dot]] — kept for differential tests
    * against the custom expression.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Double-precision L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Double-precision cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** array<float> → array<long>, each element round(x*1000). The cast to
    * double BEFORE scaling matters: float×1000 rounds differently than
    * double×1000 in engines that don't promote.
    */
  def quantize1000(a: Column): Column =
    transform(a, x => round(x.cast("double") * lit(1000.0)).cast(LongType))

  /** Exact integer dot product of two quantized vectors — delegates to the
    * codegen'd [[graft.plans.LongArrayDot]] expression (the HOF
    * formulation [[qdotHof]] is ~100× slower per element at scan scale).
    */
  def qdot(a: Column, b: Column): Column =
    graft.plans.GraftFunctions.longDot(a, b)

  /** Reference HOF formulation of [[qdot]] — kept for differential tests
    * against the custom expression.
    */
  def qdotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Exact integer squared norm. */
  def qnorm2(a: Column): Column = qdot(a, a)

  /** Deterministic cosine from precomputed integer dot and squared norms:
    * one conversion + sqrt + multiply + divide → bit-identical across
    * engines.
    */
  def qcosineFrom(dotI: Column, n2a: Column, n2b: Column): Column =
    dotI / (sqrt(n2a) * sqrt(n2b))

  /** DuckDB fragments — keep in sync with the Scala forms. `v` columns are
    * BIGINT lists produced by [[quantize1000Sql]].
    */
  def quantize1000Sql(e: String): String =
    s"list_transform($e, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))"

  def qdotSql(a: String, b: String, dim: Int): String =
    s"CAST(list_sum(list_transform(generate_series(1, $dim), k -> $a[k] * $b[k])) AS BIGINT)"

  def qnorm2Sql(a: String, dim: Int): String = qdotSql(a, a, dim)
}
