package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — the supported
  * pattern for libraries contributing custom Catalyst expressions (the
  * public API wraps ColumnNode, not Expression, since Spark 4.0).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Mix-in declaring `(array<long>, array<long>)` input types with
  * implicit up-casts. Lives here because `AbstractDataType` (the
  * `inputTypes` signature) is `private[sql]`.
  */
trait LongArrayInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[types.AbstractDataType] =
    Seq(types.ArrayType(types.LongType), types.ArrayType(types.LongType))
}

/** Double-array twin of [[LongArrayInputTypes]]. */
trait DoubleArrayInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[types.AbstractDataType] =
    Seq(types.ArrayType(types.DoubleType), types.ArrayType(types.DoubleType))
}

/** Single-argument variant of [[LongArrayInputTypes]]. */
trait LongArraySingleInputType
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[types.AbstractDataType] =
    Seq(types.ArrayType(types.LongType))
}

/** `array<string>` single-argument input declaration. */
trait StringArraySingleInputType
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[types.AbstractDataType] =
    Seq(types.ArrayType(types.StringType))
}

/** `bigint` single-argument input declaration (sketch-probe keys). */
trait LongSingleInputType
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[types.AbstractDataType] = Seq(types.LongType)
}
