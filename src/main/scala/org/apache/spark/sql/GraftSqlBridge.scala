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

  /** Release the cached blocks behind a `localCheckpoint`ed Dataset.
    *
    * `Dataset.unpersist` is a no-op for checkpointed frames: the blocks
    * belong to the INTERNAL checkpointed RDD wrapped by the resulting
    * `LogicalRDD` plan node, and are only freed when the ContextCleaner
    * eventually GCs the dropped reference — iterative algorithms that
    * supersede a generation per round would accumulate blocks for the
    * whole run. This reaches through the (private[sql]) plan node and
    * unpersists those blocks eagerly. No-op for non-checkpointed frames.
    */
  def unpersistLocalCheckpoint(df: Dataset[_], blocking: Boolean = false): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking)
      case _ => ()
    }

  /** True if the cache manager already holds a plan-identical entry for
    * this frame — the session-persist dedup check: a re-invoked operator
    * builds a fresh but canonically-equal plan, and persisting it again
    * would only log 'Asked to cache already cached data' and append a
    * duplicate lifecycle entry. (`sharedState` is `private[sql]`, hence
    * the bridge.)
    */
  def isCached(df: Dataset[_]): Boolean = (df, df.sparkSession) match {
    case (d: org.apache.spark.sql.classic.Dataset[_],
          s: org.apache.spark.sql.classic.SparkSession) =>
      s.sharedState.cacheManager.lookupCachedData(d).isDefined
    case _ => false
  }
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

/** `string` single-argument input declaration (payload hashes). */
trait StringSingleInputType
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[types.AbstractDataType] = Seq(types.StringType)
}

/** `binary` single-argument input declaration (opaque media payloads).
  * String arguments still work — Catalyst's implicit cast inserts the
  * byte-preserving string→binary cast (the same coercion `md5(string)`
  * rides), so a caller over a text column gets the UTF-8 bytes.
  */
trait BinarySingleInputType
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[types.AbstractDataType] = Seq(types.BinaryType)
}

/** `(bigint, bigint)` input declaration (hash + payload aggregate args). */
trait LongPairInputTypes
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[types.AbstractDataType] =
    Seq(types.LongType, types.LongType)
}
