package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.LongSingleInputType
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Codegen'd sketch-probe predicates whose sketch bytes ride a BROADCAST
  * variable instead of a plan `Literal`.
  *
  * The Literal spelling ships the serialized sketch inside the expression
  * tree, which means (a) every task binary carries the full sketch (a
  * right-sized 100 TB Bloom filter is tens of MB — the task-binary
  * transport detonates long before that), and (b) plan canonicalization
  * and the codegen-class cache hash the whole byte array on every lookup.
  * A `Broadcast[Array[Byte]]` handle serializes as an id: tasks stay
  * small, the sketch crosses the wire once per executor via the torrent
  * protocol, and each probe instance deserializes it once per JVM into a
  * `@transient lazy` field.
  *
  * Codegen references the expression instance itself
  * (`ctx.addReferenceObj`) and calls its `test(long)` — the same
  * reference-object pattern Spark's own non-literal expressions use — so
  * the predicate stays inside whole-stage codegen with no UDF wrapper.
  */

/** `bloom.mightContainLong(key)` with broadcast sketch bytes. False
  * positives pass (filtered by the exact join after), false negatives
  * impossible — see [[graft.functions.BloomPrune]].
  */
case class BloomProbe(child: Expression, bloomBc: Broadcast[Array[Byte]])
    extends UnaryExpression with LongSingleInputType {

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBc.value))

  def test(v: Long): Boolean = bloom.mightContainLong(v)

  override def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomProbe].getName)
      s"${ev.value} = $ref.test($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `cms.estimateCount(key) >= threshold` with broadcast sketch bytes.
  * CMS only over-estimates, so the predicate keeps a strict superset of
  * the true heavy keys — the same one-sided guarantee as [[BloomProbe]].
  */
case class CmsAtLeast(child: Expression, cmsBc: Broadcast[Array[Byte]],
    threshold: Double)
    extends UnaryExpression with LongSingleInputType {

  override def dataType: DataType = BooleanType

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmsBc.value))

  def test(v: Long): Boolean = cms.estimateCount(v) >= threshold

  override def nullSafeEval(input: Any): Any =
    test(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("cmsProbe", this, classOf[CmsAtLeast].getName)
      s"${ev.value} = $ref.test($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
