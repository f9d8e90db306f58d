package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded top-k-smallest aggregate: keeps the `k` (hash, id) pairs with
  * the smallest `(hash, id)` order within each group and evaluates to
  * them as a sorted `array<struct<h, id>>` — the MERGEABLE spelling of
  * "deterministic fixed-size sample per stratum".
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY
  * stratum ORDER BY hash) <= k` must shuffle AND FULLY SORT every
  * stratum's rows — at 100 TB that is a corpus-sized sort to keep five
  * rows per source. This aggregate is algebraic in the semigroup sense:
  * the partial state is at most `k` pairs per (partition, group), partial
  * states merge associatively/commutatively in O(k), and the map-side
  * combine discards beyond-k rows before the exchange — the shuffle
  * carries ≤ k·|strata| pairs no matter the corpus size. Spark plans it
  * as `ObjectHashAggregate` (partial → final), the same two-phase shape
  * as `collect_set`, but with the buffer bounded by construction. It is
  * the repo's first custom AGGREGATE expression, beside the scalar
  * codegen family ([[LongArrayDot]], [[MinHash16]], [[PHash60]], ...).
  *
  * Determinism: ties in `hash` break by `id`, so with distinct ids the
  * result is a total order — identical on any engine, any partitioning,
  * any merge tree (the property a shuffle-`TABLESAMPLE` lacks). Null
  * hashes/ids are skipped (`count`-style null discipline). Duplicate
  * (hash, id) input rows count twice, exactly as `row_number` would rank
  * two identical rows.
  */
case class MinKByHash(
    hash: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]]
  with org.apache.spark.sql.LongPairInputTypes {

  require(k >= 1, s"min_k_by_hash needs k >= 1 (got $k)")

  override def children: Seq[Expression] = Seq(hash, payload)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), payload = newChildren(1))

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  // max-heap on (h, id): the head is the CURRENT WORST kept pair, so a
  // full buffer admits a new pair only if it beats the head — O(log k)
  // per admitted row, O(1) per rejected one
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)]

  private def insert(buf: mutable.PriorityQueue[(Long, Long)],
      pair: (Long, Long)): Unit = {
    if (buf.size < k) {
      buf.enqueue(pair)
    } else if (Ordering[(Long, Long)].lt(pair, buf.head)) {
      buf.dequeue()
      buf.enqueue(pair)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val h = hash.eval(input)
    val id = payload.eval(input)
    if (h != null && id != null) {
      insert(buf, (h.asInstanceOf[Long], id.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Long)],
      other: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toArray.sorted
    new GenericArrayData(sorted.map { case (h, id) =>
      new GenericInternalRow(Array[Any](h, id)): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 * buf.size)
    buf.foreach { case (h, id) => bb.putLong(h); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) {
      buf.enqueue((bb.getLong(), bb.getLong()))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKByHash =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinKByHash =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "min_k_by_hash"
}

object MinKByHash {

  /** `min_k_by_hash(h, id, k)` as an aggregate Column. */
  def minKByHash(h: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(MinKByHash(
      GraftSqlBridge.expression(h),
      GraftSqlBridge.expression(id), k).toAggregateExpression())
}
