package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge, LongSingleInputType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded DISTINCT-min-k aggregate: keeps the `k` SMALLEST DISTINCT
  * long values per group, evaluating to them as a sorted ascending
  * `array<long>` — the mergeable, capped spelling of
  * `slice(sort_array(collect_set(v)), 1, k)`.
  *
  * Why it exists (guide §2.3/§5): the winnowing overlap derivation needs,
  * per fingerprint hash, the complete distinct document set WHEN that set
  * is small (df ≤ cap — the rare hashes that may form pairs) and only the
  * fact of overflow when it is not (hot hashes are discarded). With
  * `k = cap + 1`:
  *   - df ≤ cap   → the buffer never evicts, so the result IS the
  *                  complete sorted distinct set (size = df);
  *   - df ≥ cap+1 → the buffer saturates at k distinct values, so
  *                  `size(result) = cap + 1 > cap` marks the group hot
  *                  and a size filter discards it.
  * Both `collect_list` + post-filter and `count(1) over (partition by
  * key)` buffer EVERY row of a hot key before the cap can bite — the
  * 100 TB straggler/OOM the r21 verdict flagged; this buffer is ≤ k
  * longs by construction, merges associatively/commutatively in O(k),
  * and partial-aggregates map-side, so the exchange carries ≤ k·|groups|
  * longs no matter the corpus (the [[MinKByHash]] discipline, with
  * distinct-insertion semantics).
  *
  * Determinism: the result is a function of the group's distinct value
  * SET alone (smallest k of it, sorted), so it is identical under any
  * partitioning, input order, or merge tree. Nulls are skipped
  * (`count`-style discipline); duplicates collapse — that is the point.
  */
case class DistinctMinK(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with LongSingleInputType {

  require(k >= 1, s"distinct_min_k needs k >= 1 (got $k)")

  override def children: Seq[Expression] = Seq(value)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(value = newChildren(0))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  // sorted set capped at k: a full buffer admits v only if it beats the
  // current maximum (then evicts that maximum) — O(log k) per row; a
  // value already present or too large is O(log k) lookup only
  private def insert(buf: mutable.TreeSet[Long], v: Long): Unit = {
    if (buf.size < k) { buf += v }
    else if (v < buf.last && !buf.contains(v)) { buf -= buf.last; buf += v }
  }

  override def update(buf: mutable.TreeSet[Long],
      input: InternalRow): mutable.TreeSet[Long] = {
    val v = value.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
      other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf += bb.getLong()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DistinctMinK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): DistinctMinK =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "distinct_min_k"
}

object DistinctMinK {

  /** `distinct_min_k(v, k)` as an aggregate Column. */
  def distinctMinK(v: Column, k: Int): Column =
    GraftSqlBridge.column(
      DistinctMinK(GraftSqlBridge.expression(v), k).toAggregateExpression())
}
