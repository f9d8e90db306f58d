package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning — the "runtime filter" pattern made explicit.
  *
  * A semi/inner join whose build side is selective but too large to
  * broadcast still shuffles the ENTIRE probe side at 100 TB. A Bloom
  * filter of the build keys is a few MB regardless of probe size; shipping
  * it to every probe task eliminates the non-qualifying probe rows BEFORE
  * the shuffle, which is where the join cost lives. False positives only
  * cost wasted shuffle rows (the exact join still runs after); false
  * negatives are impossible, so the composed result is row-identical to
  * the plain join — exactly what the oracle asserts.
  *
  * Spark's own `InjectRuntimeFilter` does this automatically when
  * thresholds align; this module is the deterministic, always-on spelling
  * of the same plan shape (build → sketch → pushed probe predicate), with
  * the probe-side test running as the codegen'd `BloomFilterMightContain`
  * Catalyst predicate — no UDF in the hot path.
  *
  * Reference scope note: the reference has no joins beyond plain inner
  * equi-joins (`/root/reference/code_base/transform_to_bq.py:104,113-114,
  * 144`) — this is north-star scale machinery.
  */
object BloomPrune {

  /** `might_contain(serialized_bloom, key)` as a codegen'd Column
    * predicate. The key expression must be integral (the sketch hashes
    * raw longs); the bloom bytes ride into every task as a literal —
    * the same transport a broadcast variable would use, minus a shuffle.
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      GraftSqlBridge.expression(key.cast("long"))))

  /** Left-semi join with a Bloom pre-filter on the probe side.
    *
    * The build-side sketch is computed eagerly (one small Spark job —
    * bounded driver memory, like collecting a broadcast side). `fpp`
    * trades sketch size against wasted shuffle rows; false negatives
    * cannot occur, so output ≡ `probe SEMI JOIN build` row-for-row.
    */
  def prunedSemiJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long, fpp: Double): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    probe
      .where(mightContain(bos.toByteArray, col(probeKey)))
      .join(build, probe(probeKey) === build(buildKey), "left_semi")
  }
}
