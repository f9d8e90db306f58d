package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._

import graft.plans.BloomProbe

/** Bloom-filter join pruning — the "runtime filter" pattern made explicit.
  *
  * A semi/inner join whose build side is selective but too large to
  * broadcast still shuffles the ENTIRE probe side at 100 TB. A Bloom
  * filter of the build keys is a few MB regardless of probe size; shipping
  * it to every executor eliminates the non-qualifying probe rows BEFORE
  * the shuffle, which is where the join cost lives. False positives only
  * cost wasted shuffle rows (the exact join still runs after); false
  * negatives are impossible, so the composed result is row-identical to
  * the plain join — exactly what the oracle asserts.
  *
  * Spark's own `InjectRuntimeFilter` does this automatically when
  * thresholds align; this module is the deterministic, always-on spelling
  * of the same plan shape (build → sketch → pushed probe predicate). The
  * sketch bytes ride a BROADCAST VARIABLE — one torrent transfer per
  * executor — not a plan `Literal` (which would serialize the full sketch
  * into every task binary and through every plan-canonicalization hash;
  * at a right-sized 100 TB sketch of tens of MB that transport is the
  * bottleneck). The probe-side test is the codegen'd [[BloomProbe]]
  * Catalyst predicate — no UDF in the hot path.
  *
  * Reference scope note: the reference has no joins beyond plain inner
  * equi-joins (`/root/reference/code_base/transform_to_bq.py:104,113-114,
  * 144`) — this is north-star scale machinery.
  */
object BloomPrune {

  /** `might_contain(broadcast_bloom, key)` as a codegen'd Column
    * predicate. The key expression must be integral (the sketch hashes
    * raw longs).
    */
  def mightContain(bloomBc: Broadcast[Array[Byte]], key: Column): Column =
    GraftSqlBridge.column(BloomProbe(
      GraftSqlBridge.expression(key.cast("long")), bloomBc))

  /** Build a Bloom filter of `build`'s `buildKey` column, sized from the
    * build side's actual row count (never a guessed constant: an
    * undersized sketch blows past `fpp` and stops pruning; an oversized
    * one wastes broadcast bytes), and hand back the broadcast handle.
    * Two small jobs over the build side (count + sketch aggregation) —
    * the build side of a runtime filter is selective by premise, so both
    * are cheap relative to the probe scan they save.
    */
  def broadcastBloom(build: DataFrame, buildKey: String, fpp: Double)
      : Broadcast[Array[Byte]] = {
    val expectedItems = math.max(build.count(), 64L)
    val bf = build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    // tracked: repeated invocations in a long session would otherwise
    // accumulate broadcast blocks until driver GC — CacheLifecycle
    // .unpersistAll destroys superseded sketches alongside cached frames
    graft.CacheLifecycle.trackedBroadcast(
      build.sparkSession.sparkContext.broadcast(bos.toByteArray))
  }

  /** Left-semi join with a Bloom pre-filter on the probe side.
    *
    * The build-side sketch is computed eagerly (two small Spark jobs —
    * bounded driver memory, like collecting a broadcast side). `fpp`
    * trades sketch size against wasted shuffle rows; false negatives
    * cannot occur, so output ≡ `probe SEMI JOIN build` row-for-row.
    */
  def prunedSemiJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      fpp: Double): DataFrame = {
    val bc = broadcastBloom(build, buildKey, fpp)
    probe
      .where(mightContain(bc, col(probeKey)))
      .join(build, probe(probeKey) === build(buildKey), "left_semi")
  }
}
