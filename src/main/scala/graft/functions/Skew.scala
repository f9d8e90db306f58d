package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key joins.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.*`) is the
  * first line of defense and needs no code. Explicit salting remains the
  * tool when AQE can't help — e.g. a build side too large to broadcast
  * joined on a power-law key (the classic 100 TB failure mode where one
  * reducer receives a single key's entire volume).
  *
  * [[saltedJoin]]: the probe side scatters each row to one of
  * `saltBuckets` sub-keys (deterministically, from a uniqueness column);
  * the build side replicates every row to ALL sub-keys. The join result
  * is row-identical to the unsalted join, but the hot key's rows spread
  * across `saltBuckets` reducers.
  */
object Skew {

  /** Equi-join `probe ⋈ build` on `probe(probeKey) === build(buildKey)`
    * with the probe side salted `saltBuckets` ways. `scatterOn` must be a
    * column whose values spread within a key (a line number, a unique id).
    * Build-side replication factor = saltBuckets — keep the build side
    * the smaller input.
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      scatterOn: Column, saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {

    // Build-side rows are replicated saltBuckets times, so any join type
    // that emits UNMATCHED build rows (right/full outer) would emit one
    // null-extended row per replica — not row-identical to the unsalted
    // join. Probe-side-preserving types are safe.
    val allowed = Set("inner", "left", "leftouter", "leftsemi", "semi",
      "leftanti", "anti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support build-side-preserving join type '$joinType'")

    val salted = probe.withColumn("__salt_p",
      pmod(xxhash64(scatterOn), lit(saltBuckets.toLong)))
    val replicated = build.withColumn("__salt_b",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated,
        salted("__salt_p") === replicated("__salt_b") &&
          salted(probeKey) === replicated(buildKey),
        joinType)
      .drop("__salt_p", "__salt_b")
  }
}
