package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) clustering for multi-dimensional data layout.
  *
  * `repartitionByRange + sortWithinPartitions` on ONE key gives parquet
  * row-group/file skipping on that key alone (pinned by
  * ScalePostureSpec); queries that slice on a SECOND dimension still scan
  * everything. Interleaving the bits of two keys into one Morton code and
  * range-clustering on THAT gives every file a small bounding box in BOTH
  * dimensions — the standard lakehouse layout lever for multi-dimensional
  * pruning at 100 TB, here as a pure Catalyst expression (bit built-ins,
  * codegen-friendly, no UDF).
  *
  * Scope: 2×32-bit unsigned keys → one 64-bit code, the classic
  * magic-number bit spread. Callers map their dimensions onto [0, 2³²)
  * first (epoch days, surrogate ints, bucketed doubles); values outside
  * are masked to their low 32 bits.
  */
object ZOrder {

  /** Spread the low 32 bits of `x` to the even bit positions of a long:
    * bit k → bit 2k (the magic-number cascade, expressed over Catalyst
    * bit built-ins so it stays inside whole-stage codegen).
    */
  private def spread(x: Column): Column = {
    val masks = Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8  -> 0x00FF00FF00FF00FFL,
      4  -> 0x0F0F0F0F0F0F0F0FL,
      2  -> 0x3333333333333333L,
      1  -> 0x5555555555555555L)
    masks.foldLeft(x.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (acc, (shift, mask)) =>
        (acc.bitwiseOR(shiftleft(acc, shift))).bitwiseAND(lit(mask))
    }
  }

  /** 64-bit Morton code of two 32-bit keys: `a`'s bits land on even
    * positions, `b`'s on odd. Monotone locality: nearby (a, b) points get
    * nearby codes, so range-clustering on the code bounds every file in
    * BOTH dimensions.
    */
  def morton32(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Reference JVM implementation — differential-tested against the
    * Catalyst expression in ScalePostureSpec.
    */
  private[graft] def morton32Ref(a: Long, b: Long): Long = {
    def sp(v: Long): Long = {
      var x = v & 0xFFFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      x = (x | (x << 1)) & 0x5555555555555555L
      x
    }
    sp(a) | (sp(b) << 1)
  }

  /** Range-cluster `df` into `numFiles` output partitions by the Morton
    * code of two integer-mappable dimensions, sorted within partitions so
    * parquet row-group stats are tight on BOTH columns. Write the result
    * as-is; downstream predicates on either dimension skip most row
    * groups (ScalePostureSpec pins the actual scan-level payoff).
    *
    * Layout is DETERMINISTIC and DEPTH-BALANCED — the repo's
    * reproducibility discipline (sampling-based `repartitionByRange`
    * draws different boundaries run to run), via the same sharded-rank
    * construction the equi-depth histograms use: a bounded min/max probe
    * fixes the occupied code span, equal-width coarse shards are monotone
    * in code order, per-shard counts roll into broadcast offsets, each
    * row's exact global code rank is shard_offset + local rank, and the
    * file id is integer ntile arithmetic on that rank — every file gets
    * n/numFiles ± 1 rows of one contiguous code interval, independent of
    * code-space density. Files are then routed to their own partition by
    * a driver-computed probe value whose Murmur3 hash lands exactly on
    * the file's partition id — identity routing through the stock hash
    * shuffle, so no two files ever merge.
    *
    * Determinism caveat: rows with EQUAL codes (duplicate (a, b)) may
    * swap across a file boundary between runs — boundaries in code space,
    * per-file row counts, and bounding boxes are all reproducible; the
    * assignment of identical rows among them is not ordered further.
    * Degenerate input (most rows sharing one code value) collapses onto
    * one coarse shard and ranks it in a single task — the caveat the
    * Stats machinery documents for value-derived shards.
    *
    * Null dimensions: a null in either column makes the Morton code null;
    * such rows are routed EXPLICITLY to the first shard, where the
    * nulls-first sort clusters them at the front of the first file —
    * deterministic and lossless, not an error. Filter or impute upstream
    * if null dimensions are meaningless for the layout. The ALL-null
    * case (every row's code null, so the span probe returns null) is
    * different in kind: it takes the empty-input early return below, so
    * the frame comes back LOSSLESS but with NO re-layout at all — no
    * coalesce/repartition to `numFiles` — and still carrying the call's
    * session-persist pin until the lifecycle release.
    *
    * Action economy: one bounded span probe plus ONE collect of the
    * per-shard counts (≤ coarse rows); offsets and the grand total derive
    * from that same collect on the driver and ride back as literal maps,
    * so no offsets window, no broadcast join, and no third pass over the
    * input plan. The coded frame is session-persisted for the call, so
    * the probe, the counts, and the final layout job scan the (possibly
    * expensive) input once, not three times.
    */
  def cluster(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    require(numFiles >= 1, "numFiles must be positive")
    Seq("__zorder", "__zshard", "__zrank", "__zroute", "__zoff").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a $c column; rename it before clustering"))
    if (numFiles == 1)
      return df.withColumn("__zorder", morton32(a, b))
        .coalesce(1).sortWithinPartitions(col("__zorder")).drop("__zorder")
    val coded = graft.CacheLifecycle.sessionPersist(
      df.withColumn("__zorder", morton32(a, b)))
    val span = coded.agg(min(col("__zorder")), max(col("__zorder"))).head()
    if (span.isNullAt(0)) return coded.drop("__zorder") // empty (or all-null-code) input
    val (lo, hi) = (span.getLong(0), span.getLong(1))
    // double arithmetic: the signed code span can overflow long; IEEE is
    // deterministic and coarse boundaries only need to be ~equal-width
    val coarse = math.max(1024, numFiles * 16)
    val width = math.max(1.0, (hi.toDouble - lo.toDouble + 1.0) / coarse)
    val sharded = coded.withColumn("__zshard",
      when(col("__zorder").isNull, lit(0)).otherwise(least(lit(coarse - 1),
        floor((col("__zorder").cast("double") - lit(lo.toDouble)) / lit(width))
          .cast("int"))))
    // ONE driver collect of the bounded (≤ coarse rows) per-shard counts;
    // exclusive running offsets and the grand total fall out of the same
    // array, replacing a window + an extra aggregate action + a broadcast
    // join with a literal map lookup
    val shardCounts = sharded.groupBy(col("__zshard"))
      .agg(count(lit(1)).alias("__zn")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = shardCounts.map(_._2).sum
    val offMap: Map[Int, Long] = {
      var acc = 0L
      shardCounts.map { case (s, n) => val off = acc; acc += n; s -> off }.toMap
    }
    // probe p(f): smallest non-negative long with pmod(murmur3(p), n) = f —
    // the same hash+pmod the hash shuffle applies, so repartitioning on
    // the probe column places file f in partition f exactly
    val probes: Seq[Long] = {
      val found = new Array[Long](numFiles)
      val seen = new Array[Boolean](numFiles)
      var cand = 0L
      var left = numFiles
      while (left > 0) {
        val s = math.floorMod(
          org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(cand, 42), numFiles)
        if (!seen(s)) { seen(s) = true; found(s) = cand; left -= 1 }
        cand += 1
      }
      found.toSeq
    }
    sharded
      .withColumn("__zrank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__zshard")).orderBy(col("__zorder"))))
      .withColumn("__zoff", element_at(typedlit(offMap), col("__zshard")))
      .withColumn("__zroute", element_at(typedlit(probes),
        expr(s"CAST(((__zoff + __zrank - 1) * $numFiles) div ${total}L AS INT)") + 1))
      .repartition(numFiles, col("__zroute"))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder", "__zshard", "__zrank", "__zoff", "__zroute")
  }
}
