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
    * as-is; downstream predicates on either dimension skip most files.
    */
  def cluster(df: DataFrame, a: Column, b: Column, numFiles: Int): DataFrame = {
    require(!df.columns.contains("__zorder"),
      "input already has a __zorder column; rename it before clustering")
    val code = morton32(a, b).alias("__zorder")
    df.withColumn("__zorder", code)
      .repartitionByRange(numFiles, col("__zorder"))
      .sortWithinPartitions(col("__zorder"))
      .drop("__zorder")
  }
}
