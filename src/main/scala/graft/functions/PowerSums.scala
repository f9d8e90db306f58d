package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (`Aggregator[IN, BUF, OUT]`) accumulating exact integer
  * power sums of a quantized double column — the merge-safe statistics
  * kernel behind `order_price_stats`, packaged as a reusable aggregate.
  *
  * The buffer is (n, Σq, Σq²) over q = round(x·10^scale): integral,
  * associative, commutative — so partial aggregation and any merge tree
  * give bit-identical results, unlike engine-native streaming variance.
  * Register with `functions.udaf(...)` for Column/SQL use, or apply to a
  * `KeyValueGroupedDataset` via `.agg(PowerSums.toColumn)`.
  */
final case class PowerSumsBuf(n: Long, s1: Long, s2: Long)
final case class PowerSumsStats(n: Long, mean: Double, stddev: Double)

object PowerSums extends Aggregator[Double, PowerSumsBuf, PowerSumsStats] {
  type Buf = PowerSumsBuf
  type Stats = PowerSumsStats
  private def Buf(n: Long, s1: Long, s2: Long) = PowerSumsBuf(n, s1, s2)
  private def Stats(n: Long, mean: Double, stddev: Double) = PowerSumsStats(n, mean, stddev)

  val scaleFactor: Double = 1.0 // quantize to whole units (dollars)

  override def zero: Buf = Buf(0L, 0L, 0L)

  override def reduce(b: Buf, x: Double): Buf = {
    val q = math.round(x * scaleFactor)
    Buf(b.n + 1, b.s1 + q, b.s2 + q * q)
  }

  override def merge(a: Buf, b: Buf): Buf =
    Buf(a.n + b.n, a.s1 + b.s1, a.s2 + b.s2)

  override def finish(b: Buf): Stats =
    if (b.n < 2) Stats(b.n, if (b.n == 0) 0.0 else b.s1.toDouble / b.n, 0.0)
    else Stats(
      b.n,
      b.s1.toDouble / b.n,
      math.sqrt((b.s2.toDouble - b.s1.toDouble * b.s1 / b.n) / (b.n - 1)))

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
}
