package graft.plans

import org.apache.spark.sql.BinarySingleInputType
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 60-bit block-mean perceptual hash of an opaque BINARY
  * payload (the 1-D dHash `graft.operators.Multimodal.phashSigs`
  * documents): split the payload into 61 fixed blocks of `⌈n/61⌉`
  * bytes, take the 60 gradient signs between adjacent block means
  * (integer cross-multiplication `s₂·l₁ > s₁·l₂` — no float division),
  * fold MSB-first into a long.
  *
  * The input type is `binary` — the bytes contract is STRUCTURAL, not
  * conventional: a string argument arrives through Catalyst's implicit
  * byte-preserving string→binary cast as its UTF-8 bytes. The
  * higher-order-function spelling kept verbatim in the DuckDB oracle
  * (`aggregate(slice(split(text,''),…))` block sums) sums CODEPOINTS,
  * which equals the byte sum on every ASCII input — the
  * ASCII-restricted differential in ExpressionPropertySpec pins that
  * agreement, and a separate arbitrary-bytes property pins the
  * interpreted eval against the codegen path where no codepoint twin
  * exists. The HOF form walks interpreted lambdas per block per row
  * (HigherOrderFunction is CodegenFallback); this is one compiled pass
  * over the payload bytes — the shape a 100 TB signature scan needs.
  */
case class PHash60(child: Expression)
    extends UnaryExpression with BinarySingleInputType {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[Array[Byte]]
    val n = s.length
    val bs = (n + 60) / 61
    val sums = new Array[Long](61)
    val lens = new Array[Long](61)
    if (bs > 0) {
      var k = 0
      while (k < 61) {
        val start = k.toLong * bs
        val end = math.min(start + bs, n.toLong)
        if (end > start) {
          lens(k) = end - start
          var i = start.toInt
          var acc = 0L
          while (i < end) { acc += (s(i) & 0xff).toLong; i += 1 }
          sums(k) = acc
        }
        k += 1
      }
    }
    var acc = 0L
    var g = 0
    while (g < 60) {
      acc = (acc << 1) +
        (if (sums(g + 1) * lens(g) > sums(g) * lens(g + 1)) 1L else 0L)
      g += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bs = ctx.freshName("bs")
      // one buffer pair per operator instance, not per row (122 longs per
      // processed row would be pure GC churn in a 100 TB scan)
      val sums = ctx.addMutableState("long[]", "phashSums",
        v => s"$v = new long[61];")
      val lens = ctx.addMutableState("long[]", "phashLens",
        v => s"$v = new long[61];")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val st = ctx.freshName("st")
      val en = ctx.freshName("en")
      val bacc = ctx.freshName("bacc")
      val g = ctx.freshName("g")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.length;
         |long $bs = ($n + 60) / 61;
         |java.util.Arrays.fill($sums, 0L);
         |java.util.Arrays.fill($lens, 0L);
         |if ($bs > 0) {
         |  for (int $k = 0; $k < 61; $k++) {
         |    long $st = (long) $k * $bs;
         |    long $en = Math.min($st + $bs, (long) $n);
         |    if ($en > $st) {
         |      $lens[$k] = $en - $st;
         |      long $bacc = 0L;
         |      for (int $i = (int) $st; $i < $en; $i++) {
         |        $bacc += ($a[$i] & 0xff);
         |      }
         |      $sums[$k] = $bacc;
         |    }
         |  }
         |}
         |long $acc = 0L;
         |for (int $g = 0; $g < 60; $g++) {
         |  $acc = ($acc << 1) +
         |    (($sums[$g + 1] * $lens[$g] > $sums[$g] * $lens[$g + 1]) ? 1L : 0L);
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
