package graft.plans

import org.apache.spark.sql.StringArraySingleInputType
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 16-permutation MinHash signature straight from the shingle
  * strings: `array<string> → array<long>` where slot i is
  * `min over shingles of (a_i · h + b_i) mod p`, `h = md5_60(shingle) mod p`,
  * p = 2³¹−1, and (a_i, b_i) come packed as `a_i·2³¹ + b_i`.
  *
  * Semantically identical to the higher-order spelling
  * `aggregate(transform(sh, x -> md5_60(x) % p), repeat(MAX, 16),
  * (acc, h) -> zip_with(acc, params, least(...)))` on every input
  * (differential-tested in ExpressionPropertySpec): a null shingle is
  * skipped (the HOF's
  * `least` ignores the null affine image), an empty array yields 16
  * `Long.MaxValue` slots, a null array yields null. The HOF form walks the
  * array through TWO interpreted lambda layers and allocates a fresh
  * 16-element array per shingle (~O(16·S) boxed ops per document — the
  * dominant cost of the cold sf0.1 dedup build); this expression is one
  * compiled pass with a single 16-long buffer per row, which is the shape
  * a 100 TB signature scan needs. `md5_60` here is the lower 60 bits of
  * the MD5 digest — bit-identical to
  * `conv(substring(md5(s), 18, 15), 16, 10)` (the cross-engine spelling
  * shared with the DuckDB oracle).
  *
  * Params ride as a `Seq[Long]` (structural equality — keeps plan
  * canonicalization and the codegen cache working across identical
  * signatures; an `Array` field would compare by reference).
  */
case class MinHash16(child: Expression, packedParams: Seq[Long])
    extends UnaryExpression with StringArraySingleInputType {

  require(packedParams.nonEmpty, "MinHash16 needs at least one permutation")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val P = MinHash16.Prime

  @transient private lazy val paramsArr: Array[Long] = packedParams.toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = paramsArr.length
    val acc = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var b = 8
        while (b < 16) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h & ((1L << 60) - 1)) % P
        var j = 0
        while (j < k) {
          val c = paramsArr(j)
          val v = (h * (c >>> 31) + (c & ((1L << 31) - 1))) % P
          if (v < acc(j)) acc(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val params = ctx.addReferenceObj("minhashParams", paramsArr, "long[]")
      val md = ctx.addMutableState("java.security.MessageDigest", "minhashMd",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) {
                |  throw new RuntimeException(e);
                |}""".stripMargin)
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |int $k = $params.length;
         |long[] $acc = new long[$k];
         |java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    byte[] $d = $md.digest($a.getUTF8String($i).getBytes());
         |    long $h = 0L;
         |    for (int $b = 8; $b < 16; $b++) { $h = ($h << 8) | ($d[$b] & 0xffL); }
         |    $h = ($h & ((1L << 60) - 1)) % ${P}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $c = $params[$j];
         |      long $v = ($h * ($c >>> 31) + ($c & ((1L << 31) - 1))) % ${P}L;
         |      if ($v < $acc[$j]) $acc[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHash16 {
  /** 2³¹−1 (Mersenne prime) — the classic MinHash modulus: affine maps
    * `h ↦ (a·h + b) mod p` over Z_p are pairwise-independent permutations,
    * and `h < p`, `a < p` keeps `a·h < 2⁶²` overflow-free in long math.
    */
  val Prime = 2147483647L
}
