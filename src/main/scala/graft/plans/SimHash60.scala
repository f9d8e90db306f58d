package graft.plans

import org.apache.spark.sql.{Column, LongArraySingleInputType}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd 60-bit SimHash from an array of token hashes:
  * bit b of the result is set iff more tokens have bit b set than clear
  * (the classic sign-of-column-sum signature).
  *
  * Semantics match the higher-order-function spelling used by the
  * DuckDB oracle (`aggregate(sequence(59,0,-1), ...)` over per-token ±1
  * votes) on every NON-NULL input: a null token hash votes −1 on every
  * bit (the SQL CASE's ELSE branch). On a null ARRAY this expression
  * returns null where the HOF's CASE would swallow the inner null and
  * fold to 0 — a deliberate divergence (null in, null out), pinned in
  * ExpressionPropertySpec and unreachable from the registered queries
  * (`split` of non-null text is never null). The HOF form walks the token array
  * 60 times through interpreted lambdas (~O(60·T) closure calls per
  * document — measured ~5 s for 5 000 docs at sf0.1); this expression is
  * one compiled pass that counts all 60 bit positions per token
  * (~50 ms for the same input), which is what a 100 TB signature scan
  * needs.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with LongArraySingleInputType {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) cnt(b) += 1
          b += 1
        }
      }
      i += 1
    }
    var acc = 0L
    var b = 59
    while (b >= 0) {
      // vote sum = cnt - (n - cnt) > 0  ⟺  2·cnt > n; the doubling runs in
      // long arithmetic so a ≥2³⁰-element array can't wrap the int product
      acc = (acc << 1) + (if (2L * cnt(b) > n) 1L else 0L)
      b -= 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      // one counts buffer per operator instance, not per row (60 ints
      // per processed row would be pure GC churn in a 100 TB scan)
      val cnt = ctx.addMutableState("int[]", "simhashCnt",
        v => s"$v = new int[60];")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |java.util.Arrays.fill($cnt, 0);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $a.getLong($i);
         |    for (int $b = 0; $b < 60; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $cnt[$b]++;
         |    }
         |  }
         |}
         |long $acc = 0L;
         |for (int $b = 59; $b >= 0; $b--) {
         |  $acc = ($acc << 1) + ((2L * $cnt[$b] > $n) ? 1L : 0L);
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
