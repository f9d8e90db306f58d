package graft.plans

import org.apache.spark.sql.DoubleArrayInputTypes
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd double-array dot product — the production-precision twin of
  * [[LongArrayDot]] (`array<double> × array<double> → double`, with
  * `array<float>`/`array<int>` cast up at analysis). Null contract is
  * identical to the HOF spelling `aggregate(zip_with(a,b,*), 0D, +)`:
  * null array, length mismatch, or any null element → null.
  *
  * Deliberately a structural twin of [[LongArrayDot]] rather than an
  * abstraction over element type — primitive specialization inside
  * `doGenCode` resists a shared base without reflection; the lockstep
  * contract is enforced by ExpressionPropertySpec's differential tests
  * over both.
  *
  * Summation order is the array order (left fold), same as the HOF form
  * — deterministic for a fixed input, which is what the similarity
  * surfaces need; it is NOT the oracle-checked path (cross-engine
  * float-sum parity needs the quantized-integer route).
  */
case class DoubleArrayDot(left: Expression, right: Expression)
    extends BinaryExpression with DoubleArrayInputTypes {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      null
    } else {
      var s = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
