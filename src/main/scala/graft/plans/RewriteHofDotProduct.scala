package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Optimizer rule: rewrites the portable higher-order-function dot
  * product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) }}}
  *
  * into the codegen'd [[LongArrayDot]] expression (~100× less
  * per-element overhead, see LongArrayDot's doc). Users keep writing the
  * engine-neutral HOF form; sessions built with [[GraftExtensions]] get
  * the fast path automatically.
  *
  * Fires only when both arrays are `array<long>`, the zero is literal
  * 0L, both lambdas are a bare multiply/add of their own variables, and
  * the finish lambda is the identity. Null semantics need no guard:
  * LongArrayDot returns null exactly where the HOF form does — null
  * input array, length mismatch (zip_with null-pads → the fold nulls),
  * and null elements (the product nulls → the fold nulls) — so
  * `containsNull=true` arrays (every `transform` output) get the fast
  * path too.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isVarPair(a: Expression, b: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (a, b) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        (x.exprId == v1.exprId && y.exprId == v2.exprId) ||
        (x.exprId == v2.exprId && y.exprId == v1.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(mult: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(body: NamedLambdaVariable, Seq(fin: NamedLambdaVariable), _))
          if isLongArray(left) && isLongArray(right) &&
            isVarPair(mult.left, mult.right, x, y) &&
            isVarPair(add.left, add.right, acc, el) &&
            body.exprId == fin.exprId =>
        LongArrayDot(left, right)

      // double-precision twin: same shape, +0.0 zero, array<double> inputs.
      // The zero must be POSITIVE zero bit-exactly: Scala's pattern match
      // on 0.0 is numeric and would also accept -0.0, but DoubleArrayDot
      // seeds +0.0 — rewriting a -0.0 fold would flip the empty-array
      // result's sign bit.
      case ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(mult: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero: java.lang.Double, DoubleType),
            LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(body: NamedLambdaVariable, Seq(fin: NamedLambdaVariable), _))
          if java.lang.Double.doubleToRawLongBits(zero) == 0L &&
            isDoubleArray(left) && isDoubleArray(right) &&
            isVarPair(mult.left, mult.right, x, y) &&
            isVarPair(add.left, add.right, acc, el) &&
            body.exprId == fin.exprId =>
        DoubleArrayDot(left, right)
    }
}
