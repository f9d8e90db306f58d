package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point registering graft's custom
  * expressions at session build time:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  *   // or spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * After which `SELECT graft_long_dot(a, b)` works from SQL text in any
  * session of that context. `GraftFunctions.register` remains the
  * runtime-registry alternative for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_long_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "graft_long_dot"),
      (exprs: Seq[Expression]) => GraftFunctions.build(exprs)))
    e.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60"),
      (exprs: Seq[Expression]) => GraftFunctions.buildSimHash(exprs)))
    e.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
