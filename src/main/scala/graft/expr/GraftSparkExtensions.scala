package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions injection point, so graft's native expressions
  * are available in any session built with
  * `spark.sql.extensions=graft.expr.GraftSparkExtensions` (or
  * `.withExtensions(new GraftSparkExtensions)`): the standard deployment
  * path for custom Catalyst functions on a shared cluster.
  * Per-session registration for an already-built session lives in
  * [[GraftFunctions.register]]; both paths share ONE builder table
  * ([[GraftFunctions.all]]), so the surfaces cannot drift.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { fn =>
      ext.injectFunction((
        new FunctionIdentifier(fn.name),
        new ExpressionInfo(fn.clazz.getName, fn.name),
        fn.build))
    }
}
