package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions at session build time, so any session created with
  * `.withExtensions(new GraftExtensions)` — or with
  * `spark.sql.extensions=graft.expr.GraftExtensions` — gets `graft_dot`
  * without per-session registry calls. (The query surface also registers
  * defensively via [[VectorExpressions.register]] because the driver
  * harness builds plain sessions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot takes exactly 2 arguments")
        DotProduct(exprs.head, exprs(1))
      }))
  }
}
