package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DecimalDotExpr, RollingHashExpr}

/** Engine extension point, wired via `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Registers the engine's native expressions into the session's function
  * registry so they resolve in both the Column API (`call_function`) and raw
  * SQL. This is the standard injection seam — custom optimizer rules and
  * planner strategies would be added here too (injectOptimizerRule /
  * injectPlannerStrategy) as the engine grows operators Catalyst can't
  * express.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("decimal_dot"),
      new ExpressionInfo(classOf[DecimalDotExpr].getName, "decimal_dot"),
      (children: Seq[Expression]) => DecimalDotExpr(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashExpr].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHashExpr(children.head, children(1))))
  }
}
