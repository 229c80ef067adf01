package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.HexToDec38
import graft.plans.{IntersectCountRewrite, NativeAsofJoin}

/** Session-extensions entry point: installs the engine's Catalyst
  * extensions without code changes in the consuming application —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * Injects the native as-of join planner strategy, the
  * [[graft.plans.IntersectCountRewrite]] optimizer rule (literal-set
  * overlap counts get the codegen'd probe kernel automatically), and the
  * codegen'd `hex_to_dec38` SQL function. (The programmatic registration
  * paths — `NativeAsofJoin.register` / `HexToDec38.register` — remain for
  * sessions built without extensions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => NativeAsofJoin.Strategy)
    ext.injectOptimizerRule(_ => IntersectCountRewrite)
    ext.injectFunction((
      new FunctionIdentifier("hex_to_dec38"),
      new ExpressionInfo(classOf[HexToDec38].getName, "hex_to_dec38"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HexToDec38.build(exprs)))
  }
}
