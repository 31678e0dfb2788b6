package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registration surface for the engine's native Catalyst expressions:
  * Column wrappers for the DataFrame API, a session-registry hook for
  * `spark.sql("... ewm_mean(x, 60.0) OVER (...) ...")`, and a
  * [[SparkSessionExtensions]] injector for
  * `.withExtensions(new GraftExtensions)`. */
object GraftFunctions {

  /** ewm_mean as a Column; use `.over(Window.partitionBy(...).orderBy(...))`.
    * Requires [[register]] (or GraftExtensions) on the session first — the
    * column routes through the function registry so Spark 4's unified
    * Column API treats it as a window function. */
  def ewm_mean(c: Column, halfLife: Double): Column =
    org.apache.spark.sql.functions.call_function("ewm_mean",
      c, org.apache.spark.sql.functions.lit(halfLife))

  private val ewmBuilder: Seq[Expression] => Expression =
    exprs => EwmMeanExpr(exprs(0), exprs(1))

  /** Register SQL functions on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ewm_mean", ewmBuilder, "built-in")
}

/** Session extension: `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or config `spark.sql.extensions=graft.functions.
  * GraftExtensions`) makes the native functions available in every
  * session, including pure-SQL clients. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("ewm_mean"),
      new ExpressionInfo(classOf[EwmMeanExpr].getName, "ewm_mean"),
      exprs => EwmMeanExpr(exprs(0), exprs(1))))
  }
}
