package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions for SQL use, so `spark.sql("SELECT graft_dot(a, b)")`
  * (and the cosine built on it) work from pure SQL sessions.
  *
  * Wire up with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)            // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotFunction)
  }
}

object GraftExtensions {

  private def castDouble(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_dot(a, b) takes exactly 2 arguments")
      DotProduct(castDouble(children.head), castDouble(children(1)))
    })

  /** Register on an existing session (useful when the session was built
    * without extensions — e.g. notebook / driver-provided sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (_, info, builder) = dotFunction
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", builder, "scala_udf")
    val _ = info // ExpressionInfo used only on the extensions path
  }
}
