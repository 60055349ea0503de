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
    ext.injectFunction(GraftExtensions.cosineFunction)
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

  /** graft_cosine(a, b): the full cosine (0-norm guard included) built
    * as a resolved Catalyst tree over the codegen dot — the registry
    * builder must return resolved expressions (a Column round-trip would
    * leave UnresolvedFunction nodes the analyzer never visits). */
  val cosineFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "graft_cosine(a, b) takes exactly 2 arguments")
      import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Divide, EqualTo, Literal, Multiply, Or, Sqrt}
      val a = castDouble(children.head)
      val b = castDouble(children(1))
      val na = Sqrt(DotProduct(a, a))
      val nb = Sqrt(DotProduct(b, b))
      val zero = Literal(0.0)
      CaseWhen(
        Seq((Or(EqualTo(na, zero), EqualTo(nb, zero)), zero)),
        Some(Divide(DotProduct(a, b), Multiply(na, nb))))
    })

  /** Register on an existing session (useful when the session was built
    * without extensions — e.g. notebook / driver-provided sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(dotFunction, cosineFunction).foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "scala_udf")
    }
  }
}
