package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of tokens present in a fixed stopword list, as one codegen'd
  * hash-set membership loop. The composable form
  * (`size(filter(toks, t => array_contains(array(lits...), t)))`) walks
  * the literal array per token in an interpreted lambda — O(tokens ×
  * |words|) with boxing; this is O(tokens) against a prebuilt set, and
  * language-ID evaluates it once per language profile per row, so it
  * fronts the quality/langid scan of every document.
  */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  require(words.nonEmpty, "empty stopword list")

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] =
    StopwordHits.buildSet(words)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_stopword_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_stopword_hits requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    StopwordHits.count(input.asInstanceOf[ArrayData], wordSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("stopwordHits", this,
      classOf[StopwordHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.evalCount($c);")
  }

  /** Entry point for generated code. */
  def evalCount(input: ArrayData): Int = StopwordHits.count(input, wordSet)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StopwordHits {
  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def count(toks: ArrayData, wordSet: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null && wordSet.contains(t)) hits += 1
      i += 1
    }
    hits
  }
}
