package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Diacritic stripping for text normalization (the curation pass that
  * folds "café" → "cafe" before tokenizing/hashing): NFD-decompose,
  * drop combining marks, NFC-recompose. Base letters with no canonical
  * decomposition (ø, ﬁ, full-width forms) pass through untouched —
  * verified char-for-char against DuckDB/utf8proc `strip_accents` so
  * normalized text stays oracle-comparable across engines.
  *
  * Spark has no built-in for this (translate() needs an explicit char
  * map); a codegen'd expression keeps the pass inside whole-stage
  * codegen next to the lower/regexp stages it composes with. The
  * ASCII-only fast path skips the Normalizer entirely — on typical
  * English-heavy corpora most rows never allocate. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_strip_accents"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_strip_accents requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    StripAccents.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.StripAccents$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripAccents {
  /** Shared by interpreted eval and generated code. */
  def compute(input: UTF8String): UTF8String = {
    // fast path: pure-ASCII bytes have no decompositions or marks
    if (input.isFullAscii) return input
    val s = input.toString
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }
}
