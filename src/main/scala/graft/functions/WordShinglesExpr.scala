package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles over a token array, in one tight loop.
  *
  * The composable form (`transform(sequence(1, count), i ->
  * array_join(slice(toks, i, n), " "))`, optionally `array_distinct`)
  * is semantically identical but interpreted: every shingle pays a
  * lambda dispatch, a `slice` allocation, and an `array_join` walk, and
  * the higher-order functions drop the whole projection out of
  * whole-stage codegen. Shingling is the front door of every dedup
  * operator (MinHash, LSH banding, Jaccard, fingerprints), so at 100 TB
  * this is a first-order cost: the fused loop is ~4× faster on the
  * sf0.1 documents table and keeps the stage codegen'd.
  *
  * Semantics (bitwise identical to the composable form and the DuckDB
  * oracle's list_transform/list_distinct mirror):
  *  - empty token array → empty shingle array;
  *  - shorter-than-n documents shingle to the whole document;
  *  - shingle i = tokens[i..i+n) joined with a single space;
  *  - `distinct = true` keeps first occurrences in order
  *    (array_distinct / list_distinct behavior).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code (the classic
    * static-helper codegen pattern: one call per row, no fallback). */
  def compute(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val sz = toks.numElements()
    if (sz == 0) return new GenericArrayData(Array.empty[Any])
    val count = math.max(sz - (n - 1), 1)
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
      var i = 0
      while (i < count) { seen.add(shingleAt(toks, i, n, sz)); i += 1 }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    } else {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) { out(i) = shingleAt(toks, i, n, sz); i += 1 }
      new GenericArrayData(out)
    }
  }

  // concatWs both skips nulls and copies bytes, so the result is safe to
  // retain across rows even over an UnsafeArrayData-backed input
  private def shingleAt(toks: ArrayData, i: Int, n: Int, sz: Int): UTF8String = {
    val end = math.min(i + n, sz)
    val parts = new Array[UTF8String](end - i)
    var j = i
    while (j < end) { parts(j - i) = toks.getUTF8String(j); j += 1 }
    UTF8String.concatWs(Space, parts: _*)
  }
}
