package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, ShortType}

/** Codegen'd dot product over two array<float|double|byte|short|int> columns.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * semantically identical but interpreted: Spark's higher-order functions
  * fall out of whole-stage codegen and allocate a zipped intermediate
  * array per row. This expression generates a tight fused loop instead —
  * the difference is ~10× on cosine-scan hot paths (measured at sf0.1),
  * which at 100 TB is the difference between a CPU-bound scan and an
  * embarrassing one.
  *
  * Each side may independently be array<float> or array<double>
  * (optimization r18): parquet embeddings are float32, so the previous
  * array<double>-only contract forced a `cast(embedding as array<double>)`
  * — a fresh 8·d-byte array allocation — per dot, per ROW on scan paths
  * and per CANDIDATE PAIR inside similarity-join conditions (where one
  * row participates in |cell| pairs). Reading floats in place and
  * widening per ELEMENT is bitwise-identical arithmetic: float→double
  * widening is exact in IEEE 754, so `(double) a.getFloat(i)` equals the
  * element the cast-to-array<double> path produced, and the left-fold
  * accumulation is unchanged.
  *
  * The accumulation is a left fold in index order, so results are
  * BITWISE identical to the composable form (and to the DuckDB oracle's
  * list_sum mirror) — swapping implementations never changes results.
  *
  * Foldable (r18): with literal children (a driver-side query vector)
  * the expression constant-folds at plan time — e.g. the query-norm
  * half of `cosine(row_vec, lit(q))` becomes a literal instead of an
  * O(d) loop per row. ConstantFolding evaluates the same interpreted
  * left fold, so folded values are bitwise what per-row evaluation
  * produced.
  *
  * Null handling: a null array yields null (BinaryExpression default).
  * Mismatched lengths throw: every caller contracts fixed-dim
  * embeddings, and silently folding the common prefix would turn a
  * dimension bug (query embedded at a different dim than the index)
  * into plausible-but-wrong similarities.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def foldable: Boolean = children.forall(_.foldable)

  /** Per-element reader for each accepted element type. Every accepted
    * type widens to double EXACTLY in IEEE 754 (float, and any integer
    * up to 32 bits — int8 SQ codes included), so reading in place is
    * bitwise what the old cast-to-array<double> path produced. Long is
    * deliberately NOT accepted: long→double widening rounds past 2^53,
    * which would silently break the cross-engine bitwise contract. */
  private def elemReader(e: Expression): (ArrayData, Int) => Double = e.dataType match {
    case ArrayType(FloatType, _)   => (x, i) => x.getFloat(i).toDouble
    case ArrayType(ByteType, _)    => (x, i) => x.getByte(i).toDouble
    case ArrayType(ShortType, _)   => (x, i) => x.getShort(i).toDouble
    case ArrayType(IntegerType, _) => (x, i) => x.getInt(i).toDouble
    case _                         => (x, i) => x.getDouble(i)
  }

  private def elemJava(e: Expression, arr: String, i: String): String = e.dataType match {
    case ArrayType(FloatType, _)   => s"(double) $arr.getFloat($i)"
    case ArrayType(ByteType, _)    => s"(double) $arr.getByte($i)"
    case ArrayType(ShortType, _)   => s"(double) $arr.getShort($i)"
    case ArrayType(IntegerType, _) => s"(double) $arr.getInt($i)"
    case _                         => s"$arr.getDouble($i)"
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType | ByteType | ShortType | IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs array<float|double|byte|short|int> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = DotProduct.checkedLength(x.numElements(), y.numElements())
    val xr = elemReader(left)
    val yr = elemReader(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += xr(x, i) * yr(y, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // Java widens float/byte/short/int to double exactly in the multiplication
      val ax = elemJava(left, a, i)
      val bx = elemJava(right, b, i)
      s"""
         |int $n = graft.functions.DotProduct$$.MODULE$$.checkedLength(
         |  $a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $ax * $bx;
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Dimension guard shared by interpreted eval and generated code. */
  def checkedLength(a: Int, b: Int): Int = {
    if (a != b) throw new IllegalArgumentException(
      s"graft_dot: dimension mismatch ($a vs $b) — query and index must be embedded at the same dim")
    a
  }
}
