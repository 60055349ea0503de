package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two array<float|double> columns.
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

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = DotProduct.checkedLength(x.numElements(), y.numElements())
    val xf = isFloat(left)
    val yf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      // Java widens float to double exactly in the multiplication
      val ax = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val bx = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
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
