package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, MapType}

/** Assemble a dense double[dim] vector from a sparse (int bucket →
  * double value) map — the final step of the aggregate-shaped embedders.
  *
  * The composable form (`transform(sequence(0, dim-1), j ->
  * coalesce(element_at(m, j), 0.0))`) performs dim interpreted map
  * lookups per row; this expression is one allocation + one pass over
  * the map's entries (O(dim + nnz)), inside whole-stage codegen. Values
  * are identical — it is pure data movement.
  *
  * Out-of-range buckets are ignored; null map → zero vector (the
  * reference's blank-embed sentinel, app/embedding_gen.py:147-148).
  */
case class DenseFromMap(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_dense_from_map"

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(IntegerType, DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dense_from_map requires map<int,double>, got ${other.simpleString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = new Array[Double](dim)
    child.eval(input) match {
      case null => ()
      case m: MapData =>
        val keys = m.keyArray()
        val values = m.valueArray()
        var i = 0
        while (i < m.numElements()) {
          val k = keys.getInt(i)
          if (k >= 0 && k < dim && !values.isNullAt(i)) arr(k) = values.getDouble(i)
          i += 1
        }
    }
    ArrayData.toArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val arr = ctx.freshName("arr")
    val i = ctx.freshName("i")
    val k = ctx.freshName("k")
    val keys = ctx.freshName("keys")
    val values = ctx.freshName("values")
    ev.copy(
      code = code"""
        ${childGen.code}
        double[] $arr = new double[$dim];
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $keys = ${childGen.value}.keyArray();
          org.apache.spark.sql.catalyst.util.ArrayData $values = ${childGen.value}.valueArray();
          for (int $i = 0; $i < ${childGen.value}.numElements(); $i++) {
            int $k = $keys.getInt($i);
            if ($k >= 0 && $k < $dim && !$values.isNullAt($i)) $arr[$k] = $values.getDouble($i);
          }
        }
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($arr);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
