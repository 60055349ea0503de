package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Hashed bag-of-words embedding of a token array → raw (unnormalized)
  * double[dim] vector, as ONE codegen'd map-side expression.
  *
  * Semantics are pinned to the md5 arithmetic of TextFunctions (and the
  * DuckDB oracle mirror):
  *  - bucket(token) = (first md5 byte) mod dim   (md5Bucket — dim ≤ 256)
  *  - sign(token)   = +1 if the 3rd md5 hex digit is even, else −1
  *    (md5Sign: the 3rd hex digit is the high nibble of md5 byte 1)
  *  - vec[b] accumulates the ±1 signs; empty input → zero vector (the
  *    reference's blank-embed sentinel, app/embedding_gen.py:147-148).
  *
  * Sums of ±1 integers in double are exact and order-independent, so the
  * result is bitwise identical to both the per-row transform/aggregate
  * form and the explode → groupBy → map-assemble form — but this is a
  * single O(tokens + dim) loop with NO shuffle and no join-back: at
  * 100 TB, corpus embedding becomes a pure scan-side projection that
  * pipelines straight into the index write.
  */
case class HashedBow(child: Expression, dim: Int) extends UnaryExpression {

  require(dim >= 1 && dim <= 256, "HashedBow uses one md5 byte: dim in [1,256]")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "graft_hashed_bow"

  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hashed_bow requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashedBow.compute(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedBow$$.MODULE$$.compute($c, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedBow {
  // MessageDigest is not thread-safe; one per executor thread
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, dim: Int): ArrayData = {
    val vec = new Array[Double](dim)
    val digest = md5.get()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        digest.reset()
        val d = digest.digest(t.getBytes)
        // (d(0) & 0xFF) is non-negative, so % dim is already a pmod
        val b = (d(0) & 0xFF) % dim
        val highNibble = (d(1) & 0xF0) >>> 4
        vec(b) += (if (highNibble % 2 == 0) 1.0 else -1.0)
      }
      i += 1
    }
    ArrayData.toArrayData(vec)
  }
}
