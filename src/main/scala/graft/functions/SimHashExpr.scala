package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash over a token array in one loop — one md5 per token.
  *
  * Semantics pinned to the composable form (and the DuckDB oracle):
  * vote_j = Σ over tokens (2·bit_j − 1), where bit_j of a token reads
  * hex digit j/4 of its md5 with weight 2^(3 − j%4); simhash bit j is
  * set iff vote_j > 0. Duplicate tokens vote once per occurrence.
  *
  * The transform(sequence(bits))×aggregate(tokens) composable form
  * recomputes the token's md5 for EVERY bit — 16 digests per token at
  * 16 bits, all in interpreted higher-order lambdas. This loop hashes
  * each token once and reads its nibbles, inside whole-stage codegen.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 32, "bits in [1,32]")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash$$.MODULE$$.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code. */
  def compute(toks: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val digest = md5.get()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        digest.reset()
        val d = digest.digest(t.getBytes)
        var j = 0
        while (j < bits) {
          // hex digit j/4 of the md5: even positions are high nibbles
          val k = j / 4
          val nibble =
            if (k % 2 == 0) (d(k / 2) & 0xF0) >>> 4
            else d(k / 2) & 0x0F
          val bit = (nibble >>> (3 - j % 4)) & 1
          votes(j) += 2 * bit - 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}
