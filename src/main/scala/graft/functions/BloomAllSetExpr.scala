package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Codegen'd Bloom membership probe against a BROADCAST bit set: true
  * iff every position in the child array<int> is set.
  *
  * This is the production-sized form of
  * [[graft.operators.Sketch.bloomContamination]]'s filter: the literal
  * form inlines the bit array into the plan, which is fine at oracle
  * geometry (2^14 bits = 2 KiB of plan) but a 2^30-bit filter would be
  * serialized into EVERY task description, re-shipped per stage, and
  * blow the plan-size/RPC limits long before that. A
  * `SparkContext.broadcast` ships it once per executor over the torrent
  * protocol instead, and this expression carries only the broadcast
  * HANDLE in the plan — the generated code dereferences it once per
  * task into a plain long[], so the per-row loop is identical to
  * what the literal form's `forall`/`element_at` chain computes, minus
  * its per-row lambda dispatch.
  *
  * The bit set is WORD-PACKED: 64 bits per long, bit p at
  * `words(p >>> 6) >>> (p & 63) & 1`. A JVM boolean[] spends a full
  * byte per bit, so at the 2^30-bit size this overload exists for the
  * packed form is 128 MiB per executor where boolean[] would be 1 GiB
  * — an 8x cut in heap and broadcast bytes.
  *
  * Bit-for-bit contract: positions are produced by the same
  * [[graft.operators.Sketch.bloomPositions]] column (pmod'd into
  * [0, mBits)), so results are identical to the literal form — the
  * lookup medium changes, the bits don't (SketchSpec pins equality at
  * 2^20 bits).
  *
  * Null handling: a null position array yields null (UnaryExpression
  * default); positions themselves are never null by construction
  * (md5 of a non-null shingle).
  */
case class BloomAllSet(child: Expression, words: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_all_set"

  @transient private lazy val localWords: Array[Long] = words.value

  override def nullSafeEval(input: Any): Any = {
    val pos = input.asInstanceOf[ArrayData]
    val w = localWords
    val n = pos.numElements()
    var i = 0
    var all = true
    while (all && i < n) {
      val p = pos.getInt(i)
      all = (w(p >>> 6) >>> (p & 63) & 1L) != 0L
      i += 1
    }
    all
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle rides the references array; the word array is
    // dereferenced ONCE per task into mutable state, so the row loop
    // reads a local long[] — no per-row Broadcast.value() call
    val bcastRef = ctx.addReferenceObj("bloomBcast", words,
      "org.apache.spark.broadcast.Broadcast")
    val arr = ctx.addMutableState("long[]", "graftBloomWords",
      v => s"$v = (long[]) $bcastRef.value();")
    nullSafeCodeGen(ctx, ev, pos => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      s"""
         |boolean ${ev.value}_all = true;
         |int $n = $pos.numElements();
         |for (int $i = 0; ${ev.value}_all && $i < $n; $i++) {
         |  int $p = $pos.getInt($i);
         |  ${ev.value}_all = ($arr[$p >>> 6] >>> ($p & 63) & 1L) != 0L;
         |}
         |${ev.value} = ${ev.value}_all;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
