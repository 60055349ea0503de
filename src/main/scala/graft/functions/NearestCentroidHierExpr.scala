package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** TWO-LEVEL nearest-centroid assignment — the coarse-quantizer form of
  * [[NearestCentroid]] that survives √N codebooks at 100 TB.
  *
  * Flat assignment scores every row against every centroid: with the
  * production discipline |C| = ⌊√N⌋ that is N^1.5 dot products
  * corpus-wide (3·10^13 at N = 10^9), and it becomes the build's
  * asymptotic bottleneck once the in-cell stages are already √N-sized.
  * The standard fix (FAISS's coarse quantizer, HNSW's upper layers) is
  * hierarchical routing: score the row against |S| ≈ ⌊√|C|⌋
  * SUPER-centroids first, then only against the centroids whose nearest
  * super is that one — N·(|S| + |C|/|S|) ≈ 2·N^1.25 work, a ~√|C|/2×
  * reduction that grows with the corpus.
  *
  * The assignment is APPROXIMATE by design (a row whose true nearest
  * centroid lives under a different super routes to its in-super best;
  * same trade as IVF's nprobe=1), but fully DETERMINISTIC: cosine
  * semantics are [[NearestCentroid]]'s exactly (zero-norm → 0.0,
  * ascending-fold dots, strict-> keeps the lowest index on ties) at
  * both levels, and the centroid→super routing is precomputed once on
  * the driver with the same arithmetic — so a SQL oracle replays every
  * assignment bit-for-bit with two windowed argmaxes.
  *
  * Like [[NearestCentroid]] this is one codegen'd map-side projection:
  * codebook, super book, and the per-super member index ride along as
  * a deserialized reference object; zero shuffle, zero join.
  */
case class NearestCentroidHier(child: Expression,
                               codebook: Array[Array[Double]],
                               superBook: Array[Array[Double]],
                               membersOf: Array[Array[Int]],
                               superProbes: Int = 1)
    extends UnaryExpression {

  require(codebook.nonEmpty && superBook.nonEmpty, "empty codebook")
  require(membersOf.length == superBook.length,
    "membersOf must have one member list per super-centroid")
  require(superProbes >= 1, "superProbes must be >= 1")

  @transient private lazy val cnorms: Array[Double] = NearestCentroid.norms(codebook)
  @transient private lazy val snorms: Array[Double] = NearestCentroid.norms(superBook)

  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("sim", DoubleType, nullable = false)))

  override def prettyName: String = "graft_nearest_centroid_hier"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_centroid_hier requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    evalRow(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCentroidHier", this,
      classOf[NearestCentroidHier].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (InternalRow) $self.evalRow($c);")
  }

  /** Entry point for generated code. */
  def evalRow(input: ArrayData): InternalRow = {
    val n = input.numElements()
    val v = new Array[Double](n)
    var i = 0
    var vn = 0.0
    while (i < n) { v(i) = input.getDouble(i); vn += v(i) * v(i); i += 1 }
    val vnorm = math.sqrt(vn)
    def simTo(cent: Array[Double], cnorm: Double): Double = {
      if (cent.length != n) throw new IllegalArgumentException(
        s"graft_nearest_centroid_hier: dimension mismatch (${cent.length} vs $n)")
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * cent(j); j += 1 }
      if (vnorm == 0.0 || cnorm == 0.0) 0.0 else dot / (vnorm * cnorm)
    }
    // level 1: the top-`superProbes` supers (FAISS's nprobe — probing
    // one super is the cheapest route but loses the rows whose true
    // centroid hides under the runner-up super; measured on the real
    // PMC corpus nprobe=1 costs graph recall, nprobe=2 restores it).
    // Selection order: sim DESC, index ASC — the oracle's window order.
    val p = math.min(superProbes, superBook.length)
    val topIdx = new Array[Int](p)
    val topSim = new Array[Double](p)
    var filled = 0
    var k = 0
    while (k < superBook.length) {
      val sim = simTo(superBook(k), snorms(k))
      // insertion position among the current top-p (strict >: equal
      // sims keep the earlier = lower index first)
      var pos = filled
      while (pos > 0 && sim > topSim(pos - 1)) pos -= 1
      if (pos < p) {
        val last = math.min(filled, p - 1)
        var t = last
        while (t > pos) { topIdx(t) = topIdx(t - 1); topSim(t) = topSim(t - 1); t -= 1 }
        topIdx(pos) = k; topSim(pos) = sim
        if (filled < p) filled += 1
      }
      k += 1
    }
    // level 2: exact argmax within the probed supers' members, with
    // the GLOBAL lowest-index tie-break made explicit (member lists of
    // different supers are not globally ordered relative to each other)
    var bestIdx = -1
    var bestSim = Double.NegativeInfinity
    var pi = 0
    while (pi < filled) {
      val members = membersOf(topIdx(pi))
      var m = 0
      while (m < members.length) {
        val c = members(m)
        val sim = simTo(codebook(c), cnorms(c))
        if (sim > bestSim || (sim == bestSim && c < bestIdx)) {
          bestSim = sim; bestIdx = c
        }
        m += 1
      }
      pi += 1
    }
    // every super is its own nearest super (sim 1.0), so a probed set
    // with zero members means duplicate supers swallowed each other's
    // members AND the row tied onto the empty one — guard loudly
    require(bestIdx >= 0,
      s"graft_nearest_centroid_hier: probed supers have no member centroids")
    new GenericInternalRow(Array[Any](bestIdx, bestSim))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
