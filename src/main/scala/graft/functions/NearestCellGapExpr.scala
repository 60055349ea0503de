package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The ARGMAX GAP of the cell assignment: cosine(primary cell) −
  * cosine(runner-up cell), the per-row number that says how close a
  * vector sits to a coarse-cell boundary. [[NearestCells]]' probeMargin
  * is exactly a threshold on this gap (a runner-up is emitted iff
  * gap <= margin), so the DISTRIBUTION of gaps is what lets a caller
  * derive a margin from a target boundary fraction instead of guessing
  * an absolute number ([[graft.operators.SemanticDedup.deriveProbeMargin]]
  * — one quantile over this column = "probe the boundary decile").
  *
  * Same scan as the assignment family: identical cosine semantics to
  * [[NearestCentroid]] (zero-norm → 0.0, ascending-fold dots, lowest
  * index on ties), identical hier routing to [[NearestCentroidHier]]
  * when `superBook` is non-empty (the top-2 is taken over the probed
  * supers' members — the same candidate set the multi-probe assignment
  * would search). One codegen'd map-side projection: zero shuffle,
  * zero join, |C| (flat) or |S| + p·|C|/|S| (hier) dots per row. A SQL
  * oracle replays the gap with two windowed argmaxes (rn=1 sim minus
  * rn=2 sim). A single-candidate scan (|C| = 1, or a lone-member
  * probed super) has no runner-up: the gap is +Infinity (such a vector
  * is never a boundary vector). */
case class NearestCellGap(child: Expression,
                          codebook: Array[Array[Double]],
                          superBook: Array[Array[Double]],
                          membersOf: Array[Array[Int]],
                          superProbes: Int)
    extends UnaryExpression {

  require(codebook.nonEmpty, "empty codebook")
  require(superBook.isEmpty || membersOf.length == superBook.length,
    "membersOf must have one member list per super-centroid")
  require(superProbes >= 1, "superProbes must be >= 1")

  @transient private lazy val cnorms: Array[Double] = NearestCentroid.norms(codebook)
  @transient private lazy val snorms: Array[Double] = NearestCentroid.norms(superBook)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_nearest_cell_gap"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cell_gap requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    evalGap(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCellGap", this,
      classOf[NearestCellGap].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.evalGap($c);")
  }

  /** Entry point for generated code. */
  def evalGap(input: ArrayData): Double = {
    val n = input.numElements()
    val v = new Array[Double](n)
    var i = 0
    var vn = 0.0
    while (i < n) { v(i) = input.getDouble(i); vn += v(i) * v(i); i += 1 }
    val vnorm = math.sqrt(vn)
    def simTo(cent: Array[Double], cnorm: Double): Double = {
      if (cent.length != n) throw new IllegalArgumentException(
        s"graft_nearest_cell_gap: dimension mismatch (${cent.length} vs $n)")
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * cent(j); j += 1 }
      if (vnorm == 0.0 || cnorm == 0.0) 0.0 else dot / (vnorm * cnorm)
    }
    // top-2 over the same candidate set NearestCells scans; ties break
    // to the lower index at BOTH ranks (the shared insertion order), so
    // two equal-sim centroids yield gap 0.0 — an exact tie IS a
    // boundary vector
    var best = Double.NegativeInfinity
    var bestIdx = Int.MaxValue
    var second = Double.NegativeInfinity
    var seen = 0
    def offer(c: Int, sim: Double): Unit = {
      seen += 1
      if (sim > best || (sim == best && c < bestIdx)) {
        if (seen > 1) second = best
        best = sim; bestIdx = c
      } else if (sim > second) second = sim
    }
    if (superBook.isEmpty) {
      var c = 0
      while (c < codebook.length) { offer(c, simTo(codebook(c), cnorms(c))); c += 1 }
    } else {
      val ps = math.min(superProbes, superBook.length)
      val sTopIdx = new Array[Int](ps)
      val sTopSim = new Array[Double](ps)
      var sFilled = 0
      var k = 0
      while (k < superBook.length) {
        val sim = simTo(superBook(k), snorms(k))
        var pos = sFilled
        while (pos > 0 && (sim > sTopSim(pos - 1) ||
          (sim == sTopSim(pos - 1) && k < sTopIdx(pos - 1)))) pos -= 1
        if (pos < ps) {
          val last = math.min(sFilled, ps - 1)
          var t = last
          while (t > pos) { sTopIdx(t) = sTopIdx(t - 1); sTopSim(t) = sTopSim(t - 1); t -= 1 }
          sTopIdx(pos) = k; sTopSim(pos) = sim
          if (sFilled < ps) sFilled += 1
        }
        k += 1
      }
      var pi = 0
      while (pi < sFilled) {
        val members = membersOf(sTopIdx(pi))
        var m = 0
        while (m < members.length) {
          val c = members(m)
          offer(c, simTo(codebook(c), cnorms(c)))
          m += 1
        }
        pi += 1
      }
      require(seen > 0,
        "graft_nearest_cell_gap: probed supers have no member centroids")
    }
    if (seen < 2) Double.PositiveInfinity else best - second
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
