package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** TOP-`cellProbes` nearest-centroid assignment — the multi-probe form
  * of [[NearestCentroid]]/[[NearestCentroidHier]] that recovers the
  * cell-boundary blind spot of cell-confined pair stages (SemDeDup's
  * published recipe scores pairs within ONE coarse cell only; measured
  * on the real PMC corpus that confinement finds just 89/200 planted
  * cross-cell near-dup pairs — SCALE.md "Confined-pair recall" — and
  * the loss is entirely the cell boundary, not the hier routing or the
  * banding). Assigning the PROBE side of a pair join to its top-p
  * cells (FAISS's nprobe discipline, applied at the cell level) lets a
  * boundary-straddling pair meet in the runner-up cell.
  *
  * Returns array<int> of the top-`cellProbes` codebook indices in
  * probe order (sim DESC, index ASC — the oracle's window order), so
  * element 0 is EXACTLY the flat/hier primary assignment: cosine
  * semantics are [[NearestCentroid]]'s bit-for-bit (zero-norm → 0.0,
  * ascending-fold dots, lowest index on ties) and, when `superBook`
  * is non-empty, the candidate set is the probed supers' members —
  * identical routing to [[NearestCentroidHier]] (same driver-side
  * centroid→super precomputation rides in via `membersOf`). An empty
  * `superBook` scans the whole codebook (the flat path). A SQL oracle
  * replays every probe list with one windowed rank (rn <= p).
  *
  * Like its siblings this is one codegen'd map-side projection: zero
  * shuffle, zero join; per-row work is |S| + p_super·|C|/|S| (hier)
  * or |C| (flat) dots regardless of cellProbes — the top-p heap is
  * maintained in the same scan that the argmax already pays. */
case class NearestCells(child: Expression,
                        codebook: Array[Array[Double]],
                        superBook: Array[Array[Double]],
                        membersOf: Array[Array[Int]],
                        superProbes: Int,
                        cellProbes: Int,
                        probeMargin: Double = Double.PositiveInfinity)
    extends UnaryExpression {

  require(codebook.nonEmpty, "empty codebook")
  require(superBook.isEmpty || membersOf.length == superBook.length,
    "membersOf must have one member list per super-centroid")
  require(superProbes >= 1, "superProbes must be >= 1")
  require(cellProbes >= 1, "cellProbes must be >= 1")
  require(probeMargin >= 0.0, "probeMargin must be >= 0")

  @transient private lazy val cnorms: Array[Double] = NearestCentroid.norms(codebook)
  @transient private lazy val snorms: Array[Double] = NearestCentroid.norms(superBook)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_nearest_cells requires array<double>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    evalArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCells].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $self.evalArray($c);")
  }

  /** Entry point for generated code. */
  def evalArray(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val v = new Array[Double](n)
    var i = 0
    var vn = 0.0
    while (i < n) { v(i) = input.getDouble(i); vn += v(i) * v(i); i += 1 }
    val vnorm = math.sqrt(vn)
    def simTo(cent: Array[Double], cnorm: Double): Double = {
      if (cent.length != n) throw new IllegalArgumentException(
        s"graft_nearest_cells: dimension mismatch (${cent.length} vs $n)")
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * cent(j); j += 1 }
      if (vnorm == 0.0 || cnorm == 0.0) 0.0 else dot / (vnorm * cnorm)
    }
    // the top-p maintenance shared by both levels: insertion sort into
    // fixed arrays ordered (sim DESC, index ASC). Candidates may arrive
    // in any index order (hier member lists are per-super), so equal
    // sims compare indices explicitly.
    def insertTop(p: Int, topIdx: Array[Int], topSim: Array[Double],
                  filled0: Int, c: Int, sim: Double): Int = {
      var filled = filled0
      var pos = filled
      while (pos > 0 && (sim > topSim(pos - 1) ||
        (sim == topSim(pos - 1) && c < topIdx(pos - 1)))) pos -= 1
      if (pos < p) {
        val last = math.min(filled, p - 1)
        var t = last
        while (t > pos) { topIdx(t) = topIdx(t - 1); topSim(t) = topSim(t - 1); t -= 1 }
        topIdx(pos) = c; topSim(pos) = sim
        if (filled < p) filled += 1
      }
      filled
    }
    // candidate centroid scan: the whole codebook (flat), or the probed
    // supers' members (NearestCentroidHier's routing, identical
    // selection order at the super level)
    val p = math.min(cellProbes, codebook.length)
    val topIdx = new Array[Int](p)
    val topSim = new Array[Double](p)
    var filled = 0
    if (superBook.isEmpty) {
      var c = 0
      while (c < codebook.length) {
        filled = insertTop(p, topIdx, topSim, filled, c, simTo(codebook(c), cnorms(c)))
        c += 1
      }
    } else {
      val ps = math.min(superProbes, superBook.length)
      val sTopIdx = new Array[Int](ps)
      val sTopSim = new Array[Double](ps)
      var sFilled = 0
      var k = 0
      while (k < superBook.length) {
        sFilled = insertTop(ps, sTopIdx, sTopSim, sFilled, k, simTo(superBook(k), snorms(k)))
        k += 1
      }
      var pi = 0
      while (pi < sFilled) {
        val members = membersOf(sTopIdx(pi))
        var m = 0
        while (m < members.length) {
          val c = members(m)
          filled = insertTop(p, topIdx, topSim, filled, c, simTo(codebook(c), cnorms(c)))
          m += 1
        }
        pi += 1
      }
      require(filled > 0,
        "graft_nearest_cells: probed supers have no member centroids")
    }
    // the probe MARGIN: runner-up cells are emitted only while their
    // sim sits within `probeMargin` of the primary's. Unbounded top-p
    // probing is p×-bounded on the EXPLODED side but NOT on the pair
    // term when runner-up choices concentrate on hub cells (measured
    // on the real PMC corpus: unbounded p=2 cost 28× the confined
    // build); the margin confines probing to BOUNDARY vectors — the
    // only ones whose pairs the single-cell build can lose — which is
    // where both the recall and the cost live. Infinity = pure top-p;
    // 0.0 = primary only (plus exact ties).
    var keep = 1
    while (keep < filled && topSim(keep) >= topSim(0) - probeMargin) keep += 1
    new GenericArrayData(topIdx.take(keep).map(Int.box).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
