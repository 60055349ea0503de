package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

import graft.functions.DotProduct

/** LSH bucket-prune rewrite — the custom `Rule[LogicalPlan]` deferred in
  * SURVEY §4/§7.4: turn an exact top-k-by-cosine over an LSH-indexed table
  * into a bucket-pruned (approximate) scan.
  *
  * The reference answers k-NN through an OpenSearch HNSW index
  * (app/main.py:262-283) — the *planner* decides that a similarity query
  * hits the index rather than a full scan. This rule is the Catalyst
  * version of that decision: a query written as the exact form
  *
  * {{{ index.orderBy(desc(cosine(vec, lit(q)))).limit(k) }}}
  *
  * over a table whose `lsh_bucket` column carries plane metadata
  * ([[graft.operators.Ann.withLshBucket]]) is rewritten to
  *
  * {{{ index.filter(bucket IN probe_buckets).orderBy(...).limit(k) }}}
  *
  * On a `partitionBy(lsh_bucket)` store the injected predicate becomes
  * partition pruning, so a 100 TB index answers the query by opening
  * ~1/2^bits of its files. The re-rank inside the probed buckets stays
  * exact (same codegen'd cosine), so this is standard ANN semantics:
  * recall < 1 is possible, ranking of returned rows is exact.
  *
  * Safety: the rewrite CHANGES RESULTS (exact → approximate), so it is
  * **opt-in twice over** — it only fires when
  *  1. `spark.graft.ann.rewrite=true` (session conf, default false), and
  *  2. the scanned plan exposes a column whose metadata carries the LSH
  *     planes (only [[graft.operators.Ann.withLshBucket]] writes that).
  *
  * Multi-probe: `spark.graft.ann.rewrite.probes=n` (default 1) also scans
  * the n-1 neighboring buckets whose sign-bit margins are smallest —
  * standard multi-probe LSH, recovering recall without touching the
  * plane count.
  *
  * Wiring: injected both as a post-hoc resolution rule (fires before
  * column pruning can drop an unprojected bucket column) and as an
  * operator-optimization rule (covers re-optimized plans); both paths
  * are guarded by [[alreadyPruned]] + a tree tag so the rewrite is
  * idempotent — and even if both guards missed, the injected predicate
  * is itself idempotent (filtering twice = filtering once).
  */
object AnnBucketPrune extends Rule[LogicalPlan] {

  /** Attribute-metadata keys written by Ann.lshMetadata. */
  val PlanesKey = "graft.lsh.planes"
  val NumPlanesKey = "graft.lsh.nplanes"

  /** Session-conf switches. */
  val EnabledConf = "spark.graft.ann.rewrite"
  val ProbesConf = "spark.graft.ann.rewrite.probes"

  private val RewrittenTag = TreeNodeTag[Boolean]("graft.ann.bucketPruned")

  def lshMetadata(planes: Seq[Seq[Double]]): Metadata = {
    require(planes.nonEmpty && planes.map(_.length).distinct.size == 1,
      "lshMetadata: planes must be non-empty and equal-length")
    new MetadataBuilder()
      .putDoubleArray(PlanesKey, planes.flatten.toArray)
      .putLong(NumPlanesKey, planes.length.toLong)
      .build()
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(EnabledConf, "false") != "true") return plan
    val probes = math.max(1, conf.getConfString(ProbesConf, "1").toInt)
    plan.transformDown {
      case gl: GlobalLimit if gl.getTagValue(RewrittenTag).isEmpty =>
        (gl.child match {
          case ll: LocalLimit => ll.child match {
            case s: Sort if s.global && s.order.nonEmpty &&
                s.order.head.direction == Descending =>
              tryRewrite(gl, ll, s, probes)
            case _ => None
          }
          case _ => None
        }).getOrElse(gl)
    }
  }

  private def tryRewrite(gl: GlobalLimit, ll: LocalLimit, sort: Sort,
                         probes: Int): Option[LogicalPlan] = {
    val child = sort.child
    // exactly one bucket column may carry plane metadata, else ambiguous
    val bucketAttrs = child.output.filter(_.metadata.contains(PlanesKey))
    if (bucketAttrs.length != 1) return None
    val bucketAttr = bucketAttrs.head
    val planes = readPlanes(bucketAttr.metadata)
    if (planes.isEmpty) return None

    val sortKey = resolveExpr(sort.order.head.child, child)
    val qVec = queryVector(sortKey).getOrElse(return None)
    if (planes.head.length != qVec.length) return None

    val bucketDef = resolveExpr(bucketAttr, child)
    if (alreadyPruned(child, bucketAttr, bucketDef)) return None

    val buckets = probeBuckets(planes, qVec, probes)
    val cond = In(bucketAttr, buckets.map(b => bucketLiteral(b, bucketAttr.dataType)))
    val out = GlobalLimit(gl.limitExpr,
      LocalLimit(ll.limitExpr, sort.copy(child = Filter(cond, child))))
    out.setTagValue(RewrittenTag, true)
    Some(out)
  }

  /** Chase an attribute through Project aliases to its defining
    * expression (exprIds are unique, so the first hit is the definition). */
  private def resolveExpr(e: Expression, plan: LogicalPlan): Expression = e match {
    case a: Attribute =>
      val defn = plan.collect { case p: Project => p.projectList }.flatten
        .collectFirst { case al: Alias if al.exprId == a.exprId => al.child }
      defn.map(resolveExpr(_, plan)).getOrElse(a)
    case other => other
  }

  /** The query vector is the foldable side of the one scoring
    * `DotProduct(vec, literal)` in the sort key. Norm terms are excluded
    * structurally: dot(v, v) has no foldable side, dot(q, q) has two. */
  private def queryVector(sortKey: Expression): Option[Array[Double]] = {
    val lits = sortKey.collect {
      case DotProduct(l, r) if l.foldable && !r.foldable => l
      case DotProduct(l, r) if r.foldable && !l.foldable => r
    }.flatMap(evalArray).map(_.toSeq).distinct
    if (lits.length == 1) Some(lits.head.toArray) else None
  }

  /** Literal in the bucket column's own type: in-memory buckets are
    * long, but a partitionBy(bucket) read infers int from the directory
    * names — and partition pruning needs a bare predicate on the
    * partition attribute, so the literal adapts rather than a Cast
    * wrapping the column. */
  private def bucketLiteral(b: Long, dt: org.apache.spark.sql.types.DataType): Expression =
    dt match {
      case org.apache.spark.sql.types.LongType    => Literal(b)
      case org.apache.spark.sql.types.IntegerType => Literal(b.toInt)
      case org.apache.spark.sql.types.ShortType   => Literal(b.toShort)
      case other => Cast(Literal(b), other)
    }

  private def evalArray(e: Expression): Option[Array[Double]] =
    try e.eval() match {
      case a: ArrayData => Some(a.toDoubleArray())
      case _ => None
    } catch { case _: Exception => None }

  private def readPlanes(m: Metadata): Seq[Array[Double]] = {
    if (!m.contains(PlanesKey) || !m.contains(NumPlanesKey)) return Seq.empty
    val flat = m.getDoubleArray(PlanesKey)
    val n = m.getLong(NumPlanesKey).toInt
    if (n <= 0 || flat.length % n != 0) Seq.empty
    else flat.grouped(flat.length / n).toSeq
  }

  /** Rewrite guard: is there already a bucket predicate below us? Checked
    * against BOTH the attribute and its defining expression — predicate
    * pushdown substitutes the alias, and OptimizeIn may have turned our
    * In into EqualTo (1 value) or InSet (many). */
  private def alreadyPruned(plan: LogicalPlan, attr: Attribute,
                            defn: Expression): Boolean = {
    def hits(v: Expression): Boolean =
      v.semanticEquals(attr) || v.semanticEquals(defn)
    plan.exists {
      case Filter(cond, _) => cond.exists {
        case In(v, _) => hits(v)
        case InSet(v, _) => hits(v)
        case EqualTo(l, r) => hits(l) || hits(r)
        case _ => false
      }
      case _ => false
    }
  }

  /** Same arithmetic as Ann.lshCandidates' query-side fold: per-plane
    * left-fold dot in index order, bit i set iff dot > 0. */
  private def margin(p: Array[Double], q: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < p.length) { s += p(i) * q(i); i += 1 }
    s
  }

  private[graft] def bucketOf(planes: Seq[Array[Double]], q: Array[Double]): Long =
    planes.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      acc + (if (margin(p, q) > 0) math.pow(2, i).toLong else 0L)
    }

  /** Exact bucket first, then flip sign bits in ascending |margin| order
    * (the planes the query is closest to — where true neighbors most
    * likely landed on the other side). */
  private[graft] def probeBuckets(planes: Seq[Array[Double]], q: Array[Double],
                                  probes: Int): Seq[Long] = {
    val base = bucketOf(planes, q)
    val flips = planes.indices
      .sortBy(i => (math.abs(margin(planes(i), q)), i))
      .map(i => base ^ (1L << i))
    (base +: flips).take(probes)
  }
}
