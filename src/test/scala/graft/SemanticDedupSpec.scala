package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SemanticDedup

class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  // Two well-separated cells on the 2D unit circle: the x-axis family
  // and the y-axis family. Within-cell near-dups at ~cos 0.9995;
  // cross-cell vectors are orthogonal (cos 0).
  private def vecs = Seq(
    (10L, Seq(1.0, 0.0)),       // cell 0 exemplar
    (11L, Seq(0.999, 0.032)),   // near-dup of 10
    (12L, Seq(0.707, 0.707)),   // cell 0 or 1 boundary, distinct
    (20L, Seq(0.0, 1.0)),       // cell 1 exemplar
    (21L, Seq(0.04, 0.999)),    // near-dup of 20
    (22L, Seq(-0.6, 0.8))       // cell 1, distinct
  ).toDF("id", "vec")
  private def cents = Seq(
    (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))
  ).toDF("cid", "cvec")

  test("drops lower-sim copies within a cell, keeps exemplars") {
    val out = SemanticDedup.dedup(vecs, "id", "vec", cents, "cid", "cvec", tau = 0.98)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    assert(out(10L)._2 && out(10L)._3.isEmpty, "lowest id is kept")
    assert(!out(11L)._2 && out(11L)._3.contains(10L))
    assert(out(20L)._2)
    assert(!out(21L)._2 && out(21L)._3.contains(20L))
    assert(out(12L)._2 && out(22L)._2, "distinct vectors survive")
    assert(out.values.forall(v => v._1 == 0L || v._1 == 1L))
  }

  test("cell assignment confines the pairwise stage") {
    // 11 vs a y-axis twin: same direction as 10 but planted in cell 1
    // by construction is impossible (assignment is argmax) — instead
    // verify the join never scores cross-cell pairs: with tau = -1
    // every same-cell pair qualifies, so dup_of counts reveal the pair
    // universe. Cell 0 holds {10,11,12}: 11,12 dup_of 10. Cell 1 holds
    // {20,21,22}: 21,22 dup_of 20. Nothing points across cells.
    val out = SemanticDedup.dedup(vecs, "id", "vec", cents, "cid", "cvec", tau = -1.0)
      .filter(col("dup_of").isNotNull)
      .select("id", "dup_of").as[(Long, Long)].collect().toMap
    assert(out == Map(11L -> 10L, 12L -> 10L, 21L -> 20L, 22L -> 20L))
  }

  test("chain semantics: any-lower-id rule prunes per tau-PATH, dup_of may be dropped") {
    // a(1)–b(2)–c(3) at 0°, 25°, 50° on the unit circle, tau = cos(30°):
    // cos(a,b) = cos(b,c) = cos 25° ≥ tau, but cos(a,c) = cos 50° < tau.
    // The documented rule drops BOTH b and c (each has a lower-id
    // tau-neighbor, kept or not) and c's dup_of points at the DROPPED b —
    // where the paper's greedy exemplar scan would keep c.
    def onCircle(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val chain = Seq((1L, onCircle(0)), (2L, onCircle(25)), (3L, onCircle(50)))
      .toDF("id", "vec")
    val oneCell = Seq((0L, Seq(1.0, 0.0))).toDF("cid", "cvec")
    val out = SemanticDedup.dedup(chain, "id", "vec", oneCell, "cid", "cvec",
        tau = math.cos(math.toRadians(30)))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(out(1L) == (true, None))
    assert(out(2L) == (false, Some(1L)))
    assert(out(3L) == (false, Some(2L)), "c must be dropped with dup_of = the dropped b")
  }

  test("semantic contamination: paraphrase-close vectors flag, distant stay clean") {
    // bench = two orthogonal axes; corpus: an exact copy (sim 1), a
    // near-paraphrase of bench 0 (sim ≈ 0.9995 — would share no n-grams),
    // and a distant vector (sim ≈ 0.707 < tau)
    val bench = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("bid", "bvec")
    val corpus = Seq(
      (100L, Seq(1.0, 0.0)),      // verbatim leak of bench 0
      (101L, Seq(0.999, 0.032)),  // paraphrase-close to bench 0
      (102L, Seq(0.707, 0.707))   // equidistant, below tau
    ).toDF("id", "vec")
    val out = SemanticDedup.contamination(corpus, bench, "id", "vec",
        "bid", "bvec", tau = 0.95)
      .select("id", "n_bench_hits", "worst_bench_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(100L -> ((1L, 0L)), 101L -> ((1L, 0L))), s"got $out")

    // tie in sim breaks to the LOWEST bench id (the max_by (sim, -bid) key)
    val tied = SemanticDedup.contamination(
        Seq((200L, Seq(0.707106781186547, 0.707106781186547))).toDF("id", "vec"),
        bench, "id", "vec", "bid", "bvec", tau = 0.5)
      .select("n_bench_hits", "worst_bench_id").as[(Long, Long)].head()
    assert(tied == (2L, 0L))
  }

  test("pairs + clusters canonicalize per CLIQUE where dedup prunes per path") {
    def onCircle(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    // the chain fixture: a(1)-b(2)-c(3) with cos(a,b), cos(b,c) ≥ tau
    // but cos(a,c) < tau — one PATH, one component
    val chain = Seq((1L, onCircle(0)), (2L, onCircle(25)), (3L, onCircle(50)))
      .toDF("id", "vec")
    // single-cell codebook (as in the chain test above): at 2 cells the
    // 50° vector assigns to the y-cell and 2-3 would be cross-cell
    val oneCell = Seq((0L, Seq(1.0, 0.0))).toDF("cid", "cvec")
    val tau = math.cos(math.toRadians(30))
    val prs = SemanticDedup.pairs(chain, "id", "vec", oneCell, "cid", "cvec", tau)
      .as[(Long, Long)].collect().toSet
    assert(prs == Set((1L, 2L), (2L, 3L)), s"tau-edges: $prs")
    // clusters over the edges: ONE component, canonical = min id 1 —
    // the exact per-clique form the dedup scaladoc prescribes (dedup
    // itself also drops 3 via the path rule; both agree here, but the
    // cluster form additionally names ONE canonical for the whole chain)
    val cl = graft.operators.Dedup.clusters(prs.toSeq.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"components: $cl")
    // cross-cell tau-pairs never form: orthogonal exemplars share no cell
    val none = SemanticDedup.pairs(vecs, "id", "vec", cents, "cid", "cvec", tau = -1.0)
      .as[(Long, Long)].collect().toSet
    assert(none.forall { case (a, b) => (a < 20) == (b < 20) },
      s"cross-cell pair leaked: $none")
  }

  test("incremental probe: corpus wins, then lowest batch id, else new; no row vanishes") {
    val index = graft.operators.Ann.assignCells(vecs, "id", "vec", cents, "cid", "cvec")
      .select("id", "vec", "cell_id")
    def onCircle(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val batch = Seq(
      (100L, Seq(0.9995, 0.0316)),  // tau-close to corpus 10 AND 11 → dup_corpus of 10
      (101L, Seq(0.9994, 0.0347)),  // also corpus-close → dup_corpus (not dup_batch of 100)
      (200L, onCircle(165)),        // cell 1; nearest corpus vector is 22 at ~127° (cos 38° < tau) → new
      (201L, onCircle(164))         // tau-close ONLY to batch 200 (cos 1°) → dup_batch of 200
    ).toDF("id", "vec")
    val out = SemanticDedup.semanticIncrement(batch, "id", "vec",
        index, cents, "cid", "cvec", tau = 0.98)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(out.keySet == Set(100L, 101L, 200L, 201L), "every batch row reports")
    assert(out(100L) == (("dup_corpus", Some(10L))))
    assert(out(101L) == (("dup_corpus", Some(10L))), "corpus wins over batch neighbor 100")
    assert(out(200L) == (("new", None)))
    assert(out(201L) == (("dup_batch", Some(200L))))
  }

  test("incremental probe raises on an index built with a different codebook") {
    // cell id 7 exists in no centroid — a drifted codebook's assignment
    val alien = Seq((10L, Seq(1.0, 0.0), 7L)).toDF("id", "vec", "cell_id")
    val batch = Seq((100L, Seq(1.0, 0.0))).toDF("id", "vec")
    val e = intercept[Exception] {
      SemanticDedup.semanticIncrement(batch, "id", "vec",
        alien, cents, "cid", "cvec", tau = 0.9).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("different codebook")), s"got: $e")
  }

  test("curation + semantic tier nets out the planted paraphrases exactly") {
    val sf = "/root/testdata/sf0.001"
    // q_curation_semantic feeds 10 planted word-reversed paraphrases
    // (fresh fingerprints and shingles, original embeddings) through the
    // quality → exact → MinHash tiers; only the semantic tier can drop
    // them. If it misses ANY, n_docs/total_tokens exceed plain
    // q_curation's (reversal preserves token count and quality); if an
    // earlier tier swallowed the plant, the 3-SF oracle trace would
    // diverge instead. Equality = every planted row reached the vector
    // tier and died there.
    val base = SparkEntry.queries("q_curation")(spark, sf).collect().toSeq
    val sem = SparkEntry.queries("q_curation_semantic")(spark, sf).collect().toSeq
    assert(sem == base, s"semantic-tier curation diverged: $sem vs $base")
  }

  test("plan: equi-join on cell_id, no cartesian; assignment map-only") {
    val plan = SemanticDedup.dedup(vecs, "id", "vec", cents, "cid", "cvec", tau = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
  }

  // --- the production-shape knobs: two-level assignment + banded pairs ---

  // y-sign and x-sign planes: 2D stand-ins for the deterministic
  // data-row bands the SparkEntry queries use
  private val ySign = Seq(Seq(0.0, 1.0))
  private val xSign = Seq(Seq(1.0, 0.0))

  test("hier + banded: exact copies always caught (identical buckets), flat results preserved") {
    // exact copy of 10 planted at a higher id: identical vector →
    // identical two-level route AND identical sign bits in every band,
    // so confinement can never lose an exact-dup pair
    val withCopy = vecs.unionByName(Seq((110L, Seq(1.0, 0.0))).toDF("id", "vec"))
    val out = SemanticDedup.dedup(withCopy, "id", "vec", cents, "cid", "cvec",
        tau = 0.98, nSupers = 2, bands = Seq(ySign, xSign))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(out(110L) == ((false, Some(10L))), "exact copy survives confinement")
    // on this well-separated fixture the supers are the centroids
    // themselves (head-2), so the two-level argmax = flat and the
    // within-bucket near-dups (11→10: y-signs split! caught via x-band;
    // 21→20 x-signs agree) replay the flat verdicts
    assert(!out(11L)._1 && out(11L)._2.contains(10L))
    assert(!out(21L)._1 && out(21L)._2.contains(20L))
    assert(out(10L)._1 && out(20L)._1 && out(12L)._1 && out(22L)._1)
  }

  test("banded confinement: pair missed when EVERY band splits it, caught when ANY agrees") {
    // a and b straddle the y=0 plane at cosine ≈ 0.998 ≥ tau
    val straddle = Seq(
      (1L, Seq(0.999, 0.032)),
      (2L, Seq(0.999, -0.032))
    ).toDF("id", "vec")
    val oneCell = Seq((0L, Seq(1.0, 0.0))).toDF("cid", "cvec")
    // both bands on the y-sign: the pair disagrees in EVERY band → the
    // candidate never forms (the documented LSH loss, by construction)
    val missed = SemanticDedup.pairs(straddle, "id", "vec", oneCell, "cid", "cvec",
      tau = 0.99, bands = Seq(ySign, ySign)).collect()
    assert(missed.isEmpty, "a pair split by every band must not be scored")
    // second band on the x-sign: both x > 0 agree → OR-amplification
    // recovers the pair through band 1 alone
    val caught = SemanticDedup.pairs(straddle, "id", "vec", oneCell, "cid", "cvec",
        tau = 0.99, bands = Seq(ySign, xSign))
      .as[(Long, Long)].collect().toSet
    assert(caught == Set((1L, 2L)), s"OR over bands must recover the pair: $caught")
    // dedup agrees with pairs on the same confinement
    val ded = SemanticDedup.dedup(straddle, "id", "vec", oneCell, "cid", "cvec",
        tau = 0.99, bands = Seq(ySign, ySign))
      .filter(!col("is_kept")).count()
    assert(ded == 0L)
  }

  test("incremental probe at the production shape: statuses preserved under hier + bands") {
    val index = graft.operators.Ann.assignCellsHier(vecs, "id", "vec",
        cents, "cid", "cvec", nSupers = 2)
      .select("id", "vec", "cell_id")
    def onCircle(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    val batch = Seq(
      (100L, Seq(0.9995, 0.0316)),  // x-band agrees with corpus 10 → dup_corpus
      (101L, Seq(0.9994, 0.0347)),  // same → dup_corpus (corpus wins over batch 100)
      (200L, onCircle(165)),        // no tau-neighbor anywhere → new
      (201L, onCircle(164))         // y-band agrees with batch 200 → dup_batch
    ).toDF("id", "vec")
    val out = SemanticDedup.semanticIncrement(batch, "id", "vec",
        index, cents, "cid", "cvec", tau = 0.98,
        nSupers = 2, bands = Seq(ySign, xSign))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(out(100L) == (("dup_corpus", Some(10L))))
    assert(out(101L) == (("dup_corpus", Some(10L))))
    assert(out(200L) == (("new", None)))
    assert(out(201L) == (("dup_batch", Some(200L))))
  }

  test("degenerate knobs reproduce the flat build exactly: nSupers=|C|, one all-zero-plane band") {
    // the AnnSpec equivalence discipline applied here: with every
    // centroid its own super the two-level argmax IS the flat one, and
    // a single band whose plane dots are all zero puts every vector in
    // bucket 0 — banding becomes a no-op — so the full knobbed build
    // must equal the flat default row for row
    val zeroBand = Seq(Seq(0.0, 0.0))
    val flat = SemanticDedup.dedup(vecs, "id", "vec", cents, "cid", "cvec", tau = 0.98)
      .collect().map(_.toString).sorted.toSeq
    val knobbed = SemanticDedup.dedup(vecs, "id", "vec", cents, "cid", "cvec",
        tau = 0.98, nSupers = 2, bands = Seq(zeroBand))
      .collect().map(_.toString).sorted.toSeq
    assert(knobbed == flat, "degenerate hier+band must replay the flat verdicts")
    val flatPairs = SemanticDedup.pairs(vecs, "id", "vec", cents, "cid", "cvec", tau = -1.0)
      .as[(Long, Long)].collect().toSet
    val knobbedPairs = SemanticDedup.pairs(vecs, "id", "vec", cents, "cid", "cvec",
        tau = -1.0, nSupers = 2, bands = Seq(zeroBand))
      .as[(Long, Long)].collect().toSet
    assert(knobbedPairs == flatPairs)
  }

  test("plan: hier + banded build stays cartesian-free (per-band equi-joins)") {
    val plan = SemanticDedup.dedup(vecs, "id", "vec", cents, "cid", "cvec",
        tau = 0.9, nSupers = 2, bands = Seq(ySign, xSign))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
  }

  // --- multi-probe (cellProbes > 1): the cross-cell boundary recovery ---

  // a boundary-straddling near-dup: 44° assigns to the x-cell, 46° to
  // the y-cell, cosine = cos 2° ≈ 0.9994 — the published SemDeDup
  // confinement can never score this pair (measured on PMC: 111/200
  // planted near-dups lost to the boundary alone, SCALE.md)
  private def onCircle(deg: Double) =
    Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
  private def boundary = Seq(
    (1L, onCircle(44.0)), (2L, onCircle(46.0)),
    (10L, onCircle(0.0)), (20L, onCircle(90.0))
  ).toDF("id", "vec")

  test("cellProbes=2 recovers the boundary pair cellProbes=1 provably misses") {
    val tau = 0.999
    val p1 = SemanticDedup.pairs(boundary, "id", "vec", cents, "cid", "cvec", tau)
      .as[(Long, Long)].collect().toSet
    assert(p1.isEmpty, s"single-probe confinement must miss the straddling pair: $p1")
    val p2 = SemanticDedup.pairs(boundary, "id", "vec", cents, "cid", "cvec", tau,
        cellProbes = 2)
      .as[(Long, Long)].collect().toSet
    assert(p2 == Set((1L, 2L)), s"multi-probe must recover exactly the boundary pair: $p2")
    // dedup agrees: 2 drops with dup_of = 1 at p=2, survives at p=1
    val d1 = SemanticDedup.dedup(boundary, "id", "vec", cents, "cid", "cvec", tau)
      .filter(!col("is_kept")).count()
    assert(d1 == 0L)
    val d2 = SemanticDedup.dedup(boundary, "id", "vec", cents, "cid", "cvec", tau,
        cellProbes = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(d2(1L) == ((true, None)))
    assert(d2(2L) == ((false, Some(1L))), s"got $d2")
    assert(d2(10L)._1 && d2(20L)._1)
  }

  test("cellProbes=1 equals the default build; p=2 candidates are a superset, bounded by p x") {
    // degenerate equivalence: the p=1 call IS the default path
    val flat = SemanticDedup.dedup(vecs, "id", "vec", cents, "cid", "cvec", tau = 0.98)
      .collect().map(_.toString).sorted.toSeq
    val p1 = SemanticDedup.dedup(vecs, "id", "vec", cents, "cid", "cvec", tau = 0.98,
        cellProbes = 1)
      .collect().map(_.toString).sorted.toSeq
    assert(p1 == flat)
    // monotone recall: every p=1 pair survives at p=2 (tau = -1 makes
    // the pair universe visible)
    val u1 = SemanticDedup.pairs(vecs, "id", "vec", cents, "cid", "cvec", tau = -1.0)
      .as[(Long, Long)].collect().toSet
    val u2 = SemanticDedup.pairs(vecs, "id", "vec", cents, "cid", "cvec", tau = -1.0,
        cellProbes = 2)
      .as[(Long, Long)].collect().toSet
    assert(u1.subsetOf(u2), s"p=2 lost pairs p=1 found: ${u1 -- u2}")
    // the candidate bound: one side explodes to ≤ p rows/vector, the
    // other stays primary, so the distinct pair universe grows at most
    // p× the single-probe one (6 vecs over 2 cells: 6 same-cell pairs
    // at p=1; every cross-cell pair joins at p=2 → 15 = C(6,2) here,
    // within 2× of 6... pinned numerically)
    assert(u2.size <= 2 * u1.size + vecs.count(),
      s"candidate growth exceeded the p x bound: ${u1.size} -> ${u2.size}")
  }

  test("assignCellsMulti: head of cell_ids is the primary assignment, flat and hier alike") {
    val flat = graft.operators.Ann.assignCells(vecs, "id", "vec", cents, "cid", "cvec")
      .select("id", "cell_id").as[(Long, Long)].collect().toMap
    val multi = graft.operators.Ann.assignCellsMulti(vecs, "id", "vec",
        cents, "cid", "cvec", cellProbes = 2)
      .select(col("id"), col("cell_id"), col("cell_ids"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    multi.foreach { case (id, primary, probes) =>
      assert(primary == flat(id), s"primary drift for $id")
      assert(probes.head == primary, s"cell_ids head must be the primary for $id")
      assert(probes.length <= 2 && probes.distinct.length == probes.length,
        s"probe list malformed for $id: $probes")
    }
    val hier = graft.operators.Ann.assignCellsHier(vecs, "id", "vec",
        cents, "cid", "cvec", nSupers = 2)
      .select("id", "cell_id").as[(Long, Long)].collect().toMap
    val multiHier = graft.operators.Ann.assignCellsMulti(vecs, "id", "vec",
        cents, "cid", "cvec", cellProbes = 2, nSupers = 2)
      .select(col("id"), col("cell_ids"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    hier.foreach { case (id, primary) =>
      assert(multiHier(id).head == primary, s"hier primary drift for $id")
    }
  }

  test("deriveProbeMargin: the boundary-fraction quantile of the argmax gap, end to end") {
    def onCircle(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    // two straddlers at 44°/47° (tiny gaps), six well-inside vectors
    val angles = Seq(1L -> 2.0, 2L -> 5.0, 3L -> 10.0, 4L -> 80.0,
      5L -> 85.0, 6L -> 88.0, 7L -> 44.0, 8L -> 47.0)
    val vs = angles.map { case (id, d) => (id, onCircle(d)) }.toDF("id", "vec")
    // cell_gap must equal cos(to nearer axis) − cos(to farther axis),
    // computed with the expression's own cosine semantics
    val gaps = graft.operators.Ann.assignCellGaps(vs, "id", "vec",
        cents, "cid", "cvec")
      .select("id", "cell_gap").as[(Long, Double)].collect().toMap
    angles.foreach { case (id, d) =>
      val near = math.min(d, 90.0 - d)
      val far = math.max(d, 90.0 - d)
      val expected = math.cos(math.toRadians(near)) - math.cos(math.toRadians(far))
      assert(math.abs(gaps(id) - expected) < 1e-9,
        s"gap for id $id (angle $d): ${gaps(id)} vs $expected")
    }
    // frac 0.25 over 8 gaps interpolates between the two straddler-side
    // order statistics — large enough to admit BOTH straddlers, small
    // enough to exclude every well-inside vector
    val m = SemanticDedup.deriveProbeMargin(vs, "id", "vec", cents, "cid", "cvec",
      boundaryFrac = 0.25)
    val sorted = gaps.values.toSeq.sorted
    val pos = 0.25 * (sorted.length - 1)
    val expectedQ = sorted(pos.toInt) +
      (pos - pos.toInt) * (sorted(pos.toInt + 1) - sorted(pos.toInt))
    assert(math.abs(m - expectedQ) < 1e-9, s"derived margin $m vs $expectedQ")
    assert(gaps(7L) <= m && gaps(8L) <= m && gaps(3L) > m,
      "the derived margin must admit exactly the boundary vectors here")
    // end to end: the derived margin recovers the straddle pair a
    // guessed-too-tight margin misses
    val tau = 0.998 // cos(3°) = 0.99863 — only the 44°/47° pair crosses cells
    val withDerived = SemanticDedup.pairs(vs, "id", "vec", cents, "cid", "cvec",
        tau, cellProbes = 2, probeMargin = m)
      .as[(Long, Long)].collect().toSet
    assert(withDerived.contains((7L, 8L)),
      s"derived margin must recover the boundary pair: $withDerived")
    val tooTight = SemanticDedup.pairs(vs, "id", "vec", cents, "cid", "cvec",
        tau, cellProbes = 2, probeMargin = 1e-9)
      .as[(Long, Long)].collect().toSet
    assert(!tooTight.contains((7L, 8L)),
      "a margin below every gap must reproduce the confined build's miss")
    // the row-gated quantile switch: BELOW exactQuantileMaxRows the
    // derivation is the exact percentile (pinned above); ABOVE it (gate
    // forced to 0 rows) it auto-switches to percentile_approx — still a
    // usable margin that admits the straddlers (on 8 distinct gaps the
    // sketch is exact up to picking an observed value instead of
    // interpolating, so it lands on an adjacent order statistic)
    val mApprox = SemanticDedup.deriveProbeMargin(vs, "id", "vec", cents,
      "cid", "cvec", boundaryFrac = 0.25, exactQuantileMaxRows = 0L)
    assert(java.lang.Double.isFinite(mApprox) && mApprox > 0.0,
      s"approx-path margin must be finite and positive: $mApprox")
    assert(gaps(7L) <= mApprox && gaps(8L) <= mApprox,
      s"approx-path margin must still admit the straddlers: $mApprox")
    assert(mApprox <= sorted(3),
      s"approx-path margin must stay near the quartile, got $mApprox vs ${sorted.toList}")
  }

  test("probeCellCap bounds hub-cell probe inflow (the jaccardPairs maxDf pattern)") {
    def onCircle(deg: Double) = Seq(math.cos(math.toRadians(deg)), math.sin(math.toRadians(deg)))
    // 5 vectors per side, all near the boundary: each cell receives 5
    // runner-up probes at p=2 — both cells are "hubs" at cap < 5
    val vs = (Seq(35.0, 37.0, 39.0, 41.0, 43.0).zipWithIndex.map {
        case (d, i) => ((i + 1).toLong, onCircle(d)) } ++
      Seq(47.0, 49.0, 51.0, 53.0, 55.0).zipWithIndex.map {
        case (d, i) => ((i + 6).toLong, onCircle(d)) }).toDF("id", "vec")
    val tau = 0.9975 // cos(4°) = 0.99756: (43°,47°) is the one cross-cell pair
    val confined = SemanticDedup.pairs(vs, "id", "vec", cents, "cid", "cvec", tau)
      .as[(Long, Long)].collect().toSet
    assert(!confined.contains((5L, 10L)) && !confined.contains((5L, 6L)),
      s"fixture: the boundary pair must straddle cells: $confined")
    val uncapped = SemanticDedup.pairs(vs, "id", "vec", cents, "cid", "cvec", tau,
        cellProbes = 2)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.contains((5L, 6L)),
      s"p=2 must recover the 43°/47° boundary pair: $uncapped")
    // a cap ABOVE the inflow changes nothing
    val roomy = SemanticDedup.pairs(vs, "id", "vec", cents, "cid", "cvec", tau,
        cellProbes = 2, probeCellCap = 10)
      .as[(Long, Long)].collect().toSet
    assert(roomy == uncapped, "a non-binding cap must be a no-op")
    // a cap BELOW the inflow is a TRUE cap (r17): each hub cell keeps
    // its `cap` LOWEST-GAP runner-up probes — here the boundary-nearest
    // vectors (43° and 47° at rank 1 on their sides), so the boundary
    // pair SURVIVES a binding cap instead of recall falling
    // discontinuously to the confined baseline
    val capped = SemanticDedup.pairs(vs, "id", "vec", cents, "cid", "cvec", tau,
        cellProbes = 2, probeCellCap = 3)
      .as[(Long, Long)].collect().toSet
    assert(capped.contains((5L, 6L)),
      s"a binding cap must keep the lowest-gap probes (43°/47° rank first): $capped")
    assert(capped == uncapped,
      s"here every recovered pair rides a rank<=3 probe, so cap=3 == uncapped: $capped vs $uncapped")
    // cap = 0 drops every hub-bound runner-up — the confined build is
    // the floor the cap degrades to, never below
    val zeroCap = SemanticDedup.pairs(vs, "id", "vec", cents, "cid", "cvec", tau,
        cellProbes = 2, probeCellCap = 0)
      .as[(Long, Long)].collect().toSet
    assert(zeroCap == confined,
      s"cap=0 must equal the confined build: $zeroCap vs $confined")
  }

  test("assignCellsMulti: superVecs is inert at nSupers = 0 (matches the recipe canonicalization)") {
    // The `_recipe` sidecar folds superVecs to Nil when nSupers == 0,
    // asserting it affects no cell id — so the assignment itself must
    // honor that: a probe batch carrying a trained super book against a
    // flat store must assign EXACTLY like the flat multi-probe path
    // (probes included), not under multi-super routing. This book would
    // visibly change routing if honored: each axis-super owns one cell,
    // so honored superProbes=1 routing would shrink boundary vectors'
    // probe lists to a single cell.
    val book = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), col("cell_id"), col("cell_ids"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq.sortBy(_._1)
    val flat = snap(graft.operators.Ann.assignCellsMulti(vecs, "id", "vec",
      cents, "cid", "cvec", cellProbes = 2))
    val withBook = snap(graft.operators.Ann.assignCellsMulti(vecs, "id", "vec",
      cents, "cid", "cvec", cellProbes = 2, nSupers = 0, superVecs = book))
    assert(withBook == flat,
      s"superVecs must be inert at nSupers = 0:\n flat=$flat\n book=$withBook")
    // sanity: the same book DOES change probe breadth once hier routing
    // is actually enabled (nSupers > 0) — the fixture is not vacuous
    val routed = snap(graft.operators.Ann.assignCellsMulti(vecs, "id", "vec",
      cents, "cid", "cvec", cellProbes = 2, nSupers = 2, superVecs = book))
    assert(routed.exists { case (id, _, probes) =>
      probes.length < flat.find(_._1 == id).get._3.length
    }, "fixture must demonstrate the book restricts probes under real routing")
  }

  test("multi-probe composes with hier routing and bands; increment gains dup_corpus across the boundary") {
    val tau = 0.999
    // hier + p=2 with superProbes=1 CANNOT recover here: each super
    // owns exactly one cell in this fixture, so the routed candidate
    // set a vector can probe is a single cell — the probe breadth is
    // bounded by the probed supers' members (the documented coupling:
    // cellProbes recovers CELL boundaries within the routed set,
    // superProbes recovers SUPER boundaries)
    val routedOnly = SemanticDedup.pairs(boundary, "id", "vec", cents, "cid", "cvec",
        tau, nSupers = 2, bands = Seq(xSign), cellProbes = 2)
      .as[(Long, Long)].collect().toSet
    assert(routedOnly.isEmpty,
      s"single-super routing cannot see the second cell: $routedOnly")
    // widening the routing (superProbes=2) hands the probe join both
    // cells and the agreeing x-band keeps the pair — full recovery
    val composed = SemanticDedup.pairs(boundary, "id", "vec", cents, "cid", "cvec",
        tau, nSupers = 2, superProbes = 2, bands = Seq(xSign), cellProbes = 2)
      .as[(Long, Long)].collect().toSet
    assert(composed == Set((1L, 2L)), s"hier+band+probes must keep the recovery: $composed")
    // increment: corpus holds the 44° vector (stored in the x-cell);
    // the 46° batch row assigns to the y-cell — invisible at p=1,
    // dup_corpus at p=2; and a batch-internal straddle pair flags
    // dup_batch at p=2 only
    val corpus = Seq((1L, onCircle(44.0))).toDF("id", "vec")
    val index = graft.operators.Ann.assignCells(corpus, "id", "vec", cents, "cid", "cvec")
      .select("id", "vec", "cell_id")
    val batch = Seq(
      (100L, onCircle(46.0)),   // boundary twin of corpus 1
      (200L, onCircle(134.0)),  // y-cell; boundary twin of 201
      (201L, onCircle(136.0))   // assigns across the y axis? no — 136° still y-cell
    ).toDF("id", "vec")
    val st1 = SemanticDedup.semanticIncrement(batch, "id", "vec",
        index, cents, "cid", "cvec", tau)
      .select("id", "status").as[(Long, String)].collect().toMap
    assert(st1(100L) == "new", s"p=1 must miss the cross-cell corpus dup: $st1")
    val st2 = SemanticDedup.semanticIncrement(batch, "id", "vec",
        index, cents, "cid", "cvec", tau, cellProbes = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(st2(100L) == (("dup_corpus", Some(1L))), s"got $st2")
    assert(st2(200L) == (("new", None)))
    assert(st2(201L) == (("dup_batch", Some(200L))))
  }

  test("probeMargin trims probing to boundary vectors; wide keeps the pair, tight drops it") {
    // the boundary fixture's runner-up gap: vector at 44° scores
    // cos(44°) ≈ 0.719 on the x-centroid and cos(46°) ≈ 0.695 on the
    // y-centroid — a 0.025 gap. margin 0.05 emits the second probe
    // (pair recovered); margin 0.01 trims it (pair lost, cost saved);
    // margin 0.0 degenerates to the p=1 RESULTS (ties-only probing)
    val tau = 0.999
    val wide = SemanticDedup.pairs(boundary, "id", "vec", cents, "cid", "cvec", tau,
        cellProbes = 2, probeMargin = 0.05)
      .as[(Long, Long)].collect().toSet
    assert(wide == Set((1L, 2L)), s"margin 0.05 must keep the boundary pair: $wide")
    val tight = SemanticDedup.pairs(boundary, "id", "vec", cents, "cid", "cvec", tau,
        cellProbes = 2, probeMargin = 0.01)
      .as[(Long, Long)].collect().toSet
    assert(tight.isEmpty, s"margin 0.01 must trim the far probe: $tight")
    val zero = SemanticDedup.dedup(vecs, "id", "vec", cents, "cid", "cvec",
        tau = 0.98, cellProbes = 2, probeMargin = 0.0)
      .collect().map(_.toString).sorted.toSeq
    val p1 = SemanticDedup.dedup(vecs, "id", "vec", cents, "cid", "cvec", tau = 0.98)
      .collect().map(_.toString).sorted.toSeq
    assert(zero == p1, "margin 0 must reproduce the single-probe verdicts")
  }

  test("confined contamination: cell prefilter confines, probes recover the boundary hit") {
    // bench: one item per axis cell plus a boundary item at 44°
    // (assigns x-cell). Corpus: an in-cell leak of the x-item, a
    // boundary paraphrase at 46° (assigns y-cell, cosine cos 2° ≈
    // 0.9994 to the 44° bench item), and a clean row.
    val bench = Seq((0L, onCircle(0.0)), (1L, onCircle(90.0)), (2L, onCircle(44.0)))
      .toDF("bid", "bvec")
    val corpus = Seq(
      (100L, onCircle(1.0)),   // in-cell leak of bench 0
      (101L, onCircle(46.0)),  // boundary paraphrase of bench 2 — cross-cell
      (102L, onCircle(170.0))  // clean
    ).toDF("id", "vec")
    val tau = 0.999
    def flagged(p: Int): Map[Long, Long] =
      SemanticDedup.contaminationConfined(corpus, bench, "id", "vec",
          "bid", "bvec", cents, "cid", "cvec", tau, cellProbes = p)
        .select("id", "worst_bench_id").as[(Long, Long)].collect().toMap
    val p1 = flagged(1)
    assert(p1 == Map(100L -> 0L), s"single-cell confinement must miss the boundary hit: $p1")
    val p2 = flagged(2)
    assert(p2 == Map(100L -> 0L, 101L -> 2L),
      s"probes must recover the cross-cell bench hit: $p2")
    // the unconfined operator is the recall ceiling: confined(p=2)
    // equals it here, and every confined hit is an unconfined hit
    val full = SemanticDedup.contamination(corpus, bench, "id", "vec",
        "bid", "bvec", tau)
      .select("id", "worst_bench_id").as[(Long, Long)].collect().toMap
    assert(p2 == full, s"confined p=2 should reach the unconfined result here: $full")
    // per-doc stats are computed over the CONFINED candidate set and
    // agree with the unconfined ones when the sets coincide
    val statsConf = SemanticDedup.contaminationConfined(corpus, bench, "id", "vec",
        "bid", "bvec", cents, "cid", "cvec", tau, cellProbes = 2)
      .select("id", "n_bench_hits", "max_sim").as[(Long, Long, Double)].collect().toSet
    val statsFull = SemanticDedup.contamination(corpus, bench, "id", "vec",
        "bid", "bvec", tau)
      .select("id", "n_bench_hits", "max_sim").as[(Long, Long, Double)].collect().toSet
    assert(statsConf == statsFull)
  }

  test("plan: multi-probe build stays cartesian-free") {
    val plan = SemanticDedup.dedup(boundary, "id", "vec", cents, "cid", "cvec",
        tau = 0.99, cellProbes = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
  }
}
