package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Embed, Ingest, Sampling}

/** Executable shuffle budgets: the scale claims made in Scaladoc/SCALE.md
  * measured in actual bytes over the sf0.001 corpus. */
class ShuffleAuditSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "source", "text")

  private lazy val corpusTextBytes: Long = docs
    .agg(sum(length(col("text")))).head().getLong(0)

  test("chunk -> embed is shuffle-free end to end") {
    val pipeline = Embed.withEmbedding(
      Ingest.chunk(docs.select("doc_id", "text"), "text", 64)
        .select("doc_id", "chunk_idx", "chunk_text"),
      "chunk_text", "embedding")
    val s = ShuffleAudit.of(pipeline)
    assert(s.writeBytes == 0L && s.readBytes == 0L,
      s"map-only pipeline shuffled: $s")
  }

  test("hash sampling is shuffle-free") {
    val s = ShuffleAudit.of(Sampling.hashSample(docs, "doc_id", 0.25))
    assert(s.writeBytes == 0L, s"sampling shuffled: $s")
  }

  test("SQ8 quantize + top-k is shuffle-free (map + per-partition heap merge)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val s = ShuffleAudit.of(graft.operators.Sq.searchTopK(
      graft.operators.Sq.quantize(emb, "embedding"), "vec_id", qv, 10))
    assert(s.writeBytes == 0L && s.readBytes == 0L,
      s"SQ8 scan path shuffled: $s")
  }

  test("bigram scoring shuffle is linear in bigram rows (counts, never document text)") {
    import graft.functions.TextFunctions.tokens
    val s = ShuffleAudit.of(graft.operators.TextAnalysis.bigramLogprob(
      docs, "doc_id", "text", vocabSize = 32, bigramTop = 64))
    assert(s.writeBytes > 0, "expected the bigram hash-agg shuffles")
    // the shuffled unit is a (doc, w1, w2, count, lp) row — word PAIRS
    // outweigh the raw text per instance, so the honest budget is
    // per-row linear (measured ~41 B/row over three exchanges), never
    // document blobs and never a quadratic pair blow-up
    val nBigrams = docs
      .select((size(tokens(lower(col("text")))) - 1).as("n"))
      .agg(sum(when(col("n") > 0, col("n")).otherwise(0L))).head().getLong(0)
    assert(s.writeBytes < nBigrams * 80,
      s"bigram scoring shuffled ${s.writeBytes} bytes for $nBigrams bigram " +
        "instances — expected a linear per-row budget (< 80 B/instance)")
  }

  test("count-min grid shuffle is grid-bounded: 4x the input, same bytes") {
    import graft.functions.TextFunctions.tokens
    import graft.operators.Sketch
    val toks = docs.select(explode(tokens(lower(col("text")))).as("tok"))
    // Same partition count for both inputs: the 4x stream flows through
    // the SAME map tasks, so per-task partial aggregation caps each at
    // depth x width counters — the exchange must not grow with rows.
    // Materialize truncates lineage so the audit sees only the sketch's
    // own exchange, not the fixture repartitions.
    val base = graft.Materialize(toks.repartition(8))
    val x4 = graft.Materialize(base.union(base).union(base).union(base).repartition(8))
    val s1 = ShuffleAudit.of(Sketch.cmSketch(base, "tok", depth = 4, width = 256))
    val s4 = ShuffleAudit.of(Sketch.cmSketch(x4, "tok", depth = 4, width = 256))
    assert(s1.writeBytes > 0, "expected the grid hash-agg exchange")
    assert(s4.writeBytes <= (s1.writeBytes * 1.5).toLong,
      s"count-min shuffle grew with input rows: 1x=${s1.writeBytes} B, 4x=${s4.writeBytes} B")
  }

  test("kmv distinct sketch shuffles distinct hashes, never token instances") {
    import graft.functions.TextFunctions.tokens
    import graft.operators.Sketch
    val toks = docs.select(col("source"), explode(tokens(lower(col("text")))).as("tok"))
    val nInstances = toks.count()
    val nDistinct = toks.distinct().count()
    val s = ShuffleAudit.of(Sketch.kmvPerGroup(toks, "source", "tok", k = 64))
    assert(s.writeBytes > 0, "expected the distinct + window exchanges")
    // (source, 52-bit hash) rows through distinct partial-agg + the
    // per-source rank window: the budget rides the VOCABULARY (distinct
    // rows), not the corpus (instances) — ~3 exchanges x ~30 B/row.
    assert(nInstances > nDistinct * 2, "fixture must repeat tokens for the claim to bite")
    assert(s.writeBytes < nDistinct * 120,
      s"kmv shuffled ${s.writeBytes} B for $nDistinct distinct rows ($nInstances instances)")
  }

  test("bloom probe shuffles per-doc hit counts, never shingles or bench grams") {
    import graft.operators.Sketch
    val bench = docs.filter(col("doc_id") < 10)
    val bits = Sketch.bloomArray(
      Sketch.bloomBits(bench, "text", shingleN = 3, numHashes = 3, mBits = 16384), 16384)
    val s = ShuffleAudit.of(Sketch.bloomContamination(docs, "doc_id", "text", bits,
      shingleN = 3, numHashes = 3, minHits = 5))
    val nDocs = docs.count()
    // the only exchange is the per-doc count after map-side partial agg:
    // at most one (doc_id, cnt) row per doc per task.
    assert(s.writeBytes < nDocs * 100,
      s"bloom probe shuffled ${s.writeBytes} B for $nDocs docs — " +
        "expected per-doc counters only (the gram filter is map-side)")
  }

  test("LSH-confined edge build shuffles strictly fewer pair bytes than plain knnGraph") {
    import graft.operators.Ann
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val cents = Ann.headCentroids(emb, "vec_id", "embedding", 8)
    val assigned = Ann.assignCells(emb, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec")
    val planes = emb.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0)).toSeq
    val plain = ShuffleAudit.of(Ann.knnGraph(assigned, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec", m = 4))
    val confined = ShuffleAudit.of(Ann.knnGraphLsh(assigned, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec", m = 4, planes))
    // the pair stage dominates both builds' shuffles; (cell, bucket)
    // blocks are strictly finer than cells, so the confined build's
    // bytes must come in under the plain build's — this is the
    // measured form of the sum-of-blocks² < sum-of-cells² claim
    assert(confined.writeBytes < plain.writeBytes,
      s"LSH confinement did not cut the edge-stage shuffle: " +
        s"confined=$confined plain=$plain")
    // OR-amplified bands: recall recovered (AnnSpec), cost bounds kept.
    // Two distinct claims, because Spark 4's WindowGroupLimit already
    // keeps the quadratic pair set OFF the wire (partial top-m per
    // input partition before the exchange — the pair stage's shuffle
    // is ~partitions·m·|V| rows whatever the confinement):
    //  (a) COMPUTE: the candidate pairs actually generated (= cosine
    //      dots paid) across all bands stay strictly under the plain
    //      build's Σ|cell|² — the N^1.5-avoidance claim itself;
    //  (b) SHUFFLE: the R-band build writes less than R independent
    //      confined builds (shared structural stages, dense_rank dedup
    //      instead of a second triple exchange).
    val planesB = emb.filter(col("vec_id") >= 4 && col("vec_id") < 8).orderBy("vec_id")
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0)).toSeq
    val bands = Seq(planes.take(2), planesB.take(2))
    def pairCount(keyed: org.apache.spark.sql.DataFrame, extra: Seq[String]): Long =
      keyed.as("a").join(keyed.as("b"),
          ("cell_id" +: extra).map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _))
        .filter(col("a.vec_id") =!= col("b.vec_id")).count()
    val keyedBands = bands.zipWithIndex.foldLeft(assigned) { case (df, (p, r)) =>
      df.withColumn(s"_b$r", Ann.lshBucket(col("embedding"), p)) }
    val plainPairs = pairCount(assigned, Nil)
    val bandedPairs = bands.indices.map(r => pairCount(keyedBands, Seq(s"_b$r"))).sum
    assert(bandedPairs < plainPairs,
      s"banded candidate generation did not shrink: $bandedPairs vs $plainPairs")
    val banded = ShuffleAudit.of(Ann.knnGraphLshBanded(assigned, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec", m = 4, bands))
    // the bound is vs R independent CONFINED builds at the SAME band
    // geometry (one 2-plane band), not vs the unconfined plain build —
    // comparing against R×plain would be trivially weak and miss a
    // regression where banding shuffles more than R separate band runs
    val confinedOneBand = ShuffleAudit.of(Ann.knnGraphLsh(assigned, "vec_id",
      "embedding", cents, "centroid_id", "centroid_vec", m = 4, bands.head))
    assert(banded.writeBytes < bands.length * confinedOneBand.writeBytes,
      s"banded build shuffled more than ${bands.length} independent " +
        s"single-band confined builds: banded=$banded confined=$confinedOneBand")
  }

  test("exact dedup shuffles fingerprints, not text") {
    val s = ShuffleAudit.of(Dedup.exact(docs, "doc_id", "text"))
    assert(s.writeBytes > 0, "expected a hash-agg shuffle")
    // (fingerprint, id, count) rows: a small fraction of the corpus text
    assert(s.writeBytes < corpusTextBytes / 5,
      s"dedup shuffled ${s.writeBytes} bytes vs $corpusTextBytes corpus bytes")
  }

  test("quality-rule evaluation is shuffle-free") {
    val rules = graft.operators.QualityRules.gopherRules(col("text"))
    val s = ShuffleAudit.of(graft.operators.QualityRules.evaluate(docs, rules))
    assert(s.writeBytes == 0L, s"rule engine shuffled: $s")
  }

  test("gram profile shuffles distinct (gram, doc) rows, not instances") {
    import spark.implicits._
    // repetitive corpus: 20 docs, each one 5-gram repeated 200x -> 1000
    // words/doc, ~20k gram INSTANCES total but only ~5 distinct grams
    // per doc. Map-side combine must collapse the within-doc repeats
    // before the shuffle: records across every exchange stay orders of
    // magnitude under the instance count.
    val spam = (0 until 20).map(d =>
      (d.toLong, (s"spam$d one two three four " * 200).trim))
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedGramProfile(spam, "doc_id", "text", n = 5)
    val s = ShuffleAudit.of(out)
    val instances = 20L * (1000 - 4)
    assert(s.writeBytes > 0)
    assert(s.recordsRead < instances / 10,
      s"${s.recordsRead} shuffled records vs $instances instances — " +
        "within-doc repeats were not combined map-side")
  }

  test("semantic dedup shuffles ids and vectors once, never a cross product") {
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val vecBytes = vecs.agg(sum(size(col("embedding")) * 4 + 8)).head().getLong(0)
    val s = ShuffleAudit.of(graft.operators.SemanticDedup.dedup(
      vecs, "vec_id", "embedding", cents, "cid", "cvec", tau = 0.9))
    // the pairwise stage repartitions each side by cell_id (2 passes of
    // the vector set) plus the dup/result joins — a small constant times
    // the vector volume, NOT the |V|^2 cross product (which would be
    // ~500x here: |V|/|cells| rows against every row)
    assert(s.writeBytes < vecBytes * 12,
      s"semantic dedup shuffled ${s.writeBytes} vs vectors $vecBytes")
  }

  test("unigram scoring shuffles token counts, never text") {
    val s = ShuffleAudit.of(graft.operators.TextAnalysis.unigramLogprob(
      docs, "doc_id", "text", vocabSize = 64))
    assert(s.writeBytes > 0)
    // (doc, token, count) and (token, count) rows with map-side combine:
    // bounded by a small multiple of the corpus text volume even on this
    // tiny corpus where per-row overhead dominates — the failure mode
    // guarded against is shuffling scored per-INSTANCE rows (~10x text)
    assert(s.writeBytes < corpusTextBytes * 6,
      s"unigram scoring shuffled ${s.writeBytes} vs corpus $corpusTextBytes")
  }

  test("minhash signatures shuffle pre-aggregated rows, not exploded shingles") {
    val sigs = Dedup.withMinhashSignature(docs, "doc_id", "text")
    val s = ShuffleAudit.of(sigs)
    assert(s.writeBytes > 0)
    // map-side combine: one (id, 8 hashes) row per group per partition —
    // the shuffle must stay well under the raw text volume
    assert(s.writeBytes < corpusTextBytes,
      s"minhash shuffled ${s.writeBytes} vs corpus $corpusTextBytes")
    // and the record count must be near |docs|, nowhere near |shingles|
    val nDocs = docs.count()
    assert(s.recordsRead < nDocs * 40,
      s"records ${s.recordsRead} suggests shingles were shuffled (docs=$nDocs)")
  }

  test("incremental near-dup probe shuffles buckets + ids, never corpus text") {
    // a corpus 50× the batch: if the probe shuffled anything
    // corpus-sized (text, signatures for re-banding), the budget blows
    val corpus = docs
    val batch = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
    val bandIndex = Dedup.lshBands(
        Dedup.withMinhashSignature(corpus, "doc_id", "text"), "doc_id", 8, 4)
      .select(col("band_id"), col("bucket"), col("doc_id").as("id"))
    val s = ShuffleAudit.of(
      Dedup.minhashIncrement(batch, "doc_id", "text", bandIndex))
    assert(s.writeBytes > 0)
    // the full flow (batch sigs + corpus band join + verdict joins) must
    // stay under the corpus text volume — buckets are 32-byte md5 hex
    assert(s.writeBytes < corpusTextBytes,
      s"near-dup increment shuffled ${s.writeBytes} vs corpus $corpusTextBytes")
  }

  test("graph-ANN build shuffles pair TRIPLES through the quadratic exchange, not vectors") {
    import graft.operators.Ann
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
    val assigned = Ann.assignCells(emb, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec")
    // the quadratic term: Σ|cell|² candidate pairs feed the top-m window
    val nPairs = assigned.groupBy("cell_id").count()
      .select(sum(col("count") * col("count"))).head().getLong(0)
    val vecRowBytes = 64L * 8 + 16 // one double-cast vector row
    val s = ShuffleAudit.of(Ann.knnGraph(assigned, "vec_id", "embedding",
      cents, "centroid_id", "centroid_vec", m = 4))
    assert(s.writeBytes > 0)
    // a build that carried vectors through the pair exchange would cost
    // ≈ nPairs × vecRowBytes; the triple form costs ≈ nPairs × ~30 B
    // plus linear vector passes (cell join + final edge join)
    val pairVecCost = nPairs * vecRowBytes
    assert(s.writeBytes < pairVecCost / 4,
      s"graph build shuffled ${s.writeBytes} B — within 4x of the " +
        s"vector-carrying pair cost $pairVecCost B; triples expected")
  }

  test("incremental semantic probe shuffles index rows once, never a cross product") {
    import graft.operators.{Ann, SemanticDedup}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // a corpus 9× the batch: the cell-confined equi-joins keep shuffle
    // RECORDS at O(|index| + |batch| × stages); a design that shuffled
    // the |index|×|batch| pair term (or re-read corpus vectors per
    // batch row) would blow this bound by orders of magnitude
    val corpus = emb.filter(col("vec_id") < 450)
    val index = Ann.assignCells(corpus, "vec_id", "embedding", cents, "cid", "cvec")
      .select("vec_id", "embedding", "cell_id")
    val batch = emb.filter(col("vec_id") >= 450)
    val s = ShuffleAudit.of(SemanticDedup.semanticIncrement(
      batch, "vec_id", "embedding", index, cents, "cid", "cvec", tau = 0.9))
    assert(s.writeBytes > 0)
    val nIndex = corpus.count(); val nBatch = batch.count()
    assert(s.recordsRead < (nIndex + nBatch) * 12,
      s"records ${s.recordsRead} suggests a pair explosion " +
        s"(index=$nIndex batch=$nBatch)")
  }
}
