package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: graph-ANN recall@10 on the REAL corpus (32.7k PMC
  * chunks, TF-IDF embeddings at dim 1024) — the companion to the sf1
  * RecallSweep, which runs on synthetic RANDOM vectors where recall is
  * provably just a function of visited fraction (no locality to
  * exploit: at 20k vectors a beam-32 walk visits ~12% and recalls
  * ~0.66, where the same walk on the 2k-vector SF visited ~60% and
  * recalled ≥0.9). Real embedding spaces have manifold structure, and
  * the reference serves THIS corpus — so this is the recall number
  * that decides whether warm-serving quality holds at scale.
  *
  * Measures mean recall@10 of the warm beam walk vs exact brute force
  * over 20 in-domain queries, at the ServeBench codebook (|C|=64) and
  * the √N discipline (|C|=181). `runMain graft.PmcRecallProbe`. */
object PmcRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = sources.CorpusSource.scanWithCharsetFallback(
      spark, "/root/reference/PMC", "PMC*.txt").toDF()
    val chunks = operators.Ingest.chunk(
        docs.filter(operators.Ingest.nonBlank(col("text"))), "text", Schemas.ChunkSize)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
    val (embedded, dfreq, nDocs) =
      operators.Embed.withTfIdfEmbedding(chunks, "chunk_text", "embedding", dim = 1024)
    val index = embedded.persist()
    val n = index.count()
    println(s"PMC index: $n chunks")

    lazy val queries = index.filter(col("chunk_idx") === 0)
      .orderBy("doc_id").select("chunk_text").limit(20)
      .as[String].collect()
      .map(_.split("\\s+").filter(_.nonEmpty).take(8).mkString(" ")).toSeq
    lazy val qvecs = queries.map(q =>
      operators.Embed.embedQueryTfIdf(spark, q, dfreq, nDocs, dim = 1024).toSeq)

    lazy val exact: Seq[Set[(String, Int)]] = qvecs.map { qv =>
      operators.Similarity.topK(index, "embedding", qv, 10,
          tieBreak = Seq("doc_id", "chunk_idx"))
        .select("doc_id", "chunk_idx").as[(String, Int)].collect().toSet
    }

    // mean-centered data-row planes for the LSH-confined edge build:
    // TF-IDF embeddings are non-negative (every raw sign bit lands
    // positive — one bucket), so the probe centers the plane vectors on
    // the corpus mean, which restores ~balanced sign splits while
    // staying fully deterministic
    lazy val meanVec = {
      val sum = index.select(col("embedding").cast("array<double>")).rdd
        .map(_.getSeq[Double](0).toArray)
        .treeReduce { (a, b) =>
          val out = a.clone(); var i = 0
          while (i < out.length) { out(i) += b(i); i += 1 }
          out
        }
      sum.map(_ / n)
    }
    lazy val rawPlanes = index.filter(col("chunk_idx") === 0)
      .orderBy("doc_id").limit(4)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    lazy val centered: Seq[Seq[Double]] =
      rawPlanes.map(p => p.zip(meanVec).map { case (x, m) => x - m }.toSeq).toSeq

    // TRAINED super book: 2 Lloyd rounds over the corpus from the 13
    // head seeds — the FAISS coarse-quantizer discipline (head-of-
    // codebook supers are a random sample, which routes poorly here)
    lazy val headSeeds = index.orderBy("doc_id", "chunk_idx").limit(13)
      .select(monotonically_increasing_id().as("centroid_id"),
        col("embedding").cast("array<double>").as("centroid_vec"))
    def refine(seeds: org.apache.spark.sql.DataFrame, frac: Double): Seq[Seq[Double]] =
      operators.Ann.kmeansRefine(index, "doc_id", "embedding",
          seeds, dim = 1024, iters = 2, sampleFrac = frac)
        .orderBy("centroid_id")
        .select(col("centroid_vec").cast("array<double>")).collect()
        .map(_.getSeq[Double](0)).toSeq
    lazy val trainedSupers: Seq[Seq[Double]] = refine(headSeeds, 1.0)
    // seed/frac DIAGNOSTICS for the buildServing routing collapse
    // (gate said 0.955 on self-including probes, text queries said
    // 0.405): isolate which ingredient differs from the proven recipe
    lazy val trainedSupersHalf = refine(headSeeds, 0.5)
    lazy val uidSeeds = index
      .withColumn("_pid", operators.GraphIndex.uidFor(Seq("doc_id", "chunk_idx")))
      .orderBy("_pid").limit(13)
      .select(monotonically_increasing_id().as("centroid_id"),
        col("embedding").cast("array<double>").as("centroid_vec"))
    lazy val trainedSupersUid = refine(uidSeeds, 1.0)
    lazy val trainedSupersUidHalf = refine(uidSeeds, 0.5)

    // banded OR-amplified edge bands (Ann.centeredPlaneBands over the
    // library path — same centering the hand-rolled planes above use)
    lazy val withPid = index.withColumn("_pid",
      operators.GraphIndex.uidFor(Seq("doc_id", "chunk_idx")))
    lazy val bands2x2 = operators.Ann.centeredPlaneBands(
      withPid, "_pid", "embedding", nBands = 2, planesPerBand = 2)
    lazy val bands3x2 = operators.Ann.centeredPlaneBands(
      withPid, "_pid", "embedding", nBands = 3, planesPerBand = 2)
    lazy val bandsOrtho2x2 = operators.Ann.orthogonalPlaneBands(
      withPid, "_pid", "embedding", nBands = 2, planesPerBand = 2)
    lazy val bandsOrtho3x2 = operators.Ann.orthogonalPlaneBands(
      withPid, "_pid", "embedding", nBands = 3, planesPerBand = 2)

    case class Cfg(label: String, nc: Int, nSupers: Int,
                   planes: Seq[Seq[Double]], probes: Int = 1,
                   supers: Seq[Seq[Double]] = Nil,
                   bands: Seq[Seq[Seq[Double]]] = Nil,
                   m: Int = 16, beam: Int = 32)
    lazy val allCfgs = Seq(
      Cfg("flat |C|=64 (old ServeBench)", 64, 0, Nil),
      Cfg("flat |C|=181 (sqrt-N)", 181, 0, Nil),
      Cfg("hier p=1 |C|=181 |S|=13", 181, 13, Nil, 1),
      Cfg("hier p=2 |C|=181 |S|=13", 181, 13, Nil, 2),
      Cfg("hier p=3 |C|=181 |S|=13", 181, 13, Nil, 3),
      Cfg("hier p=1 TRAINED supers", 181, 13, Nil, 1, trainedSupers),
      Cfg("hier p=2 TRAINED supers", 181, 13, Nil, 2, trainedSupers),
      Cfg("hier p=3 TRAINED supers", 181, 13, Nil, 3, trainedSupers),
      Cfg("hier p=4 TRAINED supers", 181, 13, Nil, 4, trainedSupers),
      Cfg("hier p=6 TRAINED supers", 181, 13, Nil, 6, trainedSupers),
      Cfg("flat+lsh2 |C|=181 (4 buckets/cell)", 181, 0, centered.take(2)),
      Cfg("hier p=2 + lsh2 |C|=181", 181, 13, centered.take(2), 2),
      Cfg("flat+BANDED 2x2 centered", 181, 0, Nil, 1, Nil, bands2x2),
      Cfg("flat+BANDED 3x2 centered", 181, 0, Nil, 1, Nil, bands3x2),
      Cfg("hier p=4 TRAINED + BANDED 2x2", 181, 13, Nil, 4, trainedSupers, bands2x2),
      Cfg("hier p=4 TRAINED + BANDED 3x2", 181, 13, Nil, 4, trainedSupers, bands3x2),
      Cfg("flat+BANDED 2x2 ORTHO", 181, 0, Nil, 1, Nil, bandsOrtho2x2),
      Cfg("flat+BANDED 3x2 ORTHO", 181, 0, Nil, 1, Nil, bandsOrtho3x2),
      // the walk-structure levers: with the candidate pool confined,
      // keep MORE of it per node (m) and/or search wider (beam) —
      // build compute unchanged by m, query cost by beam only
      Cfg("BANDED 2x2 ORTHO m=32", 181, 0, Nil, 1, Nil, bandsOrtho2x2, m = 32),
      Cfg("BANDED 2x2 ORTHO beam=64", 181, 0, Nil, 1, Nil, bandsOrtho2x2, beam = 64),
      Cfg("BANDED 2x2 ORTHO m=32 beam=64", 181, 0, Nil, 1, Nil, bandsOrtho2x2, m = 32, beam = 64),
      Cfg("hier p=4 TRAINED + B2x2 ORTHO m=32 beam=64", 181, 13, Nil, 4, trainedSupers, bandsOrtho2x2, m = 32, beam = 64),
      Cfg("DIAG hier p=4 head seeds frac=0.5", 181, 13, Nil, 4, trainedSupersHalf),
      Cfg("DIAG hier p=4 uid seeds frac=1.0", 181, 13, Nil, 4, trainedSupersUid),
      Cfg("DIAG hier p=4 uid seeds frac=0.5", 181, 13, Nil, 4, trainedSupersUidHalf))
    // diagnostics above are LAZY: a mode that never reads the trained
    // supers / bands / brute-force truth sets never pays their Spark
    // jobs (the ivf/semdedup sections build their own inputs).
    // `runMain graft.PmcRecallProbe gated` skips the config sweep;
    // `... banded` runs only the banded rows — the sweep is ~25 min;
    // `... ivf` / `... semdedup` run ONLY their own sections below
    val cfgs =
      if (args.exists(Set("gated", "ivf", "semdedup", "gates"))) Seq.empty
      else if (args.contains("banded2")) allCfgs.filter(c =>
        c.label.contains("m=32") || c.label.contains("beam=64") ||
          c.label.startsWith("DIAG"))
      else if (args.contains("banded")) allCfgs.filter(_.label.contains("BANDED"))
      else allCfgs
    cfgs.foreach { cfg =>
      val gdir = java.nio.file.Files.createTempDirectory("pmc_recall").toString
      val t0 = System.nanoTime()
      val h = operators.GraphIndex.build(spark, index, Seq("doc_id", "chunk_idx"),
        "embedding", gdir, nCentroids = cfg.nc, m = cfg.m, nBuckets = 64,
        beamWidth = cfg.beam, hops = 3, nSupers = cfg.nSupers, lshPlanes = cfg.planes,
        superProbes = cfg.probes, superVecs = cfg.supers, lshBands = cfg.bands)
      val wh = operators.GraphIndex.warm(spark, h)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val recalls = qvecs.zip(exact).map { case (qv, truth) =>
        val got = wh.topK(spark, qv, 10, tieBreak = Seq("doc_id", "chunk_idx"))
          .select("doc_id", "chunk_idx").as[(String, Int)].collect().toSet
        truth.intersect(got).size / 10.0
      }
      println(f"${cfg.label}%-44s m=${cfg.m} beam=${cfg.beam} hops=3: mean recall@10 = " +
        f"${recalls.sum / recalls.length}%.3f (min ${recalls.min}%.2f), " +
        f"build+warm $tBuild%.1f s")
      wh.cool()
      // stores are ~1.8 GB each (denormalized edge vectors); 16 configs
      // of leftovers is how a probe run fills the disk
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(gdir))
    }

    // ---- `ivf` mode: recall rows for the IVF and IVF-PQ serving paths
    // at the default knobs (verdict: buildServing gates the graph
    // store, but an IVF/IVF-PQ store could still be probed at silently
    // bad nprobe/codebook choices — these rows are the missing
    // acceptance evidence, and Ann.writeIvfIndexGated is the gate).
    if (args.contains("ivf")) {
      val nCents = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong).toInt
      val headCents = index.orderBy("doc_id", "chunk_idx").limit(nCents)
        .select(monotonically_increasing_id().as("centroid_id"),
          col("embedding").cast("array<double>").as("centroid_vec"))
      val trainedCents = operators.Ann.kmeansRefine(index, "doc_id", "embedding",
        headCents, dim = 1024, iters = 2)
      // assign ONCE per centroid set and persist: the nprobe sweep
      // below probes the same assignment 4-6 times × 20 queries each
      def ivfRecallRows(label: String, cents: org.apache.spark.sql.DataFrame,
                        nprobes: Seq[Int]): Unit = {
        val assigned = operators.Ann.assignCells(index, "doc_id", "embedding",
          cents, "centroid_id", "centroid_vec").persist()
        assigned.count()
        nprobes.foreach { nprobe =>
          val recalls = qvecs.zip(exact).map { case (qv, truth) =>
            val got = operators.Ann.ivfCandidates(assigned, "embedding",
                cents, "centroid_id", "centroid_vec", qv, nprobe)
              .orderBy(desc("sim"), col("doc_id"), col("chunk_idx")).limit(10)
              .select("doc_id", "chunk_idx").as[(String, Int)].collect().toSet
            truth.intersect(got).size / 10.0
          }
          val r = recalls.sum / recalls.length
          println(f"IVF $label%-28s |C|=$nCents nprobe=$nprobe%3d: mean recall@10 = $r%.3f " +
            f"(min ${recalls.min}%.2f)")
        }
        assigned.unpersist()
      }
      ivfRecallRows("head centroids", headCents, Seq(1, 2, 4, 8, 16, 32))
      ivfRecallRows("TRAINED centroids", trainedCents, Seq(4, 8, 16, 32))
      // IVF-PQ: head codebooks m=8 k=16 (the q_ivfpq knobs), ADC top-100
      // candidates, exact re-rank — recall vs full brute force. Pq keys
      // on LONG ids (EncodedVec), so the natural key folds to the same
      // long uid the graph store uses
      val pidx = index
        .withColumn("pid", operators.GraphIndex.uidFor(Seq("doc_id", "chunk_idx")))
        .select(col("pid"), col("doc_id"), col("chunk_idx"),
          col("embedding").cast("array<double>").as("vec"))
      val cb = operators.Pq.headCodebooks(pidx, "pid", "vec", m = 8, k = 16)
      val enc = operators.Pq.encode(pidx, "pid", "vec", cb).toDF()
        .select(col("id").as("pid"), col("codes"))
      def ivfPqRows(label: String, cbX: operators.Pq.Codebooks,
                    encX: org.apache.spark.sql.DataFrame, cand: Int): Unit = {
        val asg = operators.Ann.assignCells(pidx, "pid", "vec",
            trainedCents, "centroid_id", "centroid_vec")
          .select("pid", "doc_id", "chunk_idx", "vec", "cell_id")
          .join(encX, "pid").persist()
        asg.count()
        Seq(8, 16, 32).foreach { p =>
          val recalls = qvecs.zip(exact).map { case (qv, truth) =>
            val got = operators.Pq.ivfPqSearchTopK(asg, "pid", "vec", cbX,
                trainedCents, "centroid_id", "centroid_vec",
                qv.toArray, topK = 10, nprobe = p, candidates = cand)
              .join(pidx.select("pid", "doc_id", "chunk_idx"), "pid")
              .select("doc_id", "chunk_idx").as[(String, Int)].collect().toSet
            truth.intersect(got).size / 10.0
          }
          println(f"IVF-PQ $label cand=$cand nprobe=$p%3d: " +
            f"mean recall@10 = ${recalls.sum / recalls.length}%.3f (min ${recalls.min}%.2f)")
        }
        asg.unpersist()
      }
      ivfPqRows("TRAINED cents, head codebooks m=8 k=16", cb, enc, 100)
      // trained PQ codebooks — on sparse TF-IDF the head (untrained)
      // sub-codebooks quantize badly; 2 Lloyd rounds is the honest
      // "default knobs" row, with a wider re-rank pool alongside
      val cbT = operators.Pq.train(pidx, "pid", "vec", m = 8, k = 16, iters = 2)
      val encT = operators.Pq.encode(pidx, "pid", "vec", cbT).toDF()
        .select(col("id").as("pid"), col("codes"))
      ivfPqRows("TRAINED cents, TRAINED codebooks m=8 k=16", cbT, encT, 100)
      ivfPqRows("TRAINED cents, TRAINED codebooks m=8 k=16", cbT, encT, 500)
    }

    // ---- `semdedup` mode: planted near-dup recall of SemanticDedup's
    // CONFINED pair stage on the real corpus — exact copies always
    // survive confinement (identical route + sign bits); what the band
    // trade actually risks is NEAR-dups (paraphrase/ellipsis), so the
    // plant drops every 10th word of 200 chunks and re-embeds in the
    // same TF-IDF space, then measures how many tau-pairs each
    // confinement tier still finds vs the cell-only baseline.
    if (args.contains("semdedup")) {
      import graft.functions.VectorFunctions.cosine
      val base = chunks.select(
        concat_ws("#", col("doc_id"), col("chunk_idx")).as("id"), col("chunk_text"))
      val toDup = base.orderBy("id").limit(200)
      val dups = toDup.select(
        concat(col("id"), lit("~dup")).as("id"),
        array_join(filter(split(col("chunk_text"), "\\s+"),
          (_, i) => i % 10 =!= 0), " ").as("chunk_text"))
      val (embAll, _, _) = operators.Embed.withTfIdfEmbedding(
        base.unionByName(dups), "chunk_text", "embedding", dim = 1024)
      val vecs = embAll.select(col("id"), col("embedding")).persist()
      val nAll = vecs.count()
      // planted-pair cosine distribution decides the tau that makes a
      // pair "true": report it, then gate at tau = 0.8
      val planted = vecs.as("a").join(vecs.as("b"),
          concat(col("a.id"), lit("~dup")) === col("b.id"))
        .select(col("a.id").as("id"),
          cosine(col("a.embedding"), col("b.embedding")).as("sim"))
        .persist()
      val sims = planted.select("sim").as[Double].collect().sorted
      val tau = 0.8
      val eligible = sims.count(_ >= tau)
      println(f"semdedup plant: ${sims.length} pairs, cosine min=${sims.min}%.3f " +
        f"med=${sims(sims.length / 2)}%.3f max=${sims.max}%.3f; tau=$tau eligible=$eligible")
      val nc = math.max(1L, math.floor(math.sqrt(nAll.toDouble)).toLong).toInt
      val ns = math.max(1, math.floor(math.sqrt(nc.toDouble)).toInt)
      val cents = vecs.orderBy("id").limit(nc)
        .select(monotonically_increasing_id().as("cid"),
          col("embedding").cast("array<double>").as("cvec"))
      val seeds = vecs.orderBy("id").limit(ns)
        .select(monotonically_increasing_id().as("centroid_id"),
          col("embedding").cast("array<double>").as("centroid_vec"))
      val supers = operators.Ann.kmeansRefine(vecs, "id", "embedding",
          seeds, dim = 1024, iters = 2)
        .orderBy("centroid_id")
        .select(col("centroid_vec").cast("array<double>")).collect()
        .map(_.getSeq[Double](0)).toSeq
      val bandsO = operators.Ann.orthogonalPlaneBands(vecs, "id", "embedding",
        nBands = 2, planesPerBand = 2)
      def foundBy(label: String, nSupers: Int, sv: Seq[Seq[Double]],
                  bands: Seq[Seq[Seq[Double]]], cellProbes: Int = 1,
                  margin: Double = Double.PositiveInfinity,
                  cap: Int = Int.MaxValue): Long = {
        val t0 = System.nanoTime()
        val prs = operators.SemanticDedup.pairs(vecs, "id", "embedding",
          cents, "cid", "cvec", tau, nSupers = nSupers, superProbes = 4,
          superVecs = sv, bands = bands, cellProbes = cellProbes,
          probeMargin = margin, probeCellCap = cap)
        val hits = prs.filter(col("id_b") === concat(col("id_a"), lit("~dup"))).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"semdedup $label%-34s |C|=$nc |S|=$nSupers: planted tau-pairs found = " +
          f"$hits%3d / $eligible (${hits.toDouble / math.max(eligible, 1)}%.3f), $dt%.1f s")
        hits
      }
      val flatFound = foundBy("flat cells only (baseline)", 0, Nil, Nil)
      // the round-15 recovery rows: the boundary loss is the whole gap
      // (hier/bands are recall-clean below), so top-p cell probing on
      // the pair join's probe side is where the 111/200 lost pairs are.
      // UNBOUNDED probing recovers them at hub-cell cost (runner-up
      // choices concentrate — the margin sweep below is the honest
      // cost/recall frontier; shipping default = the cheapest margin
      // holding ≥ 0.9)
      val flatP2 = foundBy("flat + cellProbes=2", 0, Nil, Nil, 2)
      val flatP3 = foundBy("flat + cellProbes=3", 0, Nil, Nil, 3)
      Seq(0.1, 0.05, 0.02, 0.01).foreach { m =>
        foundBy(f"flat + p=2 margin=$m%.2f", 0, Nil, Nil, 2, m)
      }
      // round-16 rows: the margin DERIVED from this corpus's own gap
      // distribution (deriveProbeMargin — "probe the boundary X%"
      // instead of an absolute guess), and the hub probe cap bounding
      // worst-cell runner-up inflow at the recall-bearing margin.
      // Honest finding from the first sweep: on sparse TF-IDF the gap
      // CDF is concentrated near zero (median ≈ 0.005), so LOW
      // boundary fractions buy almost no recall — the lost pairs' gaps
      // reach ~0.05, which sits far out in the CDF. The fraction knob
      // is still the right interface (it bounds the probe-side row
      // count by construction); what the sweep shows is WHERE on this
      // corpus's CDF the recall lives.
      val derived = Seq(0.25, 0.50, 0.90, 0.95).map { f =>
        f -> operators.SemanticDedup.deriveProbeMargin(vecs, "id", "embedding",
          cents, "cid", "cvec", f)
      }
      val fracAt005 = operators.Ann.assignCellGaps(vecs, "id", "embedding",
          cents, "cid", "cvec")
        .agg(avg(when(col("cell_gap") <= 0.05, 1.0).otherwise(0.0)))
        .head().getDouble(0)
      println(derived.map { case (f, m) => f"frac=$f%.2f -> margin=$m%.4f" }
        .mkString("semdedup derived margins: ", ", ",
          f"; CDF(gap <= 0.05) = $fracAt005%.3f"))
      derived.foreach { case (f, m) =>
        foundBy(f"flat + p=2 margin=derived($f%.2f)", 0, Nil, Nil, 2, m)
      }
      // the cap rows run at the recall-bearing 0.90-fraction margin —
      // hub inflow is real there, so the cap has something to bound
      val mHi = derived.find(_._1 == 0.90).get._2
      Seq(2000, 500, 100).foreach { cap =>
        foundBy(f"flat + p=2 derived(0.90) cap=$cap%d", 0, Nil, Nil, 2, mHi, cap)
      }
      val hierFound = foundBy("hier p=4 TRAINED supers", ns, supers, Nil)
      val hierP2 = foundBy("hier p=4 TRAINED + cellProbes=2", ns, supers, Nil, 2)
      val hierP2m = foundBy("hier p=4 + p=2 margin=0.05", ns, supers, Nil, 2, 0.05)
      val bandFound = foundBy("hier p=4 + ORTHO 2x2 bands", ns, supers, bandsO)
      val bandP2 = foundBy("hier p=4 + ORTHO 2x2 + cellProbes=2", ns, supers, bandsO, 2)
      val bandP2m = foundBy("hier+bands + p=2 margin=0.05", ns, supers, bandsO, 2, 0.05)
      println(f"semdedup margin rows: hierP2m=$hierP2m bandP2m=$bandP2m")
      println(f"semdedup confined-stage recall: hier/flat = " +
        f"${hierFound.toDouble / math.max(flatFound, 1)}%.3f, " +
        f"banded/hier = ${bandFound.toDouble / math.max(hierFound, 1)}%.3f, " +
        f"banded/flat = ${bandFound.toDouble / math.max(flatFound, 1)}%.3f")
      println(f"semdedup multi-probe recovery: flatP2/eligible = " +
        f"${flatP2.toDouble / math.max(eligible, 1)}%.3f, flatP3/eligible = " +
        f"${flatP3.toDouble / math.max(eligible, 1)}%.3f, hierP2/eligible = " +
        f"${hierP2.toDouble / math.max(eligible, 1)}%.3f, bandP2/eligible = " +
        f"${bandP2.toDouble / math.max(eligible, 1)}%.3f")
      planted.unpersist(); vecs.unpersist()
    }

    // ---- `gates` mode: the round-15 gated publishers exercised on the
    // real corpus at their default knobs — the acceptance evidence that
    // the SQ8 and IVF-PQ gates PASS healthy stores here (the refusal
    // paths are spec-pinned on constructed fixtures; these rows prove
    // the floors are attainable on real data, so the gates gate rather
    // than block).
    if (args.contains("gates")) {
      val pidx = index
        .withColumn("pid", operators.GraphIndex.uidFor(Seq("doc_id", "chunk_idx")))
        .select(col("pid"), col("embedding").cast("array<double>").as("vec"))
        .persist()
      pidx.count()
      val workload = qvecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("query_id", "qv")
      // SQ8 two-tier store, default knobs (k=10, candidates=100)
      val sqDir = java.nio.file.Files.createTempDirectory("pmc_sq_gate").toString + "/store"
      val t0 = System.nanoTime()
      val sqRecall = operators.Sq.writeIndexGated(spark, pidx, "pid", "vec",
        sqDir, workload, k = 10, candidates = 100, recallFloor = 0.9)
      println(f"GATE sq8 two-tier (k=10 cand=100): published at recall@10 = " +
        f"$sqRecall%.3f, ${(System.nanoTime() - t0) / 1e9}%.1f s")
      // IVF-PQ at the honest knobs the r14 rows found (trained cents,
      // trained codebooks, cand=500, nprobe=8) — floor 0.8: the r14
      // measured ceiling for IVF-PQ on sparse TF-IDF was 0.855, so 0.9
      // would refuse the best-known config; the floor is a deliberate
      // per-store choice and THIS one is documented
      val nCents = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong).toInt
      val headCents = index.orderBy("doc_id", "chunk_idx").limit(nCents)
        .select(monotonically_increasing_id().as("centroid_id"),
          col("embedding").cast("array<double>").as("centroid_vec"))
      val trainedCents = operators.Ann.kmeansRefine(index, "doc_id", "embedding",
        headCents, dim = 1024, iters = 2)
      val cbT = operators.Pq.train(pidx, "pid", "vec", m = 8, k = 16, iters = 2)
      val encT = operators.Pq.encode(pidx, "pid", "vec", cbT).toDF()
        .select(col("id").as("pid"), col("codes"))
      val asg = operators.Ann.assignCells(pidx, "pid", "vec",
          trainedCents, "centroid_id", "centroid_vec")
        .select("pid", "vec", "cell_id").join(encT, "pid")
      val pqDir = java.nio.file.Files.createTempDirectory("pmc_ivfpq_gate").toString + "/store"
      val t1 = System.nanoTime()
      val pqRecall = operators.Pq.writeIvfPqIndexGated(spark, asg, "pid", "vec",
        cbT, trainedCents, "centroid_id", "centroid_vec", pqDir, workload,
        nprobe = 8, candidates = 500, k = 10, recallFloor = 0.8)
      println(f"GATE ivf-pq (trained cents+codebooks, nprobe=8 cand=500): " +
        f"published at recall@10 = $pqRecall%.3f, ${(System.nanoTime() - t1) / 1e9}%.1f s")
      pidx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(sqDir).getParentFile)
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(pqDir).getParentFile)
      spark.stop(); return
    }

    if (args.exists(Set("ivf", "semdedup"))) { spark.stop(); return }

    // the SHIPPED path: buildServing at the FULL production recipe —
    // size-derived |C|/|S|, head-seed trained supers p=4 (seed
    // diagnostics above: head-order seeds or bust), ORTHO 2x2 edge
    // bands with the walk widened to beam=64/m=32 (the measured
    // 0.975-recall point) — gated at the 0.9 floor ON THE TEXT-QUERY
    // WORKLOAD. This row is the acceptance evidence the serving build
    // publishes with; the refusal path is equally proven (a uid-seeded
    // frac=0.5 config measured 0.405 and was deleted by the gate)
    val sdir = java.nio.file.Files.createTempDirectory("pmc_serving").toString
    val t0 = System.nanoTime()
    val qdf = qvecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("query_id", "qv")
    val (sh, sRecall) = operators.GraphIndex.buildServing(spark, index,
      Seq("doc_id", "chunk_idx"), "embedding", sdir,
      m = 32, nBuckets = 64, beamWidth = 64, hops = 3,
      superProbes = 4, trainSampleFrac = 1.0, lshBands = 2,
      recallFloor = 0.9, recallQueries = 20, recallK = 10,
      recallQueriesDf = Some(qdf))
    val tServing = (System.nanoTime() - t0) / 1e9
    val swh = operators.GraphIndex.warm(spark, sh)
    val sRecalls = qvecs.zip(exact).map { case (qv, truth) =>
      val got = swh.topK(spark, qv, 10, tieBreak = Seq("doc_id", "chunk_idx"))
        .select("doc_id", "chunk_idx").as[(String, Int)].collect().toSet
      truth.intersect(got).size / 10.0
    }
    println(f"buildServing GATED (p=4 head-seed trained + ortho 2x2 bands, m=32 beam=64): " +
      f"gate recall@10 = $sRecall%.3f, probe recall@10 = " +
      f"${sRecalls.sum / sRecalls.length}%.3f (min ${sRecalls.min}%.2f), " +
      f"build+gate $tServing%.1f s")
    swh.cool()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(sdir))
    spark.stop()
  }
}
