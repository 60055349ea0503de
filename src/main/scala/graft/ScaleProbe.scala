package graft
import org.apache.spark.sql.functions._
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def stack(n: Int) = (0 until n).map(i =>
      base.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text"), col("source")))
      .reduce(_ unionByName _).repartition(32)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    for (n <- Seq(1, 4, 10)) {
      val docs = stack(n)
      time(s"minhash_candidates x$n")(operators.Dedup.minhashCandidates(docs, "doc_id", "text", 3, 8, 4).count())
      time(s"jaccard_pairs x$n")(operators.Dedup.jaccardPairs(docs, "doc_id", "text", "source", 3, 0.05).count())
      time(s"exact_dedup x$n")(operators.Dedup.exact(docs, "doc_id", "text").count())
    }
    // hot-shingle skew bomb: plant one ubiquitous trigram in EVERY doc of
    // one block. Uncapped, that single shingle emits |block|²/2 join rows;
    // with the df-cap it is dropped and runtime stays output-bound.
    {
      val planted = stack(10).select(col("doc_id"),
        concat(lit("omnipresent hot shingle "), col("text")).as("text"), col("source"))
      time("jaccard planted-hot UNCAPPED")(
        operators.Dedup.jaccardPairs(planted, "doc_id", "text", "source", 3, 0.05).count())
      time("jaccard planted-hot maxDf100")(
        operators.Dedup.jaccardPairs(planted, "doc_id", "text", "source", 3, 0.05, maxDf = 100L).count())
    }
    // connected-components scaling: synthetic pair graphs at growing
    // size. Dense near-dup clusters (size 5) converge in ~2 rounds no
    // matter the graph size — runtime grows with EDGES, not rounds; the
    // 16-node chain shows the diameter-bound worst case on a tiny graph.
    {
      def clusterGraph(nClusters: Int) = { // cliques of 5: 10 edges each
        val ids = spark.range(0, nClusters.toLong * 5)
        ids.select((col("id") / 5).cast("long").as("c"), col("id").as("id_a"))
          .join(ids.select((col("id") / 5).cast("long").as("c"), col("id").as("id_b")), "c")
          .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
      }
      for (n <- Seq(10000, 100000))
        time(s"clusters ${n}x5-cliques")(operators.Dedup.clusters(clusterGraph(n)).count())
      val chain = spark.range(0, 15).select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      time("clusters 16-node chain")(operators.Dedup.clusters(chain, maxIter = 100).count())
    }

    // shard packing: ONE 2M-row stratum — the single-window form
    // serializes into one task; the bucketed form runs one window per
    // 100k-row bucket (20 concurrent) and must reproduce identical
    // shard ids (exact equivalence, asserted here on the probe data too)
    {
      val oneStratum = spark.range(0, 2000000L).toDF("id")
        .withColumn("strat", lit("crawl"))
        .withColumn("toks", pmod(col("id") * 37, lit(400)) + lit(50))
        .repartition(32).persist()
      oneStratum.count()
      time("packShards 2M single-window")(
        operators.Sampling.packShards(oneStratum, "strat", "id", "toks", 100000L)
          .agg(countDistinct("shard_id")).head().getLong(0))
      time("packShardsBucketed 2M x100k")(
        operators.Sampling.packShardsBucketed(oneStratum, "strat", "id", "toks", 100000L,
          bucketRows = 100000L)
          .agg(countDistinct("shard_id")).head().getLong(0))
      val diff = operators.Sampling.packShards(oneStratum, "strat", "id", "toks", 100000L)
        .select("id", "shard_id")
        .except(operators.Sampling.packShardsBucketed(
          oneStratum, "strat", "id", "toks", 100000L, 100000L).select("id", "shard_id"))
        .count()
      println(s"packShards bucketed-vs-single diverging rows: $diff (must be 0)")
      oneStratum.unpersist()
    }

    // gram-profile scaling: stacked corpus copies make every gram a
    // cross-copy duplicate — the dup-heaviest case. Runtime must grow
    // ~linearly in corpus size (distinct (gram,doc) rows), not
    // quadratically in instances.
    for (n <- Seq(1, 4, 10)) {
      val docs = stack(n)
      time(s"gram_profile x$n")(
        operators.Dedup.duplicatedGramProfile(docs, "doc_id", "text", n = 5).count())
    }

    // semantic-dedup cell confinement: same vector set (4 stacked
    // copies of the sf0.1 embeddings — every copy an exact dup of the
    // first, so the expected dup count is 3/4 of the set), growing
    // codebook. Pairwise work is Σ|cell|²/2, so runtime must fall
    // roughly linearly as cells grow (the SemDeDup knob: size the
    // codebook to the corpus).
    {
      val e0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val vecs = (0 until 4).map(i => e0.select(
          (col("vec_id") + lit(i * 1000000)).as("vec_id"), col("embedding")))
        .reduce(_ unionByName _).repartition(32).persist()
      val nv = vecs.count()
      for (k <- Seq(8, 64)) {
        val cents = e0.filter(col("vec_id") < k)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
        time(s"semantic_dedup $nv vecs, $k cells")(
          operators.SemanticDedup.dedup(vecs, "vec_id", "embedding",
            cents, "cid", "cvec", tau = 0.9).filter(!col("is_kept")).count())
      }
      vecs.unpersist()
    }

    // graph-ANN scaling: build is cell-confined pairwise (Σ|cell|² —
    // sizing the codebook with the corpus keeps it linear-ish), and a
    // beam walk against the src-bucketed store reads only the
    // frontier's buckets per hop, so search latency must stay ~flat as
    // the graph grows.
    {
      val e0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      for (n <- Seq(1, 4)) {
        val vecs = (0 until n).map(i => e0.select(
            (col("vec_id") + lit(i * 1000000)).as("vec_id"), col("embedding")))
          .reduce(_ unionByName _).repartition(32).persist()
        val nv = vecs.count()
        val k = 8 * n // codebook sized with the corpus: |cell| stays ~constant
        // centroids come from copy 0 only (copies start at i*1000000, so
        // vec_id < 250*n never reaches them) — fine for the probe: it
        // needs k distinct centroids, not cross-copy spread, and copies
        // are vector-identical to copy 0 anyway
        val cents = vecs.filter(col("vec_id") < 250 * n)
          .orderBy("vec_id").limit(k)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("centroid_vec"))
        val assigned = operators.Ann.assignCells(vecs, "vec_id", "embedding",
          cents, "centroid_id", "centroid_vec")
        val edges = operators.Ann.knnGraph(assigned, "vec_id", "embedding",
          cents, "centroid_id", "centroid_vec", m = 4)
        time(s"knn_graph build $nv vecs, $k cells")(edges.count())
        val idx = java.nio.file.Files.createTempDirectory("graft_knng_probe").toString + "/idx"
        operators.Ann.writeGraphIndex(edges, idx, nBuckets = 64)
        val qv = e0.filter(col("vec_id") === 9)
          .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
        time(s"graph search (store) $nv vecs")(
          operators.Ann.graphSearchPartitioned(spark, idx, 64,
            cents, "centroid_id", "centroid_vec", qv, beamWidth = 8, hops = 3).count())
        vecs.unpersist()
      }
    }

    // GraphIndex SERVING flatness: the full ask-side path (pruned edge
    // walk + bucket-pruned sidecar re-attach) against stores built at
    // 1x and 4x the corpus with a corpus-scaled codebook — per-query
    // latency must stay ~flat because every read is frontier-bounded.
    {
      val e0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val qv = e0.filter(col("vec_id") === 9)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      for (n <- Seq(1, 4)) {
        val vecs = (0 until n).map(i => e0.select(
            (col("vec_id") + lit(i * 1000000)).as("vec_id"), col("embedding")))
          .reduce(_ unionByName _).repartition(32).persist()
        val nv = vecs.count()
        val dir = java.nio.file.Files.createTempDirectory("graft_gidx_probe").toString
        time(s"GraphIndex build $nv vecs")(
          { operators.GraphIndex.build(spark, vecs, Seq("vec_id"), "embedding",
              dir, nCentroids = 8 * n, m = 4, nBuckets = 64, beamWidth = 8, hops = 3); nv })
        val h = operators.GraphIndex.Handle(dir, 64, beamWidth = 8, hops = 3, m = 4)
        time(s"GraphIndex serve (cold) $nv vecs")(
          operators.GraphIndex.topK(spark, h, qv, 10, tieBreak = Seq("uid")).count())
        time(s"GraphIndex serve (warm) $nv vecs")(
          operators.GraphIndex.topK(spark, h, qv, 10, tieBreak = Seq("uid")).count())
        vecs.unpersist()
      }
    }

    // compaction payoff: incremental inserts append a file set to every
    // touched bucket, and a cold walk's pruned hop opens EVERY file in
    // its buckets — serve latency rides files-per-bucket, which is the
    // whole case for the segment-merge pass. Build on half the corpus,
    // drip the other half in as 20 insert batches, serve, compact,
    // serve again: latency must drop and content must be unchanged.
    {
      val e0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val dir = java.nio.file.Files.createTempDirectory("graft_gcmp_probe").toString
      val batchSize = 50
      operators.GraphIndex.build(spark,
        e0.filter(col("vec_id") >= 20 * batchSize), Seq("vec_id"), "embedding",
        dir, nCentroids = 16, m = 4, nBuckets = 16, beamWidth = 8, hops = 3)
      val h = operators.GraphIndex.Handle(dir, 16, beamWidth = 8, hops = 3, m = 4)
      time("graph insert x20 batches")({
        for (b <- 0 until 20)
          operators.GraphIndex.insert(spark, h,
            e0.filter(col("vec_id") >= b * batchSize && col("vec_id") < (b + 1) * batchSize),
            Seq("vec_id"), "embedding")
        20L * batchSize
      })
      def maxFiles(d: String): Int =
        new java.io.File(d).listFiles()
          .filter(f => f.isDirectory && !f.getName.startsWith("_"))
          .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
      val qv = e0.filter(col("vec_id") === 9)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      println(s"  sprawled: ${maxFiles(dir + "/edges")} files/bucket (edges), " +
        s"${maxFiles(dir + "/chunks")} (chunks)")
      val sprawled = operators.GraphIndex.topK(spark, h, qv, 10, tieBreak = Seq("uid"))
        .collect().map(_.getLong(0)).toSeq
      time("serve sprawled store (cold)")(
        operators.GraphIndex.topK(spark, h, qv, 10, tieBreak = Seq("uid")).count())
      time("compact store")({ operators.GraphIndex.compact(spark, h); 1L })
      println(s"  compacted: ${maxFiles(dir + "/edges")} files/bucket (edges), " +
        s"${maxFiles(dir + "/chunks")} (chunks)")
      val compacted = operators.GraphIndex.topK(spark, h, qv, 10, tieBreak = Seq("uid"))
        .collect().map(_.getLong(0)).toSeq
      time("serve compacted store (cold)")(
        operators.GraphIndex.topK(spark, h, qv, 10, tieBreak = Seq("uid")).count())
      println(s"  compaction preserved results: ${sprawled == compacted} (must be true)")
    }

    // BM25 serving split: the ad-hoc scorer tokenizes the WHOLE corpus
    // per query (cost grows with corpus size); the persisted postings
    // probe reads only the query terms' buckets (cost rides matched
    // rows). Same scores by construction (RetrievalSpec pins bitwise).
    {
      for (n <- Seq(1, 4)) {
        val docs = stack(n).persist(); val nd = docs.count()
        time(s"bm25 ad-hoc scan ${nd} docs")(
          operators.Retrieval.bm25(docs, "doc_id", "text",
            "vector window agg filter").count())
        val idx = java.nio.file.Files.createTempDirectory("graft_bm25_probe").toString
        time(s"bm25 index build ${nd} docs")(
          { operators.Retrieval.writeBm25Index(docs, "doc_id", "text", idx, 64); nd })
        time(s"bm25 index probe ${nd} docs")(
          operators.Retrieval.bm25FromIndex(spark, idx, "doc_id",
            "vector window agg filter").count())
        time(s"bm25 index probe ${nd} docs (2nd)")(
          operators.Retrieval.bm25FromIndex(spark, idx, "doc_id",
            "vector window agg filter").count())
        docs.unpersist()
      }
    }

    // vector-scan throughput: exact top-k over 1M replicated vectors
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val big = e.crossJoin(spark.range(500).select(col("id").as("_rep")))
      .select((col("vec_id") + col("_rep") * 100000L).as("vec_id"), col("embedding"))
      .repartition(32).persist()
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    time("materialize 1M vectors")(big.count())
    time("exact top-10 over 1M")(operators.Similarity.topK(big, "embedding", qv, 10).count())
    time("exact top-10 over 1M (warm)")(operators.Similarity.topK(big, "embedding", qv, 10).count())
    big.unpersist()
    spark.stop()
  }
}
