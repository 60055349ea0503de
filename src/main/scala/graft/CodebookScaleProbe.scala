package graft

import org.apache.spark.sql.functions._

/** Dev probe backing the sf1 rehearsal's one super-linear finding: the
  * bench queries pin their IVF/graph codebooks to 8 entry centroids so
  * the DuckDB oracle can replay the assignment — at 10× data that
  * FIXED codebook makes cells grow linearly and the cell-confined
  * pairwise stage quadratically (q_semantic_dedup 1.49 s → 52.3 s;
  * q_rag_graph's 13k-row cells OOM the knnGraph window sort).
  *
  * The operators take the codebook size as a parameter; the production
  * discipline is |C| ~ √N (total pairwise work N·√N, cells stay
  * O(√N)). This probe measures the same sf1 inputs with a √N codebook:
  * semantic dedup back to seconds, and the graph build that OOM'd at
  * |C|=8 completing comfortably. Run after [[ScaleUpData]]:
  * `runMain graft.CodebookScaleProbe [sf1Dir]`. */
object CodebookScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    // semantic dedup over sf1 embeddings (the q_semantic_dedup shape)
    val base = sources.TableLoader.load(spark, sf1, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planted = base.filter(col("vec_id") < 100)
      .select((col("vec_id") + 10000000L).as("vec_id"), col("embedding"))
    val all = base.unionByName(planted).persist()
    val n = all.count()
    val sqrtN = math.max(8, math.sqrt(n.toDouble).toInt)
    println(s"embeddings n=$n, sqrt-N codebook=$sqrtN")
    val cents8 = base.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec"))
    val centsSqrt = operators.Ann.headCentroids(all, "vec_id", "embedding", sqrtN)
      .withColumnRenamed("centroid_vec", "cvec")
    // noop write, NOT count(): dedup's output is a left-outer join
    // against an aggregate that is provably unique on the join key, so
    // a count() lets Catalyst ELIMINATE the whole pairwise subtree and
    // time an empty plan (this probe's first version did exactly that)
    time(s"semanticDedup |C|=8 (bench-query codebook)")(
      { operators.SemanticDedup.dedup(all, "vec_id", "embedding",
          cents8, "centroid_id", "cvec", tau = 0.9)
          .write.mode("overwrite").format("noop").save(); n })
    time(s"semanticDedup |C|=$sqrtN (sqrt-N codebook)")(
      { operators.SemanticDedup.dedup(all, "vec_id", "embedding",
          centsSqrt, "centroid_id", "cvec", tau = 0.9)
          .write.mode("overwrite").format("noop").save(); n })
    all.unpersist()

    // graph build over sf1 chunks (the q_rag_graph shape that OOM'd at
    // |C|=8): sqrt-N codebook, then a warm search for sanity
    val chunks = operators.Ingest.chunk(
        sources.TableLoader.load(spark, sf1, "documents").select("doc_id", "text"),
        "text", 32)
      .select("doc_id", "chunk_idx", "chunk_text")
    val embedded = Materialize(
      operators.Embed.withEmbedding(chunks, "chunk_text", "embedding"))
    val nc = embedded.count()
    val sqrtNc = math.sqrt(nc.toDouble).toInt
    println(s"chunks n=$nc, sqrt-N codebook=$sqrtNc")
    val gdir = java.nio.file.Files.createTempDirectory("codebook_probe").toString
    var h: operators.GraphIndex.Handle = null
    time(s"GraphIndex.build |C|=$sqrtNc m=8")(
      { h = operators.GraphIndex.build(spark, embedded, Seq("doc_id", "chunk_idx"),
          "embedding", gdir, nCentroids = sqrtNc, m = 8, nBuckets = 64,
          beamWidth = 8, hops = 3); nc })
    time("graph search (cold store)")(
      operators.GraphIndex.search(spark, h,
        operators.Embed.embedQuery(spark, "fast table scan merge join").toSeq).count())

    // CODEBOOK TRAINING COST at the sqrt-N discipline (round-12 verdict
    // item 4): kmeansRefine at |C|=sqrt(N) is N·|C| dots per Lloyd
    // round — at N=1e9 that is LARGER than the build's own assignment
    // stage, so the sampled trainer (fit on a hashed fraction, assign
    // everything) is the production path. Measured here: full-corpus
    // training vs frac=0.1 / frac=0.02, wall time plus the quality a
    // consumer sees (mean cell_sim of the FULL corpus assigned against
    // each trained book).
    locally {
      val e = sources.TableLoader.load(spark, sf1, "embeddings")
        .select(col("vec_id"), col("embedding")).persist()
      val ne = e.count()
      val cN = math.max(8, math.sqrt(ne.toDouble).toInt)
      val dim = e.select(size(col("embedding"))).head().getInt(0)
      val seeds = operators.Ann.headCentroids(e, "vec_id", "embedding", cN)
      println(s"train-cost probe: N=$ne |C|=$cN dim=$dim (2 Lloyd rounds)")
      def quality(cents: org.apache.spark.sql.DataFrame): Double =
        operators.Ann.assignCells(e, "vec_id", "embedding",
            cents, "centroid_id", "centroid_vec")
          .agg(avg("cell_sim")).head().getDouble(0)
      Seq(1.0, 0.1, 0.02).foreach { frac =>
        val t0 = System.nanoTime()
        val cents = operators.Ann.kmeansRefine(e, "vec_id", "embedding",
          seeds, dim, iters = 2, sampleFrac = frac)
        val nCents = cents.count() // materialize the training
        val tTrain = (System.nanoTime() - t0) / 1e9
        val q = quality(cents)
        println(f"kmeansRefine frac=$frac%.2f: train=$tTrain%7.2f s " +
          f"cells=$nCents mean cell_sim (full corpus)=$q%.4f")
      }
      e.unpersist()
    }
    spark.stop()
  }
}
