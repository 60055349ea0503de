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

    val queries = index.filter(col("chunk_idx") === 0)
      .orderBy("doc_id").select("chunk_text").limit(20)
      .as[String].collect()
      .map(_.split("\\s+").filter(_.nonEmpty).take(8).mkString(" ")).toSeq
    val qvecs = queries.map(q =>
      operators.Embed.embedQueryTfIdf(spark, q, dfreq, nDocs, dim = 1024).toSeq)

    val exact: Seq[Set[(String, Int)]] = qvecs.map { qv =>
      operators.Similarity.topK(index, "embedding", qv, 10,
          tieBreak = Seq("doc_id", "chunk_idx"))
        .select("doc_id", "chunk_idx").as[(String, Int)].collect().toSet
    }

    for (nc <- Seq(64, 181)) {
      val gdir = java.nio.file.Files.createTempDirectory(s"pmc_recall_$nc").toString
      val t0 = System.nanoTime()
      val h = operators.GraphIndex.build(spark, index, Seq("doc_id", "chunk_idx"),
        "embedding", gdir, nCentroids = nc, m = 16, nBuckets = 64,
        beamWidth = 32, hops = 3)
      val wh = operators.GraphIndex.warm(spark, h)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val recalls = qvecs.zip(exact).map { case (qv, truth) =>
        val got = wh.topK(spark, qv, 10, tieBreak = Seq("doc_id", "chunk_idx"))
          .select("doc_id", "chunk_idx").as[(String, Int)].collect().toSet
        truth.intersect(got).size / 10.0
      }
      println(f"|C|=$nc%4d m=16 beam=32 hops=3: mean recall@10 = " +
        f"${recalls.sum / recalls.length}%.3f (min ${recalls.min}%.2f), " +
        f"build+warm $tBuild%.1f s")
      wh.cool()
    }
    spark.stop()
  }
}
