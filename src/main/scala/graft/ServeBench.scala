package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serve-only latency benchmark for the warm graph index on the
  * reference's real corpus — the number the reference actually
  * publishes (`< 3.5 s` end-to-end ask, README.md:3,181) is a SERVING
  * latency, while the engine's bench rows for the graph family are
  * build-dominated (they construct the store inside the query so the
  * oracle can replay it). This main separates the two:
  *
  *   ingest + build + warm ONCE (reported, not benchmarked), then
  *   measure the ask latency distribution over 64 in-domain queries
  *   at batch sizes 1 / 8 / 32 against a fresh (empty) cache per ask —
  *   retrieval latency, never cache-hit latency.
  *
  * Query vectors are pre-embedded outside the timers (the reference's
  * embed call is an external service; PmcDemo times it the same way),
  * so the measured span is: cache probe → warm beam walk → sidecar
  * re-attach → context assembly → prompt → generation stub.
  *
  * Prints per-mode p50/p95/max and one machine-readable JSON line.
  * Run: `sbt "runMain graft.ServeBench"` (read-only on /root/reference).
  */
object ServeBench {
  private def pct(sorted: Seq[Double], p: Double): Double =
    sorted(math.min(sorted.length - 1, math.ceil(p * sorted.length).toInt - 1))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val t0 = System.nanoTime()
    val docs = sources.CorpusSource.scanWithCharsetFallback(
      spark, "/root/reference/PMC", "PMC*.txt").toDF()
    val chunks = operators.Ingest.chunk(
        docs.filter(operators.Ingest.nonBlank(col("text"))), "text", Schemas.ChunkSize)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
    val (embedded, dfreq, nDocs) =
      operators.Embed.withTfIdfEmbedding(chunks, "chunk_text", "embedding", dim = 1024)
    val index = embedded.persist()
    val nChunks = index.count()
    val gdir = java.nio.file.Files.createTempDirectory("serve_graph").toString
    // sqrt-N codebook (PmcRecallProbe: recall@10 = 0.98 here vs 0.32
    // at the 64-centroid setting this bench first shipped with —
    // latency numbers are only meaningful at a serving-grade recall)
    val h = operators.GraphIndex.build(spark, index, Seq("doc_id", "chunk_idx"),
      "embedding", gdir, nCentroids = 181, m = 16, nBuckets = 64,
      beamWidth = 32, hops = 3)
    val wh = operators.GraphIndex.warm(spark, h)
    println(f"SETUP chunks=$nChunks ingest+build+warm=${(System.nanoTime() - t0) / 1e9}%.1f s")

    // 64 deterministic in-domain queries: the first 8 words of the
    // first chunk of the first 64 docs (by doc_id) — realistic phrasing
    // pulled from the corpus itself, no RNG.
    val queries = index.filter(col("chunk_idx") === 0)
      .orderBy("doc_id").select("chunk_text").limit(64)
      .as[String].collect()
      .map(_.split("\\s+").filter(_.nonEmpty).take(8).mkString(" ")).toSeq
    val qvecs = queries.map(q =>
      operators.Embed.embedQueryTfIdf(spark, q, dfreq, nDocs, dim = 1024))
    val emptyCache = Seq.empty[(Long, Seq[Float], String, Int)]
      .toDF("entry_id", "embedding", "response", "freq")

    // warmup: JIT + codegen + cached-batch touch, outside every timer
    (0 until 3).foreach { i =>
      operators.AskPipeline.ask(spark, index, emptyCache, queries(i),
        queryVec = Some(qvecs(i)), graph = Some(wh))
    }

    def stats(lat: Seq[Double]): (Double, Double, Double) = {
      val s = lat.sorted
      (pct(s, 0.50), pct(s, 0.95), s.last)
    }

    // batch=1: 64 solo asks, fresh cache each (retrieval, not cache hits)
    val solo = queries.indices.map { i =>
      val t = System.nanoTime()
      operators.AskPipeline.ask(spark, index, emptyCache, queries(i),
        queryVec = Some(qvecs(i)), graph = Some(wh))
      (System.nanoTime() - t) / 1e9
    }
    val (s50, s95, sMax) = stats(solo)
    println(f"SERVE solo   n=${solo.length} p50=$s50%.3f p95=$s95%.3f max=$sMax%.3f s/ask")

    def batched(size: Int): (Seq[Double], Double, Double, Double) = {
      val lat = queries.indices.grouped(size).filter(_.length == size).map { g =>
        val t = System.nanoTime()
        operators.AskPipeline.askBatch(spark, index, emptyCache,
          g.map(queries), queryVecs = Some(g.map(qvecs)), graph = Some(wh))
        (System.nanoTime() - t) / 1e9
      }.toSeq
      val (p50, p95, mx) = stats(lat)
      (lat, p50, p95, mx)
    }
    val (b8, b8p50, b8p95, b8max) = batched(8)
    println(f"SERVE batch8 n=${b8.length} p50=$b8p50%.3f p95=$b8p95%.3f max=$b8max%.3f s/batch " +
      f"(${b8p50 / 8}%.3f s/ask at p50)")
    val (b32, b32p50, b32p95, b32max) = batched(32)
    println(f"SERVE batch32 n=${b32.length} p50=$b32p50%.3f p95=$b32p95%.3f max=$b32max%.3f s/batch " +
      f"(${b32p50 / 32}%.3f s/ask at p50)")

    println(s"""{"bench":"serve_only","corpus":"PMC","chunks":$nChunks,""" +
      f""""solo":{"n":${solo.length},"p50":$s50%.3f,"p95":$s95%.3f,"max":$sMax%.3f},""" +
      f""""batch8":{"n":${b8.length},"p50":$b8p50%.3f,"p95":$b8p95%.3f,"max":$b8max%.3f},""" +
      f""""batch32":{"n":${b32.length},"p50":$b32p50%.3f,"p95":$b32p95%.3f,"max":$b32max%.3f},""" +
      f""""per_ask_p50":{"solo":$s50%.3f,"batch8":${b8p50 / 8}%.3f,"batch32":${b32p50 / 32}%.3f}}""")
    wh.cool()
    spark.stop()
  }
}
