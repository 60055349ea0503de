package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Schemas
import graft.functions.VectorFunctions._

/** The reference's full `/ask` lifecycle as a batch engine op
  * (SURVEY.md §3.1, app/main.py:467-548):
  *
  *   embed query → semantic-cache probe (early exit) → k-NN retrieval →
  *   context assembly → prompt (with chat history) → generation →
  *   cache insert (LFU-evict if full).
  *
  * Generation is the one reference stage backed by an external LLM; here
  * it's a deterministic extractive stub ([[generateStub]]) with the same
  * dataflow position and signature, so the pipeline's shape — including
  * the cache round-trip the reference uses to skip generation — is fully
  * testable. The cache is versioned state (input table → output table),
  * per CacheLfu's batch semantics.
  */
object AskPipeline {

  case class AskResult(query: String, answer: String, fromCache: Boolean, prompt: String)

  /** Deterministic stand-in for the LLM call (app/main.py:537-541):
    * extract the first sentence-ish span of the top-ranked context. */
  def generateStub(contextText: String, maxWords: Int = 30): String = {
    val body = contextText.linesIterator
      .filterNot(_.startsWith("--- Document ID:"))
      .mkString(" ")
    val words = body.split("\\s+").filter(_.nonEmpty).take(maxWords)
    if (words.isEmpty) "No relevant context found."
    else words.mkString(" ") + " …"
  }

  /** One ask round. Returns the result and the updated cache table.
    *
    * `index` is the embedded chunk index (doc_id, chunk_idx, chunk_text,
    * embedding); `cache` follows Schemas.cacheEntry. The early-exit gate
    * is driver-side `if` around actions — exactly the reference's control
    * flow (cheap: the probe is a broadcast argmax over ≤1000 rows).
    *
    * With `graph` set, retrieval routes through the pre-built
    * [[GraphIndex]] store instead of the exact corpus scan — the
    * reference's real serving shape (HNSW behind the ask): per-query
    * work becomes a frontier-pruned beam walk whose cost is independent
    * of index size, and `index` is only consulted by the fallback
    * (None) path. */
  def ask(spark: SparkSession, index: DataFrame, cache: DataFrame, query: String,
          history: Option[String] = None, topK: Int = Schemas.DefaultTopK,
          threshold: Double = Schemas.CacheThreshold,
          capacity: Int = Schemas.CacheCapacity,
          dim: Int = Schemas.EmbeddingDim,
          queryVec: Option[Array[Double]] = None,
          graph: Option[GraphIndex.Serving] = None): (AskResult, DataFrame) = {
    // queryVec overrides the default embedder — e.g. a TF-IDF-space vector
    // from Embed.embedQueryTfIdf when the index was built in that space
    val qVec = queryVec.getOrElse(Embed.embedQuery(spark, query, dim))

    val hit = Similarity.cacheLookup(cache, "embedding", qVec.toSeq, threshold)
      .select("entry_id", "response").collect().headOption

    hit match {
      case Some(row) =>
        // cache hit: return cached answer, bump the hit entry's freq
        // (by id — the lookup above already paid for the cosine scan)
        val updated = CacheLfu.touchById(cache, row.getLong(0))
        (AskResult(query, row.getString(1), fromCache = true, prompt = ""), updated)

      case None =>
        val hits = (graph match {
          case Some(h) => h.topK(spark, qVec.toSeq, topK,
            tieBreak = Seq("doc_id", "chunk_idx"))
          case None => Similarity.topK(index, "embedding", qVec.toSeq, topK,
            tieBreak = Seq("doc_id", "chunk_idx"))
        })
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(desc("sim"), col("doc_id"), col("chunk_idx"))))
        val ctx = Retrieval.renderContext(
          Retrieval.assembleContext(hits, "doc_id", "rank", "chunk_text"), "doc_id")
        val blocks = ctx.orderBy("best_rank")
          .select("context_block").collect().map(_.getString(0))
        val contextText = blocks.mkString("\n\n")
        val prompt = Retrieval.buildPrompt(
          spark.createDataFrame(java.util.List.of[org.apache.spark.sql.Row](
            org.apache.spark.sql.Row(query, contextText)),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("query", org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("context", org.apache.spark.sql.types.StringType))))
            .withColumn("hist", lit(history.getOrElse(""))),
          "query", "context", history.map(_ => "hist"))
          .select("prompt").head().getString(0)

        val answer = generateStub(blocks.headOption.getOrElse(""))

        import spark.implicits._
        val nextId = cache.agg(coalesce(max("entry_id"), lit(0L)).as("m")).head().getLong(0) + 1
        val entry = Seq((nextId, qVec.map(_.toFloat).toSeq, answer, 1))
          .toDF("entry_id", "embedding", "response", "freq")
        val updated = CacheLfu.put(cache, entry, capacity)
        (AskResult(query, answer, fromCache = false, prompt), updated)
    }
  }
}
