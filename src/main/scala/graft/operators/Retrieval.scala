package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Context assembly + prompt build + the end-to-end ask pipeline
  * (SURVEY.md §2 O-14, F-8; lifecycle §3.1).
  *
  * Reference: hits grouped by doc_id, chunk texts concatenated with "\n"
  * in retrieval-score order, rendered as "--- Document ID: X ---" blocks
  * (app/main.py:498-513), then a prompt of system rules + query + context
  * (app/main.py:519-535).
  *
  * Ordered string-agg in Spark: `collect_list` order is nondeterministic
  * after a shuffle, so we collect `struct(rank, text)` and `array_sort`
  * inside the row before joining — deterministic regardless of
  * partitioning, and still a single hash-aggregate (one shuffle).
  */
object Retrieval {

  /** Group ranked hits by doc, concatenate texts in rank order. */
  def assembleContext(hits: DataFrame, docCol: String, rankCol: String,
                      textCol: String): DataFrame =
    hits
      .groupBy(col(docCol))
      .agg(
        min(col(rankCol)).as("best_rank"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(rankCol).as("r"), col(textCol).as("t")))),
            s => s.getField("t")),
          "\n").as("context_text"))

  /** Render the per-document context blocks (app/main.py:509-513). */
  def renderContext(assembled: DataFrame, docCol: String): DataFrame =
    assembled.withColumn(
      "context_block",
      format_string("--- Document ID: %s ---\n%s", col(docCol).cast("string"), col("context_text")))

  /** Prompt projection (F-8): system rules + optional history + query +
    * context — shape of app/main.py:519-535. */
  def buildPrompt(df: DataFrame, queryCol: String, contextCol: String,
                  historyCol: Option[String] = None): DataFrame = {
    val history = historyCol.map(h => concat(lit("Conversation so far:\n"), col(h), lit("\n\n")))
      .getOrElse(lit(""))
    df.withColumn(
      "prompt",
      concat(
        lit("You are a helpful medical assistant. Use ONLY the provided context to answer.\n\n"),
        history,
        lit("User Query:\n"), col(queryCol),
        lit("\n\nContext:\n"), col(contextCol),
        lit("\n\nAnswer:")))
  }

  /** The flagship pipeline (§3.1 / §7.2): documents → clean → chunk →
    * embed → normalize → cosine vs embedded query → top-k → context →
    * prompt. One job; shuffles only at top-k merge and the context
    * group-by. */
  def ask(spark: SparkSession, documents: DataFrame, query: String, topK: Int = graft.Schemas.DefaultTopK,
          chunkSize: Int = 64, dim: Int = graft.Schemas.EmbeddingDim): DataFrame = {
    val chunks = Ingest.chunk(documents.filter(Ingest.nonBlank(col("text"))), "text", chunkSize)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
    val embedded = Embed.withEmbedding(chunks, "chunk_text", "embedding", dim)
    val qVec = Embed.embedQuery(spark, query, dim)
    val hits = Similarity.topK(embedded, "embedding", qVec.toSeq, topK,
      tieBreak = Seq("doc_id", "chunk_idx"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(desc("sim"), col("doc_id"), col("chunk_idx"))))
    val ctx = renderContext(assembleContext(hits, "doc_id", "rank", "chunk_text"), "doc_id")
    val oneCtx = ctx
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("best_rank").as("r"), col("context_block").as("b")))),
          s => s.getField("b")),
        "\n\n").as("context"))
      .withColumn("query", lit(query))
    buildPrompt(oneCtx, "query", "context")
  }
}
