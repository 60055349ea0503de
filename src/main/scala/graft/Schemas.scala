package graft

import org.apache.spark.sql.types._

/** Explicit schemas for the engine's data plane (SURVEY.md §1.4 — the
  * reference keeps schemas implicit in code; we declare them once).
  *
  * Reference evidence: document/chunk shapes `app/main.py:383-393`,
  * vector-index row `app/main.py:263-281`, cache entry `app/main.py:123`.
  */
object Schemas {
  val EmbeddingDim = 64 // testdata dim (reference uses 1024, app/main.py:38)
  val ChunkSize = 512 // words per chunk (app/main.py:37)
  val CacheCapacity = 1000 // app/main.py:42
  val CacheThreshold = 0.96 // inclusive hit threshold (app/main.py:44,89)
  val DefaultTopK = 3 // app/main.py:467,601

  val embeddingType: ArrayType = ArrayType(FloatType, containsNull = false)

  val rawDocument: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("user_id", StringType, nullable = true)))

  val chunk: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  val embeddedChunk: StructType = StructType(chunk.fields ++ Seq(
    StructField("embedding", embeddingType, nullable = false),
    StructField("user_id", StringType, nullable = true)))

  val cacheEntry: StructType = StructType(Seq(
    StructField("entry_id", LongType, nullable = false),
    StructField("embedding", embeddingType, nullable = false),
    StructField("response", StringType, nullable = false),
    StructField("freq", IntegerType, nullable = false)))

  val user: StructType = StructType(Seq(
    StructField("id", StringType, nullable = true),
    StructField("email", StringType, nullable = true)))
}

/** Typed rows for Dataset[T] APIs (state ops need Encoders). */
case class RawDocument(doc_id: String, text: String, user_id: Option[String] = None)
case class Chunk(doc_id: String, chunk_idx: Int, text: String)
case class CacheEntry(entry_id: Long, embedding: Seq[Float], response: String, freq: Int)
case class ChatTurn(chat_id: String, input: String, output: String, turn: Int)
case class QueryRequest(user_id: String, chat_id: String, query: String, top_k: Int = Schemas.DefaultTopK)
