package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Scan → clean → chunk (SURVEY.md §2 O-1..O-10).
  *
  * Reference semantics: whitespace-split into consecutive groups of
  * `chunkSize` words, rejoined with single spaces; the final chunk may be
  * short; an empty document produces zero chunks (`chunk_text`
  * app/main.py:383-393, app/embedding_gen.py:128-137; CHUNK_SIZE=512
  * app/main.py:37).
  *
  * Implementation is a pure one-to-many projection (`posexplode` over a
  * computed array) — no shuffle, fully codegen'd, and scales linearly:
  * chunking 100 TB of documents is map-only work.
  */
object Ingest {

  /** Corpus directory scan (O-1): whole-file-per-row text read with the
    * filename as doc_id — reference `build_embeddings_from_scratch`
    * app/main.py:413-456 (PMC*.txt filter app/main.py:431). */
  def scanCorpus(spark: SparkSession, dir: String, glob: String = "*.txt"): DataFrame =
    spark.read
      .option("wholetext", "true")
      .option("pathGlobFilter", glob)
      .text(dir)
      .select(
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("doc_id"),
        col("value").as("text"))

  /** Chunk a text column into (chunk_idx, chunk_text) rows, keeping all
    * other columns. Defaults to the reference's 512-word chunks. */
  def chunk(df: DataFrame, textCol: String, chunkSize: Int = graft.Schemas.ChunkSize): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val df2 = df.withColumn("_words", tokens(col(textCol)))
    val nChunks = ceil(size(col("_words")).cast("double") / chunkSize).cast("int")
    // Guard sequence(): sequence(0, -1) would count DOWN; empty docs must
    // produce an empty array so posexplode emits zero rows for them.
    val idxs = when(nChunks > 0, sequence(lit(0), nChunks - 1)).otherwise(array().cast("array<int>"))
    val chunks = transform(idxs, i => array_join(slice(col("_words"), i * chunkSize + 1, lit(chunkSize)), " "))
    df2
      .select(col("*"), posexplode(chunks).as(Seq("chunk_idx", "chunk_text")))
      .drop("_words")
  }

  /** Validity predicate (O-9): non-blank text. */
  def nonBlank(textCol: Column): Column = length(trim(textCol)) > 0

  /** doc_id derivation for uploads (O-3): `stem_unixtime`
    * (app/embedding_gen.py:356-358). Timestamp injected for determinism
    * (SURVEY §5 F-6). */
  def uploadDocId(fileName: Column, uploadTs: Column): Column =
    concat_ws("_", regexp_extract(fileName, "([^/]+?)(\\.[^./]*)?$", 1), uploadTs)
}
