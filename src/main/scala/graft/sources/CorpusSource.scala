package graft.sources

import java.nio.charset.{CharacterCodingException, StandardCharsets}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus scan with the reference's charset semantics (SURVEY.md §2 O-1):
  * whole file as one row, filename as doc_id, UTF-8 decode with a latin-1
  * fallback (app/main.py:433-438).
  *
  * Strict-UTF-8-or-fallback can't be expressed with the lenient `text`
  * source (it silently replaces bad bytes), so this path reads
  * `binaryFile` and decodes per row with a strict CharsetDecoder — still
  * fully distributed; the decode is per-partition work. */
object CorpusSource {

  case class CorpusDoc(doc_id: String, text: String, charset: String)

  private[sources] def decodeWithFallback(bytes: Array[Byte]): (String, String) = {
    val dec = StandardCharsets.UTF_8.newDecoder() // strict by default
    try {
      (dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString, "utf-8")
    } catch {
      case _: CharacterCodingException =>
        (new String(bytes, StandardCharsets.ISO_8859_1), "latin-1")
    }
  }

  /** Scan a directory of text files (default `PMC*.txt` like the
    * reference, app/main.py:431) with strict-UTF-8 → latin-1 decode. */
  def scanWithCharsetFallback(spark: SparkSession, dir: String,
                              glob: String = "PMC*.txt"): Dataset[CorpusDoc] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("doc_id"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (id, bytes) =>
        val (text, cs) = decodeWithFallback(bytes)
        CorpusDoc(id, text, cs)
      }
  }

  /** Lenient fast path (pure built-ins) when the corpus is known-UTF-8. */
  def scan(spark: SparkSession, dir: String, glob: String = "PMC*.txt"): DataFrame =
    graft.operators.Ingest.scanCorpus(spark, dir, glob)
}
