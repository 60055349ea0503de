package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Embed, Ingest, Sampling}

/** Executable shuffle budgets: the scale claims made in Scaladoc/SCALE.md
  * measured in actual bytes over the sf0.001 corpus. */
class ShuffleAuditSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "source", "text")

  private lazy val corpusTextBytes: Long = docs
    .agg(sum(length(col("text")))).head().getLong(0)

  test("chunk -> embed is shuffle-free end to end") {
    val pipeline = Embed.withEmbedding(
      Ingest.chunk(docs.select("doc_id", "text"), "text", 64)
        .select("doc_id", "chunk_idx", "chunk_text"),
      "chunk_text", "embedding")
    val s = ShuffleAudit.of(pipeline)
    assert(s.writeBytes == 0L && s.readBytes == 0L,
      s"map-only pipeline shuffled: $s")
  }

  test("hash sampling is shuffle-free") {
    val s = ShuffleAudit.of(Sampling.hashSample(docs, "doc_id", 0.25))
    assert(s.writeBytes == 0L, s"sampling shuffled: $s")
  }

  test("exact dedup shuffles fingerprints, not text") {
    val s = ShuffleAudit.of(Dedup.exact(docs, "doc_id", "text"))
    assert(s.writeBytes > 0, "expected a hash-agg shuffle")
    // (fingerprint, id, count) rows: a small fraction of the corpus text
    assert(s.writeBytes < corpusTextBytes / 5,
      s"dedup shuffled ${s.writeBytes} bytes vs $corpusTextBytes corpus bytes")
  }

  test("minhash signatures shuffle pre-aggregated rows, not exploded shingles") {
    val sigs = Dedup.withMinhashSignature(docs, "doc_id", "text")
    val s = ShuffleAudit.of(sigs)
    assert(s.writeBytes > 0)
    // map-side combine: one (id, 8 hashes) row per group per partition —
    // the shuffle must stay well under the raw text volume
    assert(s.writeBytes < corpusTextBytes,
      s"minhash shuffled ${s.writeBytes} vs corpus $corpusTextBytes")
    // and the record count must be near |docs|, nowhere near |shingles|
    val nDocs = docs.count()
    assert(s.recordsRead < nDocs * 40,
      s"records ${s.recordsRead} suggests shingles were shuffled (docs=$nDocs)")
  }
}
