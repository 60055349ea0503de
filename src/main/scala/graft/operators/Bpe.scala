package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{cleanText, tokens}

/** Byte-pair-encoding tokenizer TRAINING and ENCODING over a corpus —
  * the "train the tokenizer on the data" step of an LLM pipeline,
  * expressed with the engine's scale discipline.
  *
  * Scale shape: the only corpus-sized work is ONE shuffle — the
  * word-type count aggregation (map-side combined `(word, n)` rows,
  * never text). The merge-learning loop then runs driver-side over the
  * collected TYPE table, which is vocab-sized (unique words, counts) —
  * the same "collect is correct here" call as the PQ codebooks: GPT-2's
  * own trainer is a single process over exactly this table. `maxTypes`
  * caps driver memory explicitly (most-frequent types first;
  * deterministic ties by word).
  *
  * Determinism: merge selection ties break (count desc, pair
  * lexicographic asc); merge application is the standard left-to-right
  * scan; no RNG anywhere — the same corpus always yields the same merge
  * list, on any cluster size.
  */
object Bpe {

  /** The BPE word stream: lowercase, cleaned, whitespace-tokenized, with
    * U+0002/U+0003 (STX/ETX — the oracle's symbol brackets, and raw
    * control bytes no tokenizer should preserve) stripped at the text
    * level. Shared by train and encode so they can never drift. */
  private def bpeWords(textCol: String) =
    tokens(lower(cleanText(regexp_replace(col(textCol), "[\\u0002\\u0003]", ""))))

  /** Word-type counts — the one corpus-sized aggregation. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(bpeWords(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))

  /** Standard left-to-right single-merge application. */
  private[graft] def mergeOnce(syms: IndexedSeq[String], a: String,
                                   b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Learn `numMerges` merges from the corpus. Stops early when no pair
    * reaches `minPairCount` (weighted by type frequency). */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L, maxTypes: Int = 1000000): Seq[(String, String)] = {
    require(numMerges >= 0, s"train: numMerges must be >= 0, got $numMerges")
    val types: Array[(IndexedSeq[String], Long)] =
      wordCounts(docs, textCol)
        .orderBy(desc("n"), col("w")).limit(maxTypes)
        .collect()
        .map(r => (r.getString(0).map(_.toString).toIndexedSeq, r.getLong(1)))
    var cur = types
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      cur.foreach { case (syms, n) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      // (count desc, pair asc) — total order, engine-independent
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .headOption.filter(_._2 >= minPairCount)
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          merges += ((a, b))
          cur = cur.map { case (syms, n) => (mergeOnce(syms, a, b), n) }
          round += 1
      }
    }
    merges.result()
  }

  /** Apply a learned merge list to one word (merges in learned order —
    * rank order — as standard BPE encoders do). */
  private[graft] def encodeWord(word: String,
                                    merges: Seq[(String, String)]): IndexedSeq[String] = {
    var syms: IndexedSeq[String] = word.map(_.toString).toIndexedSeq
    merges.foreach { case (a, b) => if (syms.length > 1) syms = mergeOnce(syms, a, b) }
    syms
  }

  /** Encode a text column: `outCol` becomes the array of BPE tokens
    * (all words' symbols, concatenated in word order). Map-only — the
    * merge list rides the closure as a broadcast-sized constant; the
    * per-word merge scan is inherently sequential, so this is one of
    * the engine's few justified `Dataset.map` sites (same class as the
    * batched embedder's mapPartitions). */
  def withBpeTokens(docs: DataFrame, textCol: String, outCol: String,
                    merges: Seq[(String, String)]): DataFrame = {
    // words come from the SAME tokenizer expression train() used
    // (bpeWords), so encode and train can never drift on tokenization
    // rules — including the STX/ETX strip that keeps the word stream
    // byte-identical to the bracketed-replace oracle.
    val withWords = docs.withColumn("_bpe_words", bpeWords(textCol))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(withWords.schema.add(outCol, "array<string>"))
    withWords.map { row =>
      // null text -> null word array -> encode to zero tokens (the
      // oracle's coalesce(n_tok, 0) / NULL head_tok shape)
      val words = Option(row.getAs[scala.collection.Seq[String]]("_bpe_words"))
        .getOrElse(scala.collection.Seq.empty[String])
      val toks = words.toIndexedSeq.flatMap(w => encodeWord(w, merges))
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ toks)
    }(enc).drop("_bpe_words")
  }
}
