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
  * guards driver memory: past it, training switches to a
  * distributed-exact per-round pair-count aggregation instead of
  * truncating (see [[train]]) — identical merges, no dropped mass.
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
    * reaches `minPairCount` (weighted by type frequency).
    *
    * `maxTypes` is a driver-memory GUARD, not an approximation knob:
    * when the type table fits, the merge loop runs driver-side over the
    * collected table (GPT-2's own trainer is a single process over
    * exactly this table); when it does NOT fit, training switches to
    * the DISTRIBUTED-EXACT path — one `(pair, count)` aggregation per
    * round over the full type table — so no type mass is ever silently
    * dropped at any corpus size. Both paths use the identical
    * (count desc, pair asc) tie order, so they learn the same merges
    * (BpeSpec pins equality across the switch; ASCII tokens — the
    * lowercased word stream — order identically under Java-String and
    * UTF8-binary comparison). */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L, maxTypes: Int = 1000000): Seq[(String, String)] = {
    require(numMerges >= 0, s"train: numMerges must be >= 0, got $numMerges")
    val wc = wordCounts(docs, textCol).persist()
    try {
      val nTypes = wc.count()
      if (nTypes <= maxTypes) {
        val types: Array[(IndexedSeq[String], Long)] = wc
          .collect()
          .map(r => (r.getString(0).map(_.toString).toIndexedSeq, r.getLong(1)))
        trainDriverSide(types, numMerges, minPairCount)
      } else {
        System.err.println(s"[bpe] type table has $nTypes types > maxTypes=$maxTypes " +
          "driver cap; switching to distributed-exact merge learning " +
          "(one pair-count aggregation per round, no truncation)")
        trainDistributed(wc, numMerges, minPairCount)
      }
    } finally wc.unpersist()
  }

  /** The collected-table merge loop (vocab-sized driver work). */
  private def trainDriverSide(types: Array[(IndexedSeq[String], Long)],
                              numMerges: Int, minPairCount: Long): Seq[(String, String)] = {
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

  /** Distributed-exact merge learning for type tables beyond the driver
    * cap: the symbolized type table stays a cached Dataset; each round
    * is ONE adjacent-pair explode + map-side-combined `(pair, n)` sum
    * (counts, never text, through the shuffle) and a 1-row argmax
    * collect, then a map-only merge application. Cost per round is a
    * types-table-sized aggregation — the price of exactness past the
    * cap; under it the driver loop is strictly faster, which is why
    * this is the fallback and not the default. */
  private def trainDistributed(wc: DataFrame, numMerges: Int,
                               minPairCount: Long): Seq[(String, String)] = {
    val spark = wc.sparkSession
    import spark.implicits._
    var cur = wc.select(col("w"), col("n")).as[(String, Long)]
      .map { case (w, n) => (w.map(_.toString): Seq[String], n) }
      .toDF("syms", "n").persist()
    cur.count()
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val best = cur.filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(element_at(syms, i + 1) AS a, element_at(syms, i + 2) AS b))")).as("p"),
          col("n"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .filter(col("cnt") >= minPairCount)
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect().headOption
      best match {
        case None => done = true
        case Some(r) =>
          val (a, b) = (r.getString(0), r.getString(1))
          merges += ((a, b))
          val next = cur.as[(Seq[String], Long)]
            .map { case (syms, n) => (mergeOnce(syms.toIndexedSeq, a, b): Seq[String], n) }
            .toDF("syms", "n").persist()
          next.count() // materialize before dropping the parent cache
          cur.unpersist()
          cur = next
          round += 1
      }
    }
    cur.unpersist()
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
