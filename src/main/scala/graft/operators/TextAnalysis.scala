package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.stableRound

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star surface; BASELINE.json `north_star`): language ID, quality
  * scoring, token counting, document fingerprinting.
  *
  * All pure per-row column expressions — map-only, codegen'd, no shuffle —
  * so each scales linearly to 100 TB (the one exception, [[tokenEntropy]],
  * is an explode + hash-agg that shuffles counts, never text). Hash-derived
  * values use md5 hex arithmetic (portable across engines →
  * DuckDB-oracle-checkable).
  */
object TextAnalysis {

  /** Stopword profiles for the n-gram/stopword language heuristic. */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ein", "eine", "ist", "von"))

  /** All quality counters for a document in one fused scan — see
    * [[graft.functions.TextStats]]. Every ratio below reads one field of
    * this struct; repeated instances in a projection collapse to a
    * single evaluation via subexpression elimination, so the
    * langId+quality block costs ~2 string scans per row instead of the
    * ~10 regex passes of the composable forms (TextStatsSpec pins
    * bitwise equality with those forms). */
  def textStats(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(graft.functions.TextStats(expression(text), StopwordProfiles))
  }

  /** Whitespace token count (== size(tokens(text)), fused scan). */
  def tokenCount(text: Column): Column = textStats(text).getField("n_tokens")

  /** BPE-ish subword count: alpha runs, digit runs, and single symbols.
    * (Regex kept RE2-compatible so the oracle runs the same pattern.) */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Count of tokens that appear in `words` — codegen'd hash-set
    * membership loop ([[graft.functions.StopwordHits]]), O(tokens)
    * instead of an interpreted O(tokens × |words|) filter lambda. */
  def stopwordHits(toks: Column, words: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(graft.functions.StopwordHits(expression(toks), words))
  }

  /** Language ID: argmax of stopword-profile hit counts; ties resolve to
    * the FIRST matching profile in declaration order (en, es, fr, de) —
    * mirrored exactly by the oracle's CASE chain; zero evidence falls
    * back to "und" (undetermined). */
  def langId(text: Column): Column = {
    val st = textStats(text)
    val scored = StopwordProfiles.map { case (lang, _) => (lang, st.getField(s"hits_$lang")) }
    val best = greatest(scored.map(_._2): _*)
    scored.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, score)) =>
      acc.when(score === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Quality heuristics: length, mean token length, punctuation ratio,
    * stopword ratio, composite score in [0,1]. All double arithmetic,
    * rounded by the caller for oracle stability. Each is integer fields
    * of the shared [[textStats]] struct divided in the same order as the
    * original regexp forms (bitwise-equal; TextStatsSpec). */
  def punctRatio(text: Column): Column = {
    val st = textStats(text)
    when(st.getField("clean_len") === 0, 0.0)
      .otherwise(st.getField("punct_chars").cast("double") / st.getField("clean_len"))
  }

  /** Mean token length: sum of token lengths (cleaned text minus its
    * whitespace) over token count, as in the old fold. */
  def meanTokenLen(text: Column): Column = {
    val st = textStats(text)
    when(st.getField("n_tokens") === 0, 0.0)
      .otherwise(st.getField("nonws_chars").cast("double") / st.getField("n_tokens"))
  }

  def stopwordRatio(text: Column): Column = {
    val st = textStats(text)
    when(st.getField("n_tokens") === 0, 0.0)
      .otherwise(st.getField("hits_all").cast("double") / st.getField("n_tokens"))
  }

  /** Composite quality score: rewards mid-length docs and word-like
    * tokens, penalizes punctuation soup. Deterministic, engine-portable. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    val wordShape = least(meanTokenLen(text) / 8.0, lit(1.0))
    stableRound(lenScore * 0.4 + punctPenalty * 0.3 + wordShape * 0.3)
  }

  /** PII redaction: mask common identifier shapes with typed sentinels
    * (training-data scrubbing). Map-only regexp_replace chain; patterns
    * kept RE2-compatible so the same regexes run in oracle engines.
    * Order matters: ssn before phone (both are digit runs). */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ssn = regexp_replace(email, "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>")
    val phone = regexp_replace(ssn, "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>")
    regexp_replace(phone, "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>")
  }

  /** Gopher-style repetition signal: the fraction of word n-gram
    * instances that are duplicates of an earlier instance in the doc
    * (0 = no repetition). High values flag boilerplate/spam for
    * training-data filtering. */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val all = shingles(tokens(lower(text)), n)
    when(size(all) === 0, 0.0)
      .otherwise((size(all) - size(array_distinct(all))).cast("double") / size(all))
  }

  /** Exact content fingerprint: md5 of the cleaned text. */
  def contentFingerprint(text: Column): Column = md5(cleanText(text))

  /** Rolling-shingle fingerprint: the minimum md5 over word 4-grams —
    * stable under small edits away from the minimal shingle (the
    * winnowing/MinHash primitive with k=1). */
  def shingleFingerprint(text: Column, n: Int = 4): Column = {
    val sh = shingleSet(tokens(lower(text)), n)
    when(size(sh) === 0, md5(lit(""))).otherwise(array_min(transform(sh, s => md5(s))))
  }

  /** Unigram log-probability scoring — the perplexity-proxy quality
    * signal (CCNet, Wenzek et al. 2020, scores docs with an LM; the
    * unigram LM is its engine-portable degenerate case): score(doc) =
    * mean over token instances of ln P(token), with P from the corpus'
    * own unigram distribution (add-one smoothed over the top-`vocabSize`
    * vocabulary; out-of-vocab tokens take the smoothed floor). Low
    * scores flag gibberish; anomalously high scores flag boilerplate.
    *
    * Scale shape: vocabulary estimation is the classic word-count
    * (explode + hash-agg of (token, count) — map-side combined, counts
    * not text); the top-V cut is a TakeOrderedAndProject; scoring joins
    * exploded tokens to the ≤V-row vocab — broadcast at any corpus size
    * (V is a constant) — then one (doc) hash-agg of Double partial sums.
    * The per-doc mean folds in token order via (sum, count) partial
    * aggregation; summation order does not matter for the oracle because
    * each addend is one of ≤V+1 distinct doubles and the oracle rounds
    * to 6 places after an epsilon nudge.
    * Returns (idCol, n_tokens, logprob). */
  def unigramLogprob(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, vocabSize: Int = 65536):
      org.apache.spark.sql.DataFrame =
    scoreUnigram(docs, idCol, textCol,
      unigramVocab(docs, textCol, vocabSize))
      .withColumnRenamed("mean_lp", "logprob")

  /** Estimate a top-`vocabSize` unigram vocabulary: (_tok, _cnt) rows,
    * deterministic top-V cut (ties lexicographic). The wordcount shape:
    * explode + map-side-combined counts, TakeOrderedAndProject cut. */
  def unigramVocab(docs: org.apache.spark.sql.DataFrame, textCol: String,
                   vocabSize: Int = 65536): org.apache.spark.sql.DataFrame =
    docs.select(explode(tokens(lower(cleanText(col(textCol))))).as("_tok"))
      .groupBy(col("_tok")).agg(count(lit(1)).as("_cnt"))
      .orderBy(desc("_cnt"), col("_tok")).limit(vocabSize)

  /** Mean per-token ln P(token) of each doc under an add-one-smoothed
    * unigram model of `vocab` (any [[unigramVocab]] output — the
    * SCORING corpus and the MODEL corpus may differ, which is what
    * importance weighting needs): P(t) = (cnt+1)/(N+V+1), OOV floor
    * 1/(N+V+1). The vocab broadcasts (≤V rows, a constant); the
    * per-doc fold runs over the sorted term list (partitioning-
    * independent float order). Returns (idCol, n_tokens, mean_lp). */
  def scoreUnigram(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, vocab: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    scoreUnigramFromCounts(docTokenCounts(docs, idCol, textCol), idCol, vocab)

  /** Per-(doc, token) instance counts — the shared intermediate of
    * unigram scoring and model building (r19): one tokenize + one
    * wordcount-shaped shuffle, from which both a [[unigramVocab]]-equal
    * model (sum the per-doc counts) and any number of
    * [[scoreUnigramFromCounts]] passes derive without re-reading text. */
  def docTokenCounts(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol),
        explode(tokens(lower(cleanText(col(textCol))))).as("_tok"))
      .groupBy(col(idCol), col("_tok"))
      .agg(count(lit(1)).as("_dcnt"))

  /** [[scoreUnigram]] over precomputed [[docTokenCounts]] — same rows,
    * same doubles (the per-doc fold and the smoothing arithmetic are
    * untouched); exists so multi-model scorers pay the tokenize once. */
  def scoreUnigramFromCounts(counts: org.apache.spark.sql.DataFrame,
                             idCol: String,
                             vocab: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    val stats = vocab.agg(
      sum(col("_cnt")).cast("double").as("_n"),
      (count(lit(1)) + 1).cast("double").as("_v1"))
    counts
      .join(broadcast(vocab), Seq("_tok"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("_lp",
        log((coalesce(col("_cnt"), lit(0L)).cast("double") + 1.0) /
          (col("_n") + col("_v1"))))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("_tok"), col("_dcnt"), col("_lp"))))
          .as("_terms"),
        sum(col("_dcnt")).as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        graft.functions.VectorFunctions.stableRound(expr(
          """aggregate(_terms, 0D,
            |  (acc, e) -> acc + CAST(e._dcnt AS DOUBLE) * e._lp)
            |  / CAST(n_tokens AS DOUBLE)""".stripMargin)).as("mean_lp"))
  }

  /** DSIR-style importance weight (Xie et al. 2023, unigram features):
    * w(doc) = mean ln P_target(tok) − mean ln P_corpus(tok). Positive
    * ⇒ the doc looks more like the target distribution than the
    * corpus — the data-selection signal for matching a pretraining mix
    * to a high-quality target domain. Both scoring passes share the
    * shape of [[scoreUnigram]]; each model is a broadcast ≤V-row
    * table. Returns (idCol, n_tokens, target_lp, corpus_lp, weight). */
  def importanceWeights(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String,
                        target: org.apache.spark.sql.DataFrame,
                        vocabSize: Int = 65536): org.apache.spark.sql.DataFrame = {
    // ONE tokenize of the scoring corpus (r19): both model scorings and
    // the corpus model itself derive from the materialized per-(doc,
    // token) counts — the old shape re-tokenized `docs` in every branch
    // (two scorings + the corpus vocab; zero exchange reuse measured).
    // The corpus model from summed per-doc counts is value-identical to
    // unigramVocab(docs, ...): instance count == Σ per-doc counts, and
    // the (desc count, token) cut is unchanged. `target` keeps its own
    // tokenize — the API allows a model corpus disjoint from `docs`.
    val counts = graft.Materialize(docTokenCounts(docs, idCol, textCol))
    val corpusVocab = counts.groupBy(col("_tok"))
      .agg(sum(col("_dcnt")).as("_cnt"))
      .orderBy(desc("_cnt"), col("_tok")).limit(vocabSize)
    val tScore = scoreUnigramFromCounts(counts, idCol,
        unigramVocab(target, textCol, vocabSize))
      .select(col(idCol), col("n_tokens"), col("mean_lp").as("target_lp"))
    val cScore = scoreUnigramFromCounts(counts, idCol, corpusVocab)
      .select(col(idCol), col("mean_lp").as("corpus_lp"))
    tScore.join(cScore, idCol)
      .withColumn("weight",
        graft.functions.VectorFunctions.stableRound(
          col("target_lp") - col("corpus_lp")))
  }

  /** Bigram conditional log-probability scoring — one modeling step up
    * from [[unigramLogprob]] toward the CCNet/KenLM n-gram quality
    * filter (Wenzek et al. 2020 score with a 5-gram KenLM; the bigram
    * is the largest order whose corpus statistics stay cheaply
    * broadcastable AND SQL-replayable): score(doc) = mean over bigram
    * instances of ln P(w2 | w1), with P from the corpus' own top-`bigramTop`
    * bigram table, add-one smoothed: P = (c(w1,w2)+1) / (ctx(w1)+V+1).
    * Context totals ctx(w1) are derived FROM the kept bigram table (so
    * c ≤ ctx always holds and P < 1 even when a context misses the
    * cut); V is [[unigramVocab]]'s size. Unigram scoring can't see word
    * order — "the the the" and fluent prose with the same words score
    * identically; the bigram conditional catches scrambled text.
    *
    * Scale shape: bigram extraction is map-only (an indexed `transform`
    * over the token array — no self-join on position); the model is a
    * wordcount-shaped hash-agg cut to ≤`bigramTop` rows
    * (TakeOrderedAndProject, ties → lexicographic), so model and
    * context tables broadcast at any corpus size; scoring is one
    * (doc, w1, w2) hash-agg joined to the broadcast model, then one
    * per-doc fold over the LEXICOGRAPHICALLY SORTED term list
    * (partitioning-independent float order, the [[scoreUnigram]]
    * discipline). Docs with fewer than two tokens have no bigram and
    * are absent (the [[tokenEntropy]] contract).
    * Returns (idCol, n_bigrams, logprob). */
  def bigramLogprob(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, vocabSize: Int = 65536,
                    bigramTop: Int = 65536): org.apache.spark.sql.DataFrame = {
    // tokenize ONCE: the model pass, the vocab count, and the per-doc
    // scoring all read this materialized token table (Materialize is
    // the localCheckpoint <-> persist(DISK_ONLY) switch, so at corpus
    // scale this is a disk-backed intermediate, not three full
    // re-tokenization scans of the raw text)
    val base = graft.Materialize(docs
      .select(col(idCol), tokens(lower(cleanText(col(textCol)))).as("_toks")))
    val pairs = base
      .filter(size(col("_toks")) >= 2)
      .select(col(idCol), explode(expr(
        """transform(slice(_toks, 1, size(_toks) - 1),
          |  (x, i) -> struct(x AS w1, element_at(_toks, i + 2) AS w2))"""
          .stripMargin)).as("_p"))
      .select(col(idCol), col("_p.w1").as("_w1"), col("_p.w2").as("_w2"))
    val bg = pairs.groupBy("_w1", "_w2").agg(count(lit(1)).as("_bcnt"))
      .orderBy(desc("_bcnt"), col("_w1"), col("_w2")).limit(bigramTop)
    val ctx = bg.groupBy("_w1").agg(sum("_bcnt").as("_ccnt"))
    // identical value to unigramVocab(docs,...).count + 1 — the top-V
    // cut only clips the row count, which is all v1 uses
    val v1 = base.select(explode(col("_toks")).as("_tok"))
      .groupBy(col("_tok")).agg(count(lit(1)).as("_cnt"))
      .orderBy(desc("_cnt"), col("_tok")).limit(vocabSize)
      .agg((count(lit(1)) + 1).cast("double").as("_v1"))
    pairs
      .groupBy(col(idCol), col("_w1"), col("_w2"))
      .agg(count(lit(1)).as("_dcnt"))
      .join(broadcast(bg), Seq("_w1", "_w2"), "left")
      .join(broadcast(ctx), Seq("_w1"), "left")
      .crossJoin(broadcast(v1))
      .withColumn("_lp",
        log((coalesce(col("_bcnt"), lit(0L)).cast("double") + 1.0) /
          (coalesce(col("_ccnt"), lit(0L)).cast("double") + col("_v1"))))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("_w1"), col("_w2"),
          col("_dcnt"), col("_lp")))).as("_terms"),
        sum(col("_dcnt")).as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        graft.functions.VectorFunctions.stableRound(expr(
          """aggregate(_terms, 0D,
            |  (acc, e) -> acc + CAST(e._dcnt AS DOUBLE) * e._lp)
            |  / CAST(n_bigrams AS DOUBLE)""".stripMargin)).as("logprob"))
  }

  /** Shannon entropy (nats) of each doc's unigram distribution — the
    * gibberish/boilerplate quality signal (low = repetitive template
    * text, anomalously high = random noise). Not a per-row expression:
    * term counting is an explode + (doc, token) hash-agg (map-side
    * combine; shuffles counts, never text), then the entropy fold runs
    * over the LEXICOGRAPHICALLY SORTED term list so the float summation
    * order is deterministic and engine-portable. Returns (idCol,
    * n_tokens, entropy); docs with no tokens are absent. */
  def tokenEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol), explode(tokens(lower(cleanText(col(textCol))))).as("_tok"))
      .groupBy(col(idCol), col("_tok"))
      .agg(count(lit(1)).as("_cnt"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("_tok"), col("_cnt")))).as("_terms"),
        sum(col("_cnt")).as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        expr("""-aggregate(_terms, 0D,
               |  (acc, e) -> acc + (CAST(e._cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE))
               |                    * ln(CAST(e._cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)))
               |""".stripMargin).as("entropy"))
}
