package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.stableRound

/** Deduplication operators for training-data pipelines (north-star
  * surface): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale posture:
  *  - Exact dedup is a hash-aggregate on a fingerprint (one shuffle of
  *    (fingerprint, id) pairs, never of full texts).
  *  - MinHash signatures and SimHash values are per-row expressions
  *    (map-only). Candidate generation is LSH banding: explode to
  *    (band, bucket) keys and self-join inside buckets — the shuffle is
  *    on short hash strings, and the quadratic blow-up is confined to
  *    same-bucket collisions. This is the 100 TB path; the pairwise
  *    Jaccard join is only ever run inside a blocking key.
  *  - All hashes are md5-hex-derived (portable → DuckDB oracle).
  */
object Dedup {

  /** Exact dedup: keep the lowest id per distinct (cleaned) text.
    * Shuffles (fingerprint, id, ...) not raw text when `byFingerprint`. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(cleanText(col(textCol))).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature entry k for a shingle set: min over shingles of
    * md5(k || '|' || shingle). Lexicographic min over hex strings is a
    * uniform permutation-min — the classic MinHash estimator. */
  def minhashSig(shingleSetCol: Column, k: Int): Column =
    array_min(transform(shingleSetCol, s => md5(concat(lit(k.toString), lit("|"), s))))

  /** docs → (id, sig_0..sig_{numHashes-1}) MinHash signatures.
    *
    * Shape: explode shingles once, then ONE hash-aggregate taking the min
    * of each permutation hash. Computing signatures as per-row array
    * lambdas instead looks shuffle-free but backfires: projection
    * collapse re-inlines the whole shingle-set expression into every
    * signature (and every LSH band) column — numHashes × bands recompute,
    * all interpreted. The explode form materializes each shingle exactly
    * once, keeps md5 inside whole-stage codegen, and the min() aggregate
    * combines map-side — the shuffle carries one (id, 8×hash) row per
    * pre-aggregated partition group, not the text. (~8× faster at sf0.1.) */
  def withMinhashSignature(docs: DataFrame, idCol: String, textCol: String,
                           shingleN: Int = 3, numHashes: Int = 8): DataFrame = {
    val sh = docs.select(
      col(idCol),
      explode(shingleSet(tokens(lower(cleanText(col(textCol)))), shingleN)).as("_shingle"))
    val sigAggs = (0 until numHashes).map(k =>
      min(md5(concat(lit(k.toString), lit("|"), col("_shingle")))).as(s"sig_$k"))
    sh.groupBy(col(idCol)).agg(sigAggs.head, sigAggs.tail: _*)
  }

  /** LSH banding: (id, band_id, bucket) where bucket = md5 of the band's
    * concatenated signature rows. Docs sharing any (band_id, bucket) are
    * near-dup candidates. */
  def lshBands(sigs: DataFrame, idCol: String, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val sigCols = (0 until rows).map(r => col(s"sig_${b * rows + r}"))
      struct(lit(b).as("band_id"), md5(concat_ws("#", sigCols: _*)).as("bucket"))
    }
    sigs
      .select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.bucket"))
  }

  /** Candidate near-dup pairs via MinHash LSH (distinct (a,b), a<b). */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val sigs = withMinhashSignature(docs, idCol, textCol, shingleN, numHashes)
    // both self-join branches read the banded rows; materialize them once
    // (Materialize: localCheckpoint locally, DISK_ONLY persist on cluster)
    // instead of re-running the signature pipeline
    val b = graft.Materialize(lshBands(sigs, idCol, numHashes, bands))
    val l = b.select(col("band_id"), col("bucket"), col(idCol).as("id_a"))
    val r = b.select(col("band_id"), col("bucket"), col(idCol).as("id_b"))
    l.join(r, Seq("band_id", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Pairwise n-gram Jaccard within a blocking key (threshold must be
    * > 0: pairs with an empty shingle intersection are never emitted).
    *
    * Shape: explode distinct shingles, equi-join on (block, shingle) to
    * count intersections, then join per-doc set sizes — |A∪B| is
    * |A|+|B|−|A∩B|. This does the quadratic work only on docs that
    * actually share a shingle (an inverted-index join), instead of
    * materializing every in-block pair and intersecting 100-element
    * arrays per pair; the joins are plain shuffle-hash joins that scale
    * out.
    *
    * `maxDf` is the hot-shingle guard: a shingle appearing in D in-block
    * docs contributes D·(D−1)/2 join rows, so one ubiquitous shingle
    * ("in the" in every doc) turns the inverted index quadratic in the
    * block size — the classic skew bomb. Capping document frequency
    * drops such shingles from BOTH the index and the per-doc set sizes,
    * so jaccard stays internally consistent (computed over the capped
    * shingle universe); near-ubiquitous shingles carry almost no
    * similarity signal, which is why df-capping is the standard
    * mitigation in set-similarity joins. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, blockCol: String,
                   shingleN: Int = 3, threshold: Double = 0.05,
                   maxDf: Long = Long.MaxValue): DataFrame = {
    require(threshold > 0.0, "inverted-index jaccard never emits disjoint pairs; threshold must be > 0")
    // three consumers (both join sides + sizes): materialize the exploded
    // shingles once rather than recomputing the text pipeline per branch
    // distinct() guards duplicated input rows: a doc ingested twice under
    // the same block would otherwise double both sizes AND intersection
    // counts, producing jaccard > 1
    val exploded = docs.select(
      col(blockCol).as("_blk"), col(idCol).as("_id"),
      explode(shingleSet(tokens(lower(cleanText(col(textCol)))), shingleN)).as("_s"))
      .distinct()
    // df-cap: one linear (blk, shingle) count + window-free semi filter,
    // traded against the quadratic join output the hot keys would emit
    val capped =
      if (maxDf == Long.MaxValue) exploded
      else {
        val keep = exploded.groupBy(col("_blk"), col("_s"))
          .agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxDf)
          .select("_blk", "_s")
        exploded.join(keep, Seq("_blk", "_s"), "left_semi")
      }
    val sh = graft.Materialize(capped)
    // sizes are per (block, id): a doc_id appearing under two blocks must
    // not inflate |A| and deflate jaccard
    val sizes = sh.groupBy(col("_blk"), col("_id")).agg(count(lit(1)).as("_n"))
    val inter = sh.alias("a")
      .join(sh.alias("b"),
        col("a._blk") === col("b._blk") && col("a._s") === col("b._s") &&
          col("a._id") < col("b._id"))
      .select(col("a._blk").as("_blk"), col("a._id").as("id_a"), col("b._id").as("id_b"))
      .groupBy("_blk", "id_a", "id_b")
      .agg(count(lit(1)).as("_i"))
    inter
      .join(sizes.select(col("_blk"), col("_id").as("id_a"), col("_n").as("_na")), Seq("_blk", "id_a"))
      .join(sizes.select(col("_blk"), col("_id").as("id_b"), col("_n").as("_nb")), Seq("_blk", "id_b"))
      .withColumn("jaccard", col("_i").cast("double") / (col("_na") + col("_nb") - col("_i")))
      .filter(col("jaccard") >= threshold)
      .select(col("_blk").as(blockCol), col("id_a"), col("id_b"), stableRound(col("jaccard")).as("jaccard"))
  }

  /** Benchmark decontamination: (corpus doc, bench doc, shared) for every
    * corpus/benchmark pair sharing ≥ `minShared` DISTINCT word n-grams —
    * the eval-overlap removal step of a training-data pipeline (flagged
    * docs are dropped or quarantined before training).
    *
    * Scale shape: benchmark suites are tiny next to a 100 TB corpus, so
    * the bench shingle index BROADCASTS — the corpus side is a map-only
    * explode + broadcast-hash lookup, and the only shuffle is the
    * (doc, bench) count aggregation over MATCHED shingle rows (partial
    * agg combines map-side). Nothing corpus-sized ever shuffles.
    * Both sides explode distinct shingle SETS, so `count` = number of
    * distinct shared n-grams. */
  def contamination(corpus: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String,
                    shingleN: Int = 8, minShared: Long = 5): DataFrame = {
    def sh(df: DataFrame, as: String) = df.select(
      col(idCol).as(as),
      explode(shingleSet(tokens(lower(cleanText(col(textCol)))), shingleN)).as("_s"))
    sh(corpus, "doc_id")
      .join(broadcast(sh(bench, "bench_id")), "_s")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Connected components over an undirected candidate-pair graph:
    * (id, cluster_id) for every id appearing in `pairs`, where
    * cluster_id = the minimum id reachable through the pair edges. The
    * canonicalization step of a dedup pipeline — candidate pairs
    * (MinHash/SimHash/Jaccard) become clusters, and each cluster keeps
    * exactly one canonical document (the min id).
    *
    * Algorithm: iterative min-label propagation. Each round joins labels
    * to the (symmetrized) edge list, takes the min neighbor label per
    * node (partial-agg combines map-side), and stops when no label
    * changed — one count() action per round on a 2-column frame, never a
    * collect of data. Rounds needed = graph diameter; dup clusters are
    * dense and shallow (a near-dup cluster's diameter is small by
    * construction — members are all similar to each other), so this
    * converges in a handful of rounds where a path-doubling variant
    * would only add complexity. `maxIter` bounds adversarial chains; the
    * operator throws rather than return a half-converged labeling.
    *
    * Scale: every round shuffles only (id, label) longs keyed by id —
    * at 100 TB the iteration cost is rounds × one hash-agg over the
    * EDGE list (already confined by LSH banding), not the corpus. */
  def clusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
               maxIter: Int = 25): DataFrame = {
    val edges = graft.Materialize(
      pairs.select(col(idA).as("src"), col(idB).as("dst"))
        .union(pairs.select(col(idB).as("src"), col(idA).as("dst"))))
    var labels = graft.Materialize(
      edges.select(col("src").as("id")).distinct()
        .withColumn("cluster_id", col("id")))
    var materialized = labels
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(edges("src").as("nid"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      // the changed flag rides INSIDE the materialized round (r19): the
      // old shape re-joined `next` against `labels` purely to detect
      // convergence — one extra join + shuffle per round over two
      // checkpointed frames. Comparing old vs new label in the same
      // projection costs nothing, and the convergence probe becomes a
      // filter scan of the already-checkpointed round.
      val round = graft.Materialize(
        labels
          .join(neighborMin, labels("id") === neighborMin("nid"), "left")
          .select(col("id"),
            least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
              .as("cluster_id"),
            (coalesce(col("nbr_min"), col("cluster_id")) < col("cluster_id"))
              .as("_chg")))
      converged = round.filter(col("_chg")).isEmpty
      // release the superseded round's blocks: under the `persist`
      // strategy each round otherwise accumulates a DISK_ONLY cache
      // entry for the session lifetime (no-op for localCheckpoint).
      // `materialized` is the handle the cache entry is keyed on — the
      // `drop` projection below would not sameResult-match it.
      materialized.unpersist()
      materialized = round
      labels = round.drop("_chg")
      iter += 1
    }
    require(converged, s"label propagation did not converge in $maxIter rounds")
    labels
  }

  /** SimHash near-dup pairs: within a blocking key, pairs whose simhash
    * values differ in at most `maxHamming` bits. The simhash itself is a
    * per-row expression; pair generation is a block-keyed self-join on
    * the (small) per-doc hash rows — documents never join. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, blockCol: String,
                   bits: Int = 16, maxHamming: Int = 3): DataFrame = {
    val hashed = graft.Materialize(
      docs.select(col(blockCol).as("_blk"), col(idCol).as("_id"),
        simhash(col(textCol), bits).as("_h")))
    val a = hashed.select(col("_blk"), col("_id").as("id_a"), col("_h").as("_ha"))
    val b = hashed.select(col("_blk"), col("_id").as("id_b"), col("_h").as("_hb"))
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", expr("bit_count(_ha ^ _hb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("_blk").as(blockCol), col("id_a"), col("id_b"), col("hamming"))
  }

  /** SimHash over tokens: bit j is set iff the majority of tokens have md5
    * bit j set (strictly positive vote sum). `bits` ≤ 32 (one hex digit
    * carries 4 bits; bit j reads digit j/4, weight 2^(3-j%4)). Backed by
    * the codegen'd [[graft.functions.SimHash]] fused loop — one md5 per
    * token instead of one per (token × bit). */
  def simhash(text: Column, bits: Int = 16): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(graft.functions.SimHash(
      expression(tokens(lower(cleanText(text)))), bits))
  }

  /** Incremental exact dedup — the daily-increment production shape:
    * dedup a NEW batch against the accumulated corpus without touching
    * corpus text, using only its fingerprint index (what
    * [[exact]] / an `IndexStore` table persists). Each new doc gets a
    * status:
    *  - `dup_corpus`: fingerprint already in the index (corpus wins
    *    regardless of ids — it was there first);
    *  - `dup_batch`: first seen inside this batch by a lower-id row;
    *  - `new`: the batch's canonical first occurrence of an unseen
    *    fingerprint — the rows a caller appends to the index.
    *
    * Scale shape: the batch fingerprints once (map-only md5); the
    * within-batch canonical is a hash-agg + join on the fingerprint
    * (md5 keys — skew-free by construction); the corpus probe is an
    * equi-join against a FINGERPRINT-ONLY projection of the index
    * (column pruning reaches the parquet scan — corpus text never
    * loads). All shuffles carry 32-byte hashes + ids.
    *
    * Null texts: `md5(cleanText(null))` is null, and the joins are
    * null-SAFE, so null-text rows form their own dup group (null
    * fingerprint) exactly like [[exact]]'s null groupBy key — an audit
    * output must never silently drop an input row, which is what a
    * plain equi-join on the fingerprint would do. */
  def exactIncrement(newDocs: DataFrame, idCol: String, textCol: String,
                     existingFps: DataFrame, fpCol: String = "fingerprint"): DataFrame = {
    val withFp = newDocs.select(col(idCol),
      md5(cleanText(col(textCol))).as("fingerprint"))
    val firsts = withFp.groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("_first"))
      .withColumnRenamed("fingerprint", "_ffp")
    val corpus = existingFps.select(col(fpCol).as("_cfp")).distinct()
      .withColumn("_in_corpus", lit(true))
    withFp
      .join(firsts, col("fingerprint") <=> col("_ffp"))
      .join(corpus, col("fingerprint") <=> col("_cfp"), "left")
      .select(col(idCol), col("fingerprint"),
        when(col("_in_corpus"), "dup_corpus")
          .when(col(idCol) =!= col("_first"), "dup_batch")
          .otherwise("new").as("status"))
  }

  /** Incremental NEAR-dup dedup — the daily-crawl production shape of
    * [[minhashCandidates]], mirroring [[exactIncrement]] one tier up:
    * dedup a NEW batch against the accumulated corpus using only its
    * persisted LSH BAND INDEX (band_id, bucket, id — what [[lshBands]]
    * emits and an index sink persists), never corpus text. Status per
    * batch doc:
    *  - `dup_corpus`: some band collides with a corpus bucket (corpus
    *    wins regardless of ids); `dup_of` = lowest colliding corpus id;
    *  - `dup_batch`: no corpus collision, but a LOWER-id batch doc
    *    shares a band bucket (that doc may itself be `dup_corpus` —
    *    the pointer is the collision partner, not a canonical);
    *  - `new`: no collision — the rows whose bands the caller appends
    *    to the index. Docs with no shingles (blank text) cannot
    *    near-dup and report `new` with null bands; input rows never
    *    vanish from the audit output.
    *
    * Scale shape: batch signatures are one explode + hash-agg
    * ([[withMinhashSignature]]); the corpus probe is an equi-join on
    * (band_id, bucket) against the band index — 32-byte md5 buckets
    * + ids cross the wire, never text, and the index side prunes to
    * its (band_id, bucket, id) columns at the parquet scan. The
    * within-batch pass is the LSH-confined self-join.
    *
    * Parameter drift: buckets only collide when the index was built
    * with the SAME (shingleN, numHashes, bands) — a mismatched index
    * would silently report everything `new`. The probe therefore
    * raises at execution if any index band_id falls outside
    * [0, bands) (catches `bands`/`numHashes` drift, which changes the
    * band count); shingleN drift is invisible in the index schema, so
    * persist the parameter tuple alongside the index and validate it
    * before calling — [[graft.streaming.StreamingDedup]]'s incremental
    * loop does exactly that via its `_params` sidecar. */
  def minhashIncrement(newDocs: DataFrame, idCol: String, textCol: String,
                       existingBands: DataFrame,
                       shingleN: Int = 3, numHashes: Int = 8,
                       bands: Int = 4): DataFrame = {
    val sigs = withMinhashSignature(newDocs, idCol, textCol, shingleN, numHashes)
    val b = graft.Materialize(lshBands(sigs, idCol, numHashes, bands))
    val guardedIdx = existingBands.select(
      when(col("band_id") >= 0 && col("band_id") < bands, col("band_id"))
        .otherwise(raise_error(concat(
          lit("minhashIncrement: index band_id "), col("band_id").cast("string"),
          lit(s" outside [0, $bands) — the band index was built with different " +
            "(numHashes, bands) parameters than this probe"))).cast("integer"))
        .as("band_id"),
      col("bucket"), col("id").as("_cid"))
    val corpusHit = b
      .join(guardedIdx, Seq("band_id", "bucket"))
      .groupBy(col(idCol))
      .agg(min(col("_cid")).as("_corpus_of"))
    val l = b.select(col("band_id"), col("bucket"), col(idCol).as("_ida"))
    val r = b.select(col("band_id"), col("bucket"), col(idCol).as("_idb"))
    val batchHit = l.join(r, Seq("band_id", "bucket"))
      .filter(col("_ida") < col("_idb"))
      .groupBy(col("_idb"))
      .agg(min(col("_ida")).as("_batch_of"))
      .withColumnRenamed("_idb", idCol)
    newDocs.select(col(idCol))
      .join(corpusHit, Seq(idCol), "left")
      .join(batchHit, Seq(idCol), "left")
      .select(col(idCol),
        when(col("_corpus_of").isNotNull, "dup_corpus")
          .when(col("_batch_of").isNotNull, "dup_batch")
          .otherwise("new").as("status"),
        coalesce(col("_corpus_of"), col("_batch_of")).as("dup_of"))
  }

  /** Exact-substring duplication profile (the suffix-array-dedup signal
    * of "Deduplicating Training Data Makes Language Models Better",
    * Lee et al. 2022, approximated at word-n-gram granularity): for each
    * document, the number of its word n-gram INSTANCES that duplicate an
    * earlier instance anywhere in the corpus. "Earlier" is the total
    * order (doc_id, position) — the single canonical first instance of
    * each distinct gram is not a duplicate; every other instance is.
    * Returns (idCol, n_grams, n_dup, dup_fraction).
    *
    * Scale shape — the naive form shuffles every gram instance (one row
    * per word × n); this one collapses to distinct (gram, doc) pairs
    * before anything crosses the wire:
    *  1. map-only: positional n-grams → (gram-hash, doc, pos);
    *  2. hash-agg on (gram-hash, doc): cnt + min(pos) — the doc id is a
    *     GROUPING key here, so the within-doc order key is just the
    *     position: a plain long `min` that stays in whole-stage codegen
    *     on the hottest path (one input row per gram INSTANCE),
    *     whatever the id type. Partial aggregation combines all
    *     within-doc repeats map-side, so the shuffle carries one row
    *     per DISTINCT (gram, doc), not one per instance;
    *  3. hash-agg on gram-hash: global first instance, ordered by
    *     (doc_id, first pos). Integral ids pack into one long
    *     (id·2²⁰ + pos — codegen'd comparisons, width-guarded:
    *     |id| < 2⁴², pos < 2²⁰, violations raise); other id types keep
    *     the (id, pos) struct key — interpreted ordering, but only over
    *     the already-collapsed distinct (gram, doc) rows;
    *  4. join (2)⋈(3) on gram-hash — skew-safe: a ubiquitous gram has
    *     many probe rows but exactly one build row — then a final
    *     per-doc roll-up.
    * The gram hash is the `hashHexChars`-char md5 prefix (default 16 =
    * 64 bits — portable to the DuckDB oracle, collision-negligible
    * below ~10^8 distinct grams; at 100 TB pass 32 for the full md5). */
  /** Exact SUBSTRING dedup by span excision — Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better"):
    * instead of dropping whole documents, remove the duplicated
    * word-n-gram SPANS themselves, keeping exactly ONE occurrence
    * corpus-wide (the globally first by (id, pos) — the same canonical
    * order [[duplicatedGramProfile]] counts against, so the profile's
    * `n_dup` is precisely the number of instances this operator
    * excises). Boilerplate headers, license blocks, and templated
    * spans vanish from every copy but the first, while the documents'
    * unique content survives — whole-doc dedup can't do that.
    *
    * Output reconstructs from the normalized token stream (lowercased,
    * cleaned, whitespace-joined — the form a training pipeline
    * materializes anyway): (idCol, clean_text, n_tokens, n_removed),
    * one row per input doc, docs without flagged spans pass through
    * complete.
    *
    * Scale shape: instance extraction is map-only (posexplode of the
    * shingle array; hashes, never gram text, leave the mapper — md5
    * prefix, [[duplicatedGramProfile]]'s discipline); the first-
    * occurrence argmin is one hash-agg over (h, packed key); flags
    * join back on the hash; covered indices explode n-bounded spans of
    * FLAGGED instances only (duplication-sized, not corpus-sized); the
    * rebuild is one per-doc fold. Shuffles carry (hash, id, pos)
    * triples — never document text. */
  def exciseDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                           n: Int = 10, hashHexChars: Int = 16): DataFrame = {
    val (base, keyed) = gramInstanceKeys(docs, idCol, textCol, n, hashHexChars)
    val firsts = keyed.groupBy(col("_h")).agg(min(col("_key")).as("_firstkey"))
    // a unique gram's only instance IS the min, so `key != firstkey`
    // alone flags exactly the non-first duplicate instances
    val flagged = keyed.join(firsts, "_h")
      .filter(col("_key") =!= col("_firstkey"))
      .select(col(idCol), col("_pos"), col("_len"))
    rebuildWithoutSpans(base, flagged, idCol, n)
  }

  /** Incremental (prefix-consistent) form of [[exciseDuplicateSpans]]:
    * excise spans duplicated against EVERYTHING SEEN SO FAR — a gram
    * already in `seenGrams` (one `_h` per known gram) loses every
    * instance in this batch; a batch-new gram keeps its batch-first
    * instance exactly as the batch operator would. Running a corpus as
    * one batch ≡ [[exciseDuplicateSpans]]; split into id-ordered
    * batches the stream produces the same output (StreamingDedupSpec
    * pins this). The probe shuffles hash strings, never text. */
  def exciseIncrement(batch: DataFrame, idCol: String, textCol: String,
                      seenGrams: DataFrame, n: Int = 10,
                      hashHexChars: Int = 16): DataFrame = {
    val (base, keyed) = gramInstanceKeys(batch, idCol, textCol, n, hashHexChars)
    val firsts = keyed.groupBy(col("_h")).agg(min(col("_key")).as("_firstkey"))
    val seen = seenGrams.select(col("_h")).distinct().withColumn("_seen", lit(true))
    val flagged = keyed.join(firsts, "_h")
      .join(seen, Seq("_h"), "left")
      .filter(col("_seen").isNotNull || col("_key") =!= col("_firstkey"))
      .select(col(idCol), col("_pos"), col("_len"))
    rebuildWithoutSpans(base, flagged, idCol, n)
  }

  /** Distinct gram hashes of a batch — the rows an incremental excision
    * index accumulates (hash strings only, never gram text). */
  def gramHashes(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 10, hashHexChars: Int = 16): DataFrame = {
    val (_, keyed) = gramInstanceKeys(docs, idCol, textCol, n, hashHexChars)
    keyed.select(col("_h")).distinct()
  }

  /** Shared excision front half: normalized token arrays (`base`:
    * idCol, _w) and keyed gram instances (`keyed`: idCol, _len, _h,
    * _pos, _key — packed (id, pos) key for integral ids, struct
    * otherwise: [[duplicatedGramProfile]]'s canonical order). */
  private def gramInstanceKeys(docs: DataFrame, idCol: String, textCol: String,
                               n: Int, hashHexChars: Int): (DataFrame, DataFrame) = {
    require(hashHexChars >= 1 && hashHexChars <= 32,
      s"hashHexChars=$hashHexChars must be in [1, 32] (md5 is 32 hex chars)")
    import org.apache.spark.sql.types._
    val isIntegral = docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val base = docs.select(col(idCol),
      tokens(lower(cleanText(col(textCol)))).as("_w"))
    val inst = base.select(
        col(idCol), size(col("_w")).as("_len"),
        posexplode(shingles(col("_w"), n)).as(Seq("_pos", "_gram")))
      .select(col(idCol), col("_len"),
        substring(md5(col("_gram")), 1, hashHexChars).as("_h"),
        col("_pos").cast("long").as("_pos"))
    val instKey: Column =
      if (isIntegral) {
        val id = col(idCol).cast("long")
        when(id < lit(1L << 42) && id > lit(-(1L << 42)) &&
            col("_pos") < lit(1L << 20),
          shiftleft(id, 20) + col("_pos"))
          .otherwise(raise_error(lit(
            "exciseDuplicateSpans packed order key overflow: " +
              "requires |id| < 2^42 and position < 2^20")).cast("long"))
      } else struct(col(idCol), col("_pos"))
    (base, inst.withColumn("_key", instKey))
  }

  /** Shared excision back half: union the flagged instances' covered
    * word indices (n-bounded explode of FLAGGED rows only — duplication-
    * sized, not corpus-sized) and rebuild each doc's surviving token
    * stream. Docs with nothing flagged pass through complete. */
  private def rebuildWithoutSpans(base: DataFrame, flagged: DataFrame,
                                  idCol: String, n: Int): DataFrame = {
    // short docs (len < n) shingle to ONE all-words gram at pos 0 —
    // least(pos + n, len) covers both shapes
    val covered = flagged
      .select(col(idCol),
        explode(sequence(col("_pos"),
          least(col("_pos") + lit(n), col("_len")) - 1)).as("_idx"))
      .distinct()
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("_idx"))).as("_cov"))
    base.join(covered, Seq(idCol), "left")
      .withColumn("_cov", coalesce(col("_cov"), array().cast("array<long>")))
      .select(col(idCol),
        expr("array_join(filter(_w, (x, i) -> NOT array_contains(_cov, CAST(i AS BIGINT))), ' ')")
          .as("clean_text"),
        size(col("_w")).cast("long").as("n_tokens"),
        size(col("_cov")).cast("long").as("n_removed"))
  }

  def duplicatedGramProfile(docs: DataFrame, idCol: String, textCol: String,
                            n: Int = 10, hashHexChars: Int = 16): DataFrame = {
    require(hashHexChars >= 1 && hashHexChars <= 32,
      s"hashHexChars=$hashHexChars must be in [1, 32] (md5 is 32 hex chars)")
    import org.apache.spark.sql.types._
    val isIntegral = docs.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val grams = docs.select(
        col(idCol),
        posexplode(shingles(tokens(lower(cleanText(col(textCol)))), n))
          .as(Seq("_pos", "_gram")))
      .select(col(idCol),
        substring(md5(col("_gram")), 1, hashHexChars).as("_h"),
        col("_pos").cast("long").as("_pos"))
    val perDocGram = grams
      .groupBy(col("_h"), col(idCol))
      .agg(count(lit(1)).as("_cnt"), min(col("_pos")).as("_minpos"))
    val orderKey: Column =
      if (isIntegral) {
        val id = col(idCol).cast("long")
        when(id < lit(1L << 42) && id > lit(-(1L << 42)) &&
            col("_minpos") < lit(1L << 20),
          shiftleft(id, 20) + col("_minpos"))
          .otherwise(raise_error(lit(
            "duplicatedGramProfile packed order key overflow: " +
              "requires |id| < 2^42 and position < 2^20")).cast("long"))
      } else struct(col(idCol), col("_minpos"))
    val keyed = perDocGram.withColumn("_key", orderKey)
    val firsts = keyed
      .groupBy(col("_h"))
      .agg(min(col("_key")).as("_firstkey"))
    keyed.join(firsts, "_h")
      .groupBy(col(idCol))
      .agg(sum(col("_cnt")).as("n_grams"),
        sum(col("_cnt") -
          when(col("_key") === col("_firstkey"), 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_fraction",
        stableRound(col("n_dup").cast("double") / col("n_grams")))
  }
}
