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

  case class AskResult(query: String, answer: String, fromCache: Boolean, prompt: String,
                       failed: Boolean = false)

  /** The reference's error answer when the LLM yields nothing — the
    * VERBATIM string from app/main.py:541 (clients match on it) — and
    * the one answer that must NEVER enter the cache or conversation
    * memory, or a transient model failure is served as a hit until
    * eviction. */
  val NoResponseAnswer = "Error: No response was generated. Please try later!"

  /** A cache mutation DECOUPLED from the snapshot it was computed
    * against, so concurrent asks can probe one snapshot in parallel and
    * serialize only the merge (the reference's Redis discipline: racing
    * requests both generate, writes serialize server-side). Applying a
    * Touch whose entry was concurrently evicted is a no-op by
    * [[CacheLfu.touchById]]'s construction; an Insert allocates its
    * entry_id at APPLY time, against the cache it lands in. */
  sealed trait CacheEffect
  case class TouchEffect(entryId: Long) extends CacheEffect
  case class InsertEffect(embedding: Seq[Float], answer: String) extends CacheEffect
  case object NoEffect extends CacheEffect

  /** Merge one ask's cache effect into `cache` (possibly a LATER version
    * than the snapshot the effect was computed against — see
    * [[CacheEffect]]). */
  def applyCacheEffect(cache: DataFrame, effect: CacheEffect,
                       capacity: Int = Schemas.CacheCapacity): DataFrame = effect match {
    case NoEffect => cache
    case TouchEffect(id) => CacheLfu.touchById(cache, id)
    case InsertEffect(vec, answer) =>
      import cache.sparkSession.implicits._
      val nextId = cache.agg(coalesce(max("entry_id"), lit(0L)).as("m")).head().getLong(0) + 1
      val entry = Seq((nextId, vec, answer, 1))
        .toDF("entry_id", "embedding", "response", "freq")
      CacheLfu.put(cache, entry, capacity)
  }

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
          graph: Option[GraphIndex.Serving] = None,
          generate: Option[String => String] = None): (AskResult, DataFrame) = {
    val (res, effect) = askStateless(spark, index, cache, query, history, topK,
      threshold, dim, queryVec, graph, generate)
    (res, applyCacheEffect(cache, effect, capacity))
  }

  /** The probe/compute half of [[ask]]: reads `cache` but never derives a
    * new version from it — mutations come back as a [[CacheEffect]] for
    * the caller to [[applyCacheEffect]] (immediately, like [[ask]], or
    * under a serving lock against a possibly-later cache — [[graft.AskServer]]'s
    * concurrent-arrival merge). A failed generation (empty hook answer)
    * returns [[NoResponseAnswer]] with `failed = true` and NO effect:
    * the error never poisons the cache (app/main.py:541-548). */
  def askStateless(spark: SparkSession, index: DataFrame, cache: DataFrame, query: String,
                   history: Option[String] = None, topK: Int = Schemas.DefaultTopK,
                   threshold: Double = Schemas.CacheThreshold,
                   dim: Int = Schemas.EmbeddingDim,
                   queryVec: Option[Array[Double]] = None,
                   graph: Option[GraphIndex.Serving] = None,
                   generate: Option[String => String] = None): (AskResult, CacheEffect) = {
    // queryVec overrides the default embedder — e.g. a TF-IDF-space vector
    // from Embed.embedQueryTfIdf when the index was built in that space
    val qVec = queryVec.getOrElse(Embed.embedQuery(spark, query, dim))

    val hit = Similarity.cacheLookup(cache, "embedding", qVec.toSeq, threshold)
      .select("entry_id", "response").collect().headOption

    hit match {
      case Some(row) =>
        // cache hit: return cached answer, bump the hit entry's freq
        // (by id — the lookup above already paid for the cosine scan)
        (AskResult(query, row.getString(1), fromCache = true, prompt = ""),
          TouchEffect(row.getLong(0)))

      case None =>
        retrieveGenerate(spark, index, query, history, topK, qVec, graph, generate)
    }
  }

  /** [[askStateless]] against a [[ResidentLfuCache]] — the fully
    * resident serving shape (r17): the cache probe is a driver array
    * scan (zero Spark jobs; with a resident-text hot tier the ENTIRE
    * miss path is also job-free). Same contract: reads the cache,
    * never mutates it — the effect merges via
    * [[ResidentLfuCache.applyEffect]], immediately ([[askResident]])
    * or under a serving lock ([[graft.AskServer]]'s concurrent-arrival
    * merge). */
  def askStatelessResident(spark: SparkSession, index: DataFrame,
                           cache: ResidentLfuCache, query: String,
                           history: Option[String] = None, topK: Int = Schemas.DefaultTopK,
                           threshold: Double = Schemas.CacheThreshold,
                           dim: Int = Schemas.EmbeddingDim,
                           queryVec: Option[Array[Double]] = None,
                           graph: Option[GraphIndex.Serving] = None,
                           generate: Option[String => String] = None): (AskResult, CacheEffect) = {
    val qVec = queryVec.getOrElse(Embed.embedQuery(spark, query, dim))
    cache.lookup(qVec, threshold) match {
      case Some((id, response)) =>
        (AskResult(query, response, fromCache = true, prompt = ""), TouchEffect(id))
      case None =>
        retrieveGenerate(spark, index, query, history, topK, qVec, graph, generate)
    }
  }

  /** [[ask]] on the resident medium: probe, compute, merge — mutating
    * the cache in place like the reference mutates Redis. */
  def askResident(spark: SparkSession, index: DataFrame,
                  cache: ResidentLfuCache, query: String,
                  history: Option[String] = None, topK: Int = Schemas.DefaultTopK,
                  threshold: Double = Schemas.CacheThreshold,
                  dim: Int = Schemas.EmbeddingDim,
                  queryVec: Option[Array[Double]] = None,
                  graph: Option[GraphIndex.Serving] = None,
                  generate: Option[String => String] = None): AskResult = {
    val (res, effect) = askStatelessResident(spark, index, cache, query, history,
      topK, threshold, dim, queryVec, graph, generate)
    cache.applyEffect(effect)
    res
  }

  /** [[askBatch]] on the resident medium (r17): every query probes ONE
    * cache snapshot ([[ResidentLfuCache.probeBatch]], a single critical
    * section), misses run the shared [[retrieveGenerate]] path (zero
    * Spark jobs per miss on a resident-text hot tier — the whole batch
    * is then job-free), and effects merge exactly like askBatch:
    * hit-freq bumps in input order, then one insert per miss with ids
    * allocated from the SNAPSHOT max (askBatch's rule — not the
    * evolving max the sequential loop uses). Returns results in input
    * order; the cache mutates in place. Spec-pinned equal to askBatch
    * on answers, flags, AND the exported cache table. Note: misses
    * retrieve ONE AT A TIME — right on the resident tier where each is
    * sub-millisecond compute; on non-resident tiers askBatch's single
    * batched retrieval amortizes better. */
  def askBatchResident(spark: SparkSession, index: DataFrame,
                       cache: ResidentLfuCache, queries: Seq[String],
                       topK: Int = Schemas.DefaultTopK,
                       threshold: Double = Schemas.CacheThreshold,
                       dim: Int = Schemas.EmbeddingDim,
                       queryVecs: Option[Seq[Array[Double]]] = None,
                       graph: Option[GraphIndex.Serving] = None): Seq[AskResult] = {
    require(queries.nonEmpty, "askBatchResident: empty query batch")
    val qVecs = queryVecs.getOrElse(queries.map(q => Embed.embedQuery(spark, q, dim)))
    require(qVecs.length == queries.length,
      s"askBatchResident: ${queries.length} queries but ${qVecs.length} vectors")
    val (hits, snapMax) = cache.probeBatch(qVecs, threshold)
    val results = queries.indices.map { i =>
      hits(i) match {
        case Some((_, resp)) =>
          AskResult(queries(i), resp, fromCache = true, prompt = "")
        case None =>
          retrieveGenerate(spark, index, queries(i), None, topK, qVecs(i),
            graph, None)._1
      }
    }
    // merge in input order: all hit bumps first, then one put per miss
    // (askBatch's order), ids from the snapshot max
    queries.indices.foreach(i =>
      hits(i).foreach { case (id, _) => cache.applyEffect(TouchEffect(id)) })
    var j = 0
    queries.indices.foreach { i =>
      if (hits(i).isEmpty) {
        cache.insertAssigned(snapMax + 1 + j,
          qVecs(i).map(_.toFloat), results(i).answer)
        j += 1
      }
    }
    results
  }

  /** The shared MISS path — retrieval, context, prompt, generation,
    * and the failure rule — identical whichever cache medium probed
    * (the DataFrame [[askStateless]] or the resident
    * [[askStatelessResident]]): the mediums can differ only in WHERE
    * the cache lives, never in what a miss computes. */
  private def retrieveGenerate(spark: SparkSession, index: DataFrame, query: String,
                               history: Option[String], topK: Int,
                               qVec: Array[Double],
                               graph: Option[GraphIndex.Serving],
                               generate: Option[String => String]): (AskResult, CacheEffect) = {
    {
        // RESIDENT-TEXT fast path (r17): a hot tier carrying the text
        // map serves the ENTIRE retrieval tail driver-side — walk,
        // top-k ordering, context blocks — zero Spark jobs between the
        // cache probe and the cache insert. Byte-identical to the
        // DataFrame tail by the shared-comparator discipline
        // (Retrieval.hitOrdering; spec-pinned in AskPipelineSpec).
        val localRows = graph match {
          case Some(hh: GraphIndex.Hot) => hh.topKLocalRows(qVec.toSeq, topK)
          case _ => None
        }
        val blocks: Seq[String] = localRows match {
          case Some(rows) => Retrieval.contextBlocksLocal(rows)
          case None =>
            val topDf = graph match {
              case Some(h) => h.topK(spark, qVec.toSeq, topK,
                tieBreak = Seq("doc_id", "chunk_idx"))
              case None => Similarity.topK(index, "embedding", qVec.toSeq, topK,
                tieBreak = Seq("doc_id", "chunk_idx"))
            }
            // THE SOLO FUSE: the hit set is ≤ topK rows by construction,
            // so the rank window + per-doc context aggregation + block
            // sort + prompt projection run DRIVER-SIDE on one collected
            // batch — one Spark job (the top-k fetch) instead of a
            // multi-stage aggregation job plus a prompt projection job.
            // Stage count × scheduler latency was most of the solo
            // hot-ask residual (SCALE.md); data volume here never
            // justified the stages. Byte-identical to the DataFrame
            // tail (contextBlocksLocal's contract, spec-pinned); an
            // exotic doc_id type — or any NULL field in the collected
            // hits (a null chunk_text would render the literal "null"
            // where concat_ws skips it; a null chunk_idx would NPE in
            // getLong) — keeps the declarative tail. NaN sims are fine:
            // contextBlocksLocal orders them exactly like Spark.
            import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
            val docType = topDf.schema(topDf.schema.fieldIndex("doc_id")).dataType
            lazy val fusedRows: Array[org.apache.spark.sql.Row] =
              topDf.select(col("doc_id"), col("chunk_idx").cast("long"),
                col("chunk_text"), col("sim")).collect()
            if ((docType == StringType || docType == LongType || docType == IntegerType)
                && fusedRows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)
                  && !r.isNullAt(2) && !r.isNullAt(3))) {
              Retrieval.contextBlocksLocal(fusedRows.toSeq.map(r =>
                (r.get(0), r.getLong(1), r.getString(2), r.getDouble(3))))
            } else {
              val hits = topDf.withColumn("rank", row_number().over(
                org.apache.spark.sql.expressions.Window
                  .orderBy(desc("sim"), col("doc_id"), col("chunk_idx"))))
              val ctx = Retrieval.renderContext(
                Retrieval.assembleContext(hits, "doc_id", "rank", "chunk_text"), "doc_id")
              ctx.orderBy("best_rank")
                .select("context_block").collect().map(_.getString(0)).toSeq
            }
        }
        val contextText = blocks.mkString("\n\n")
        val prompt = Retrieval.promptStringLocal(query, contextText, history)

        // the replaceable model call (app/main.py:537-541): a real
        // client (e.g. HttpGenerateClient.generate) receives the FULL
        // prompt, exactly like the reference's LLM; the default stub
        // extracts from the top context block so the pipeline stays
        // deterministic and oracle-gatable
        val answer = generate.map(g => g(prompt))
          .getOrElse(generateStub(blocks.headOption.getOrElse("")))

        // an empty hook answer is a FAILURE, not content — the real
        // clients (HttpGenerateClient) degrade to "" on any transport/
        // LLM error by contract, and caching that would serve the
        // failure as a hit until eviction (the stub never returns empty)
        if (answer.trim.isEmpty)
          (AskResult(query, NoResponseAnswer, fromCache = false, prompt,
            failed = true), NoEffect)
        else
          (AskResult(query, answer, fromCache = false, prompt),
            InsertEffect(qVec.map(_.toFloat).toSeq, answer))
    }
  }

  /** N concurrent asks against ONE cache snapshot — the reference holds
    * N open sessions at a time (app/main.py:616-647). Every stage is
    * batched: one per-query-argmax cache probe, ONE retrieval serving
    * all misses (the graph path walks the store once per hop for the
    * union of frontiers — [[GraphIndex.Serving.topKBatch]]), one keyed
    * context aggregation, one prompt projection. Cache semantics are
    * CONCURRENT-ARRIVAL: every query probes the initial snapshot (two
    * near-identical misses in one batch both generate, exactly as
    * racing requests do against the reference's Redis), then effects
    * merge in input order — hit-freq bumps first, one LFU put per miss
    * — so for queries that would not cross-hit, results AND the final
    * cache equal the sequential [[ask]] loop (spec-pinned).
    * Returns results in input order plus the updated cache. */
  def askBatch(spark: SparkSession, index: DataFrame, cache: DataFrame,
               queries: Seq[String], topK: Int = Schemas.DefaultTopK,
               threshold: Double = Schemas.CacheThreshold,
               capacity: Int = Schemas.CacheCapacity,
               dim: Int = Schemas.EmbeddingDim,
               queryVecs: Option[Seq[Array[Double]]] = None,
               graph: Option[GraphIndex.Serving] = None): (Seq[AskResult], DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty, "askBatch: empty query batch")
    val qVecs = queryVecs.getOrElse(queries.map(q => Embed.embedQuery(spark, q, dim)))
    require(qVecs.length == queries.length,
      s"askBatch: ${queries.length} queries but ${qVecs.length} vectors")
    val qdf = qVecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("query_id", "_qv")
    // batched cache probe: per-query argmax over the ≤capacity-row
    // cache, same hit rule as cacheLookup (ties → newest entry)
    val pw = Window.partitionBy("query_id").orderBy(desc("_sim"), col("entry_id").desc)
    val hitRows = cache.crossJoin(broadcast(qdf))
      .withColumn("_sim", cosine(col("embedding"), col("_qv")))
      .withColumn("_rn", row_number().over(pw))
      .filter(col("_rn") === 1 && col("_sim") >= threshold)
      .select("query_id", "entry_id", "response")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val missIdx = queries.indices.filterNot(i => hitRows.contains(i.toLong))
    val missAnswers: Map[Long, (String, String)] = // qid -> (answer, prompt)
      if (missIdx.isEmpty) Map.empty
      else {
        val missDf = missIdx.map(i => (i.toLong, qVecs(i).toSeq)).toDF("query_id", "_qv")
        val hits = (graph match {
          case Some(h) => h.topKBatch(spark, missDf, "query_id", "_qv", topK,
            tieBreak = Seq("doc_id", "chunk_idx"))
          case None => Similarity.knnJoin(missDf, "query_id", "_qv",
            index, "doc_id", "embedding", topK, tieBreak = Seq("doc_id", "chunk_idx"))
        }).select(col("query_id"), col("doc_id"), col("rank"), col("chunk_text"))
        val ctx = Retrieval.renderContext(
          Retrieval.assembleContextKeyed(hits, Seq("query_id", "doc_id"),
            "rank", "chunk_text"), "doc_id")
        val blocksByQid = ctx.orderBy("query_id", "best_rank")
          .select("query_id", "context_block").collect()
          .groupBy(_.getLong(0))
          .map { case (qid, rows) => qid -> rows.map(_.getString(1)).toSeq }
        val pdf = missIdx.map { i =>
          (i.toLong, queries(i), blocksByQid.getOrElse(i.toLong, Seq("")).mkString("\n\n"))
        }.toDF("query_id", "query", "context")
        val prompts = Retrieval.buildPrompt(pdf, "query", "context")
          .select("query_id", "prompt").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        missIdx.map { i =>
          val blocks = blocksByQid.getOrElse(i.toLong, Seq.empty)
          i.toLong -> ((generateStub(blocks.headOption.getOrElse("")), prompts(i.toLong)))
        }.toMap
      }
    // merge cache effects in input order: freq bumps for the hits (a
    // twice-hit entry bumps twice), then one LFU put per miss — put's
    // own eviction rule applies per insert, as sequential asks would
    val afterTouch = queries.indices.flatMap(i => hitRows.get(i.toLong))
      .foldLeft(cache)((c, hit) => CacheLfu.touchById(c, hit._1))
    val nextId = cache.agg(coalesce(max("entry_id"), lit(0L)).as("m")).head().getLong(0) + 1
    val updated = missIdx.zipWithIndex.foldLeft(afterTouch) { case (c, (i, j)) =>
      val entry = Seq((nextId + j, qVecs(i).map(_.toFloat).toSeq, missAnswers(i.toLong)._1, 1))
        .toDF("entry_id", "embedding", "response", "freq")
      CacheLfu.put(c, entry, capacity)
    }
    val results = queries.indices.map { i =>
      hitRows.get(i.toLong) match {
        case Some((_, resp)) => AskResult(queries(i), resp, fromCache = true, prompt = "")
        case None =>
          val (ans, prompt) = missAnswers(i.toLong)
          AskResult(queries(i), ans, fromCache = false, prompt)
      }
    }
    (results, updated)
  }
}
