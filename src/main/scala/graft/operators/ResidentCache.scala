package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DRIVER-RESIDENT LFU semantic cache — the reference's Redis taken
  * literally (app/main.py:56-128 keeps the whole cache as an in-memory
  * list in the serving process; cosine scans, freq bumps, and LFU
  * eviction are all local operations there). The DataFrame cache
  * ([[CacheLfu]]) is the oracle-gated batch model of that state; this
  * class is the SERVING-TIER medium: the cache is capacity-bounded
  * (≤1000 entries × dim floats — KB-to-MB scale at ANY corpus size, the
  * same index-scale-state argument as [[GraphIndex.hot]]), so holding
  * it in driver arrays removes the last two Spark jobs from a hot-tier
  * ask (the cache-probe collect and the insert's max(entry_id)
  * aggregate — the measured residual after the r17 resident-text fuse).
  *
  * SEMANTICS ARE THE PINNED REFERENCE SEMANTICS, bit-for-bit the
  * DataFrame ops (AskPipelineSpec pins the equivalence end to end):
  *  - lookup: argmax cosine (float entries cast to double element-wise,
  *    ascending-fold dot — [[graft.functions.DotProduct]]'s arithmetic),
  *    hit iff best ≥ threshold INCLUSIVE, sim ties → HIGHEST entry_id
  *    (the reference's newest-first Redis list scan; Spark-double
  *    ordering via [[Retrieval.cmpSparkDouble]] so even NaN/-0.0 edge
  *    inputs order like `desc("sim")`);
  *  - touch: freq += 1 on the id, silently a no-op if the entry was
  *    concurrently evicted ([[CacheLfu.touchById]]'s when-filter);
  *  - insert: entry_id = max(existing, 0) + 1 allocated at APPLY time;
  *    at/over capacity first evict the minimum-freq entry, ties →
  *    HIGHEST entry_id ([[CacheLfu.evictionVictim]]).
  *
  * THREAD-SAFETY: every public method synchronizes on this object —
  * lookups and effect merges are microsecond array scans, so one
  * monitor is not a throughput concern, and callers get the same
  * concurrent-arrival semantics as [[graft.AskServer]]'s
  * snapshot-probe-then-merge over the DataFrame medium (a probe sees
  * some consistent state; effects merge atomically, Touch on an
  * evicted id no-ops).
  */
final class ResidentLfuCache(val capacity: Int = graft.Schemas.CacheCapacity) {
  require(capacity >= 1, s"ResidentLfuCache: capacity=$capacity must be >= 1")

  private final class Entry(val id: Long, val vec: Array[Float],
                            val response: String, var freq: Int)
  private val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]

  private def cosineOf(vf: Array[Float], q: Array[Double]): Double = {
    require(vf.length == q.length,
      s"ResidentLfuCache: dimension mismatch (${vf.length} vs ${q.length})")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < vf.length) {
      val a = vf(i).toDouble
      dot += a * q(i)
      na += a * a
      nb += q(i) * q(i)
      i += 1
    }
    val sa = math.sqrt(na)
    val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
  }

  private def lookupUnsynced(queryVec: Array[Double],
                             threshold: Double): Option[(Long, String)] = {
    var best: Entry = null
    var bestSim = 0.0
    entries.foreach { e =>
      val s = cosineOf(e.vec, queryVec)
      if (best == null || Retrieval.cmpSparkDouble(s, bestSim) > 0 ||
          (Retrieval.cmpSparkDouble(s, bestSim) == 0 && e.id > best.id)) {
        best = e; bestSim = s
      }
    }
    // threshold test on the SPARK double ordering, same as the argmax
    // above: Similarity.cacheLookup's `sim >= threshold` filter is
    // Spark's nan-safe compare (NaN > any double), so a NaN cosine
    // from a degenerate stored vector must hit on BOTH media — plain
    // Java `>=` would miss here while the DataFrame medium hits
    if (best != null && Retrieval.cmpSparkDouble(bestSim, threshold) >= 0)
      Some((best.id, best.response))
    else None
  }

  /** Index of the LFU eviction victim: minimum freq, ties → HIGHEST
    * entry_id (the reference's newest-first Redis list scan keeping
    * the first strict minimum — [[CacheLfu.evictionVictim]]). */
  private def victimIndex(): Int = {
    var victim = 0
    var i = 1
    while (i < entries.length) {
      val e = entries(i)
      val v = entries(victim)
      if (e.freq < v.freq || (e.freq == v.freq && e.id > v.id)) victim = i
      i += 1
    }
    victim
  }

  /** Snapshot max entry id with the DataFrame medium's
    * `coalesce(max(entry_id), 0)` semantics: 0 substitutes ONLY for an
    * empty cache — a non-empty cache reports its true max even if every
    * id is negative (externally-constructed caches; pipeline ids are
    * always ≥ 1). */
  private def maxIdUnsynced: Long =
    if (entries.isEmpty) 0L else entries.iterator.map(_.id).max

  /** [[Similarity.cacheLookup]]'s argmax, zero Spark jobs: Some((id,
    * response)) iff the best cosine ≥ threshold (inclusive). */
  def lookup(queryVec: Array[Double],
             threshold: Double = graft.Schemas.CacheThreshold): Option[(Long, String)] =
    synchronized(lookupUnsynced(queryVec, threshold))

  /** The batch probe — every query against ONE consistent state (the
    * [[AskPipeline.askBatch]] snapshot semantic, one critical section)
    * plus the snapshot's max entry id (0 when empty — askBatch's
    * insert-id base). */
  def probeBatch(queryVecs: Seq[Array[Double]],
                 threshold: Double = graft.Schemas.CacheThreshold)
      : (Seq[Option[(Long, String)]], Long) = synchronized {
    val hits = queryVecs.map(qv => lookupUnsynced(qv, threshold))
    (hits, maxIdUnsynced)
  }

  /** Insert with a CALLER-ASSIGNED id — [[AskPipeline.askBatchResident]]'s
    * merge step, which (like askBatch) allocates every miss's id from
    * the SNAPSHOT max rather than the evolving one. Same eviction rule
    * as [[applyEffect]]'s insert. */
  private[operators] def insertAssigned(id: Long, vec: Array[Float],
                                        answer: String): Unit = synchronized {
    if (entries.length >= capacity) entries.remove(victimIndex())
    entries += new Entry(id, vec, answer, 1)
  }

  /** Merge one ask's [[AskPipeline.CacheEffect]] — the
    * [[AskPipeline.applyCacheEffect]] twin on this medium. */
  def applyEffect(effect: AskPipeline.CacheEffect): Unit = synchronized {
    effect match {
      case AskPipeline.NoEffect => ()
      case AskPipeline.TouchEffect(id) =>
        entries.find(_.id == id).foreach(e => e.freq += 1)
      case AskPipeline.InsertEffect(vec, answer) =>
        val nextId = maxIdUnsynced + 1
        if (entries.length >= capacity) entries.remove(victimIndex())
        entries += new Entry(nextId, vec.toArray, answer, 1)
    }
  }

  def size: Int = synchronized(entries.length)

  private[operators] def load(id: Long, vec: Array[Float],
                              response: String, freq: Int): Unit = synchronized {
    entries += new Entry(id, vec, response, freq)
  }

  /** Drain an over-capacity load back to capacity by REPEATED
    * application of the eviction rule — the survivor set is exactly
    * what k sequential evictions on the DataFrame medium leave
    * ([[CacheLfu.evictionVictim]] applied k times), because insert
    * evicts exactly one per arrival and so can never drain a cache
    * that was loaded over capacity. */
  private[operators] def trimToCapacity(): Unit = synchronized {
    while (entries.length > capacity) entries.remove(victimIndex())
  }

  /** Export as the exact cache table (entry_id, embedding, response,
    * freq) — the spec-equivalence bridge and the interop path back to
    * the DataFrame medium. */
  def toDF(spark: SparkSession): DataFrame = synchronized {
    import spark.implicits._
    entries.toSeq.map(e => (e.id, e.vec.toSeq, e.response, e.freq))
      .toDF("entry_id", "embedding", "response", "freq")
  }
}

object ResidentLfuCache {
  /** Load an existing DataFrame cache (capacity-bounded rows by the
    * schema's contract — one bounded collect). An over-capacity input
    * is TRIMMED to capacity by repeated application of the eviction
    * rule (min freq, ties → highest id): insert evicts exactly one
    * entry per arrival, so an over-capacity load would otherwise stay
    * over capacity for the life of the process. The survivors equal
    * what k sequential [[CacheLfu.evictionVictim]] evictions leave on
    * the DataFrame medium (ResidentCacheSpec pins this). */
  def fromDF(cache: DataFrame,
             capacity: Int = graft.Schemas.CacheCapacity): ResidentLfuCache = {
    val rc = new ResidentLfuCache(capacity)
    cache.select("entry_id", "embedding", "response", "freq")
      .collect().sortBy(_.getLong(0)).foreach { r =>
        rc.load(r.getLong(0), r.getSeq[Float](1).toArray, r.getString(2), r.getInt(3))
      }
    rc.trimToCapacity()
    rc
  }
}
