package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** LFU semantic cache, batch semantics (SURVEY.md §2 O-6, O-12, O-15, O-16).
  *
  * The reference mutates a Redis list in place (app/main.py:67-128); a
  * batch engine models the cache as versioned state: each operation maps an
  * input cache table to an output cache table. Semantics pinned by the
  * reference:
  *  - lookup hit iff best cosine ≥ threshold, INCLUSIVE (app/main.py:89)
  *  - hit bumps freq += 1 in place                      (app/main.py:92-96)
  *  - insert when full evicts the minimum-freq entry; ties break to the
  *    MOST RECENTLY inserted one: Redis LPUSH stores newest entries at
  *    index 0, and the reference's linear scan keeps the first strict
  *    minimum in list order (app/main.py:107-114), i.e. the newest.
  *    With insertion-ordered entry_ids that is the HIGHEST entry_id.
  *    The argmax lookup scan (app/main.py:78-87) tie-breaks the same
  *    way (first strict max in newest-first order).
  *
  * The cache is capacity-bounded (1000 rows) so every op here is
  * driver-cheap no matter how large the corpus is; at scale it would live
  * behind `flatMapGroupsWithState` (see streaming/SessionState.scala).
  */
object CacheLfu {

  /** Lookup + freq bump: returns the updated cache. The best-match row
    * (if ≥ threshold) gets freq+1; everything else is unchanged. */
  def touch(cache: DataFrame, queryVec: Seq[Double],
            threshold: Double = graft.Schemas.CacheThreshold): DataFrame = {
    val best = Similarity.cacheLookup(cache, "embedding", queryVec, threshold)
      .select(col("entry_id").as("_hit_id"))
    cache.join(broadcast(best), cache("entry_id") === col("_hit_id"), "left_outer")
      .withColumn("freq", when(col("_hit_id").isNotNull, col("freq") + 1).otherwise(col("freq")))
      .drop("_hit_id")
  }

  /** Bump one known entry's freq — for callers that already resolved the
    * hit (avoids re-running the cosine scan `touch` performs). */
  def touchById(cache: DataFrame, entryId: Long): DataFrame =
    cache.withColumn("freq",
      when(col("entry_id") === entryId, col("freq") + 1).otherwise(col("freq")))

  /** The entry the LFU policy would evict: the most recently inserted
    * (highest entry_id) among the minimum-freq rows — the reference's
    * newest-first list scan (see object scaladoc). */
  def evictionVictim(cache: DataFrame): DataFrame =
    cache.orderBy(col("freq").asc, col("entry_id").desc).limit(1)

  /** Insert an entry; evicts the LFU victim first when at capacity. */
  def put(cache: DataFrame, entry: DataFrame,
          capacity: Int = graft.Schemas.CacheCapacity): DataFrame = {
    val n = cache.count()
    val pruned =
      if (n >= capacity)
        cache.join(evictionVictim(cache).select(col("entry_id").as("_victim")),
          col("entry_id") === col("_victim"), "left_anti")
      else cache
    pruned.unionByName(entry)
  }
}
