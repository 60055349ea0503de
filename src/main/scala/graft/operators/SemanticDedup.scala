package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine

/** Embedding-space semantic deduplication (the SemDeDup recipe,
  * Abbas et al. 2023): cluster the corpus with a small coarse codebook,
  * then prune near-duplicate pairs WITHIN each cluster only — the
  * cluster assignment confines the quadratic pairwise term exactly the
  * way LSH banding confines MinHash.
  *
  * Scale posture:
  *  - assignment is [[Ann.assignCells]] — the codebook rides to every
  *    executor as a reference object and the argmax is one codegen'd
  *    map-only projection (zero shuffle, PlanSpec-pinned);
  *  - the pairwise stage is an equi-join on `cell_id` (hash join, never
  *    a cartesian) so only same-cell vectors are ever scored;
  *  - per-cell cost is quadratic in cell size: size the codebook so
  *    cells hold ~thousands of vectors (|codebook| ≈ N / 4k), and split
  *    any residual hot cell by a secondary key the way
  *    [[Dedup.jaccardPairs]] caps hot shingles.
  *
  * Keep/drop rule (deterministic, engine-portable): a vector is dropped
  * iff ANY same-cell vector with a LOWER id — kept or itself dropped —
  * has cosine ≥ tau; `dup_of` is the lowest such id, which may
  * therefore point at a dropped vector. This is deliberately NOT the
  * sequential greedy exemplar scan of the SemDeDup paper (drop iff
  * within tau of a KEPT lower-id vector): on a similarity chain
  * a→b→c with cos(a,b) ≥ tau, cos(b,c) ≥ tau, cos(a,c) < tau, the
  * greedy scan keeps c (its only kept predecessor a is far), while this
  * rule drops it (b is a lower-id near-neighbor, kept or not) — i.e. it
  * prunes one vector per tau-PATH, not per tau-clique, and over-prunes
  * relative to the paper on chains (SemanticDedupSpec pins this).
  * Chosen because it is one join + one aggregate that Catalyst
  * parallelizes freely and any SQL engine can replay (the DuckDB
  * oracle), whereas the greedy scan is an inherently sequential
  * per-cell fold. For exact per-clique canonicals, feed tau-pairs into
  * [[Dedup.clusters]] and keep each cluster's min id.
  */
object SemanticDedup {

  /** vecs(idCol, vecCol) × centroids(cIdCol, cVecCol) → one row per
    * input vector: (idCol, cell_id, is_kept, dup_of). `dup_of` is null
    * for kept vectors. */
  def dedup(vecs: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, cIdCol: String, cVecCol: String,
            tau: Double): DataFrame = {
    val cells = Ann.assignCells(vecs, idCol, vecCol, centroids, cIdCol, cVecCol)
      .select(col(idCol).as("_id"), col(vecCol).as("_vec"), col("cell_id"))
    val x = cells.select(col("_id").as("_xid"), col("_vec").as("_xvec"), col("cell_id"))
    val y = cells.select(col("_id").as("_yid"), col("_vec").as("_yvec"), col("cell_id"))
    val dups = x.join(y, Seq("cell_id"))
      .filter(col("_yid") < col("_xid") &&
        cosine(col("_xvec"), col("_yvec")) >= tau)
      .groupBy(col("_xid"))
      .agg(min(col("_yid")).as("dup_of"))
    cells.join(dups, cells("_id") === dups("_xid"), "left")
      .select(col("_id").as(idCol), col("cell_id"),
        col("dup_of").isNull.as("is_kept"), col("dup_of"))
  }

  /** Same-cell tau-pairs (id_a < id_b) — the edge list the Scaladoc of
    * [[dedup]] points at for EXACT per-clique canonicalization: feed
    * these into [[Dedup.clusters]] and keep each component's min id,
    * instead of [[dedup]]'s one-join per-tau-path approximation. Same
    * cell confinement, so the pair term stays Σ|cell|²/2. */
  def pairs(vecs: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, cIdCol: String, cVecCol: String,
            tau: Double): DataFrame = {
    val cells = Ann.assignCells(vecs, idCol, vecCol, centroids, cIdCol, cVecCol)
      .select(col(idCol).as("_id"), col(vecCol).as("_vec"), col("cell_id"))
    val x = cells.select(col("_id").as("id_a"), col("_vec").as("_xvec"), col("cell_id"))
    val y = cells.select(col("_id").as("id_b"), col("_vec").as("_yvec"), col("cell_id"))
    x.join(y, Seq("cell_id"))
      .filter(col("id_a") < col("id_b") &&
        cosine(col("_xvec"), col("_yvec")) >= tau)
      .select(col("id_a"), col("id_b"))
  }

  /** Incremental semantic dedup — the daily-increment production shape
    * one tier above [[Dedup.minhashIncrement]]: screen a NEW batch of
    * vectors against the accumulated corpus WITHOUT re-reading corpus
    * text, using only its persisted cell-assigned vector index (the
    * (id, vec, cell_id) shape [[Ann.assignCells]] produces and
    * [[Ann.writeIvfIndex]] persists). Status per new row:
    *  - `dup_corpus`: some same-cell index vector has cosine ≥ tau
    *    (`dup_of` = the lowest such corpus id — corpus wins ties, like
    *    the exact and MinHash tiers);
    *  - `dup_batch`: no corpus hit, but a lower-id same-cell batch
    *    vector is tau-close (`dup_of` = the lowest such id);
    *  - `new`: neither.
    * Like [[dedup]], the probe is CELL-CONFINED — a tau-close pair whose
    * vectors fall in different coarse cells is not flagged (SemDeDup's
    * confinement approximation, which is what keeps the pairwise term
    * off the full corpus).
    *
    * Parameter-drift guard (the failure mode the MinHash tier hit): an
    * index built with a DIFFERENT codebook than the probe's assigns the
    * same vector to different cells, so probes silently miss — every doc
    * reports 'new' and the audit corrupts without signal. Index cell ids
    * are therefore validated against the probe codebook inline in the
    * projected column (not a separate check Catalyst could prune away):
    * any index cell_id that is not a centroid id raises.
    *
    * Scale shape: assignment is the codegen map-only argmax; both
    * probes are equi-joins on cell_id (hash joins — same-cell vectors
    * only, never all-pairs); the centroid-id set broadcasts. On a
    * `partitionBy(cell_id)` store, a batch touching few cells reads few
    * partitions. */
  def semanticIncrement(newVecs: DataFrame, idCol: String, vecCol: String,
                        existingIndex: DataFrame,
                        centroids: DataFrame, cIdCol: String, cVecCol: String,
                        tau: Double): DataFrame = {
    val assigned = graft.Materialize(
      Ann.assignCells(newVecs, idCol, vecCol, centroids, cIdCol, cVecCol)
        .select(col(idCol).as("_id"), col(vecCol).as("_vec"), col("cell_id")))
    val cellType = existingIndex.schema(existingIndex.schema.fieldIndex("cell_id")).dataType
    val known = centroids.select(col(cIdCol).as("cell_id"))
      .withColumn("_known", lit(true))
    val guardedIdx = existingIndex
      .select(col("cell_id"), col(idCol).as("_cid"), col(vecCol).as("_cvec"))
      .join(broadcast(known), Seq("cell_id"), "left")
      .select(
        when(col("_known"), col("cell_id"))
          .otherwise(raise_error(concat(
            lit("semanticIncrement: index cell_id "), col("cell_id").cast("string"),
            lit(" is not a centroid id — the vector index was built with a " +
              "different codebook than this probe"))).cast(cellType))
          .as("cell_id"),
        col("_cid"), col("_cvec"))
    val corpusHit = assigned
      .join(guardedIdx, Seq("cell_id"))
      .filter(cosine(col("_vec"), col("_cvec")) >= tau)
      .groupBy(col("_id"))
      .agg(min(col("_cid")).as("_corpus_of"))
    val l = assigned.select(col("cell_id"), col("_id").as("_ida"), col("_vec").as("_va"))
    val r = assigned.select(col("cell_id"), col("_id").as("_idb"), col("_vec").as("_vb"))
    val batchHit = l.join(r, Seq("cell_id"))
      .filter(col("_ida") < col("_idb") &&
        cosine(col("_va"), col("_vb")) >= tau)
      .groupBy(col("_idb"))
      .agg(min(col("_ida")).as("_batch_of"))
    assigned.select(col("_id"), col("cell_id"))
      .join(corpusHit, Seq("_id"), "left")
      .join(batchHit.withColumnRenamed("_idb", "_id"), Seq("_id"), "left")
      .select(col("_id").as(idCol), col("cell_id"),
        when(col("_corpus_of").isNotNull, "dup_corpus")
          .when(col("_batch_of").isNotNull, "dup_batch")
          .otherwise("new").as("status"),
        coalesce(col("_corpus_of"), col("_batch_of")).as("dup_of"))
  }

  /** Embedding-space benchmark decontamination — the semantic
    * complement of [[Dedup.contamination]]: n-gram overlap misses
    * paraphrased or lightly-rewritten eval items; cosine against the
    * benchmark's embeddings catches them. Flags every corpus vector
    * whose cosine vs ANY benchmark vector is ≥ tau, returning
    * (idCol, n_bench_hits, max_sim, worst_bench_id) for flagged rows —
    * worst_bench_id is the highest-similarity benchmark item (ties to
    * the lowest id), i.e. the item to cite when quarantining the doc.
    *
    * Scale shape: benchmark suites are tiny next to a 100 TB corpus,
    * so the bench side BROADCASTS and the corpus side is one map-only
    * pass (broadcast nested-loop fan-out, |bench| cosines per doc)
    * into a partial-aggregable per-doc reduction — the only shuffle
    * carries (id, hits, max) for FLAGGED docs, a contamination-rate
    * fraction of the corpus. Pre-filter the bench side with LSH/IVF
    * cells to cut the per-doc fan-out when |bench| grows. */
  def contamination(corpus: DataFrame, bench: DataFrame,
                    idCol: String, vecCol: String,
                    benchIdCol: String, benchVecCol: String,
                    tau: Double): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).as("_cv"))
    val b = bench.select(col(benchIdCol).as("_bid"), col(benchVecCol).as("_bv"))
    c.crossJoin(broadcast(b))
      .withColumn("_sim", cosine(col("_cv"), col("_bv")))
      .filter(col("_sim") >= tau)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bench_hits"),
        max(col("_sim")).as("max_sim"),
        // argmax with ties to the LOWEST bench id — min_by/max_by is
        // partial-aggregable (each map task reduces before the shuffle),
        // unlike a row_number window over all scored pairs. The key
        // negates the SIM (always numeric), not the bench id, so string
        // ids order correctly too instead of failing analysis on a cast
        min_by(col("_bid"), struct((-col("_sim")).as("s"), col("_bid").as("t")))
          .as("worst_bench_id"))
  }
}
