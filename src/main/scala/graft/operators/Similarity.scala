package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** k-NN similarity retrieval (SURVEY.md §2 O-11, O-12, O-18, O-19).
  *
  * Reference: OpenSearch HNSW cosine k-NN (`search` app/main.py:347-373,
  * k=3 default app/main.py:467).
  *
  * Spark-first shapes:
  *  - Single query: score every row with a codegen'd cosine expression and
  *    `orderBy(desc).limit(k)` — Catalyst plans TakeOrderedAndProject, i.e.
  *    a per-partition top-k heap + a k-row merge on the driver. No full
  *    sort, no full shuffle: at 100 TB this moves k rows per partition.
  *  - Many queries: broadcast the (small) query side, score the cross
  *    product map-side, then per-query window rank ≤ k. The only shuffle is
  *    the rank's hash-partition by query_id.
  */
object Similarity {

  /** Exact top-k by cosine for one query vector (broadcast as a literal).
    * `tieBreak` must identify rows uniquely for deterministic results at
    * the k boundary (defaults to the first column — fine for unique-id
    * indexes; chunked indexes should pass e.g. Seq(doc_id, chunk_idx)). */
  def topK(index: DataFrame, vecCol: String, queryVec: Seq[Double], k: Int,
           simCol: String = "sim", tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val q = lit(queryVec.toArray)
    val ties = (if (tieBreak.nonEmpty) tieBreak else Seq(index.columns.head)).map(col)
    index
      .withColumn(simCol, cosine(col(vecCol), q))
      .orderBy(desc(simCol) +: ties: _*)
      .limit(k)
  }

  /** Batch k-NN: every row of `queries` against every row of `index`,
    * top-k per query. `queries` must be small enough to broadcast (it is
    * the per-request side; the index is the 100 TB side). */
  def knnJoin(queries: DataFrame, qIdCol: String, qVecCol: String,
              index: DataFrame, idCol: String, vecCol: String, k: Int,
              tieBreak: Seq[String] = Seq.empty): DataFrame = {
    // materialize each side's norm once; per-pair work is then one dot
    val q = queries.withColumn("_qnorm", l2Norm(col(qVecCol)))
    val i = index.withColumn("_inorm", l2Norm(col(vecCol)))
    val scored = i.crossJoin(broadcast(q))
      .withColumn("sim", cosineGiven(col(vecCol), col(qVecCol), col("_inorm"), col("_qnorm")))
    val ties = (if (tieBreak.nonEmpty) tieBreak else Seq(idCol)).map(col)
    val w = Window.partitionBy(col(qIdCol)).orderBy(desc("sim") +: ties: _*)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("_inorm", "_qnorm")
  }

  /** Semantic-cache lookup (O-12): linear scan, argmax cosine, hit iff
    * best ≥ threshold (inclusive — app/main.py:89). Returns 0 or 1 rows.
    * Sim ties break to the HIGHEST id: the reference scans the Redis list
    * newest-first (LPUSH order) keeping the first strict max
    * (app/main.py:78-87), so the most recent entry wins. */
  def cacheLookup(cache: DataFrame, vecCol: String, queryVec: Seq[Double],
                  threshold: Double = graft.Schemas.CacheThreshold): DataFrame = {
    val q = lit(queryVec.toArray)
    cache
      .withColumn("sim", cosine(col(vecCol), q))
      .orderBy(desc("sim"), col(cache.columns.head).desc)
      .limit(1)
      .filter(col("sim") >= threshold)
  }

  /** All pairs within a blocking key whose cosine ≥ threshold — the
    * embedding-cosine near-dup primitive. Blocking bounds the quadratic
    * term to within-block pairs; at scale the block key comes from an LSH
    * bucket (see Ann.scala) rather than a natural column. */
  def similarPairs(vecs: DataFrame, idCol: String, vecCol: String, blockCol: String,
                   threshold: Double): DataFrame = {
    val withNorm = vecs.withColumn("_nrm", l2Norm(col(vecCol)))
    val a = withNorm.select(col(blockCol).as("_blk"), col(idCol).as("id_a"),
      col(vecCol).as("_va"), col("_nrm").as("_na"))
    val b = withNorm.select(col(blockCol).as("_blk"), col(idCol).as("id_b"),
      col(vecCol).as("_vb"), col("_nrm").as("_nb"))
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosineGiven(col("_va"), col("_vb"), col("_na"), col("_nb")))
      .filter(col("sim") >= threshold)
      .select(col("_blk").as(blockCol), col("id_a"), col("id_b"), col("sim"))
  }
}
