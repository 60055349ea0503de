package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Scalar (int8) quantization of an embedding column — the storage tier
  * between full-precision parquet and [[Pq]]'s 8×-compressed codes.
  *
  * The reference ships its vectors to OpenSearch as float32
  * (app/embedding_gen.py:230-260; index schema app/main.py:262-283);
  * at 100 TB the dominant serving cost of that design is the scan
  * bandwidth of the vector column itself. SQ8 is the standard first
  * lever (Faiss `SQ8`, Lucene/OpenSearch `byte` vectors): store one
  * int8 code per component plus one scale per vector — exactly 4×
  * less scan bandwidth than float32 — and rank with the query kept in
  * full precision (asymmetric distance). Unlike PQ there is no
  * codebook to train or drift: quantization is per-vector, map-only,
  * and append-friendly (a new batch quantizes alone, no global pass).
  *
  * Quantization (replayed verbatim by the DuckDB oracle, so every
  * arithmetic choice is pinned cross-engine):
  *
  *   maxabs = max_i |x_i|            (exact double max — no fold-order issue)
  *   scale  = maxabs / 127.0
  *   code_i = floor(x_i / scale + 0.5)   (0 when scale = 0)
  *
  * `floor(x + 0.5)` is used instead of `round` because round-half
  * behavior differs between engines on exact .5 ties; floor is
  * bitwise-identical everywhere. Codes land in [-127, 127] (the +0.5
  * never lifts x/scale ∈ [-127, 127] past 127.5), so they fit a
  * TINYINT and the stored column is a true 1-byte-per-component array.
  *
  * Cosine over dequantized vectors equals cosine over raw codes (the
  * per-vector scale cancels), so ranking never multiplies the scale
  * back in; the scale column exists for dot-product / L2
  * reconstruction consumers.
  *
  * Scale shape: [[quantize]] is a pure projection (no shuffle, stays
  * in whole-stage codegen); [[searchTopK]] is a
  * TakeOrderedAndProject over the code scan (per-partition heap, k-row
  * merge, no shuffle); [[searchRerank]] re-scores a k-bounded
  * candidate set against the full-precision store through a pushed-down
  * id filter — the two-tier layout where only the int8 tier is scanned
  * wide.
  */
object Sq {

  /** Per-component int8 codes + per-vector scale for `vecCol`.
    * Output columns: `codeCol` (array<tinyint>), `scaleCol` (double).
    * Map-only; the zero vector quantizes to all-zero codes, scale 0. */
  def quantize(index: DataFrame, vecCol: String,
               codeCol: String = "sq_code", scaleCol: String = "sq_scale"): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    index
      .withColumn(scaleCol, scale)
      .withColumn(codeCol,
        when(col(scaleCol) === lit(0.0),
          transform(v, _ => lit(0).cast("byte")))
        .otherwise(
          transform(v, x => floor(x / col(scaleCol) + lit(0.5)).cast("byte"))))
  }

  /** Approximate top-k: cosine of the full-precision query against the
    * raw codes (scale cancels in cosine). One codegen'd scan of the
    * 1-byte tier — [[Ann.bruteForceTopK]]'s ranking discipline over
    * the code column (TakeOrderedAndProject, no shuffle). */
  def searchTopK(quantized: DataFrame, idCol: String, queryVec: Seq[Double], k: Int,
                 codeCol: String = "sq_code"): DataFrame =
    Ann.bruteForceTopK(quantized, idCol, codeCol, queryVec, k)

  /** Two-stage search: SQ top-`candidates` prefilter over the int8
    * tier, exact full-precision re-rank of just those ids → top-k.
    * The candidate id set is k-bounded (collect is O(candidates)), so
    * the re-rank reads the float tier through a pushed-down id filter —
    * at 100 TB the wide scan touches only 1-byte codes and the float
    * column is read for `candidates` rows. */
  def searchRerank(quantized: DataFrame, index: DataFrame, idCol: String, vecCol: String,
                   queryVec: Seq[Double], k: Int, candidates: Int,
                   codeCol: String = "sq_code"): DataFrame = {
    require(candidates >= k, s"searchRerank: candidates ($candidates) must be >= k ($k)")
    val candIds = searchTopK(quantized, idCol, queryVec, candidates, codeCol)
      .select(idCol).collect().map(_.get(0)).toSeq
    Ann.rerankIds(index, idCol, vecCol, queryVec, k, candIds)
  }

  /** Persist the two-tier SQ8 store behind [[Ann.gatedPublish]]'s
    * stage→measure→rename recall gate — the same discipline the graph
    * ([[GraphIndex.buildServing]]), IVF ([[Ann.writeIvfIndexGated]])
    * and IVF-PQ ([[Pq.writeIvfPqIndexGated]]) publishes carry, closing
    * the last ungated index path. The store is ONE parquet dir holding
    * the original columns plus `sq_code`/`sq_scale`: the wide
    * approximate scan reads only the 1-byte codes (column pruning) and
    * the exact re-rank reads the float column for `candidates` rows
    * through a pushed-down id filter, so the store is self-contained
    * for [[searchRerank]] consumers. The gate probes the STAGED
    * artifact with that exact two-stage search against full-precision
    * brute force on the caller's query workload; a recall under
    * `recallFloor` (quantization collapse — components that differ
    * below the int8 resolution tie in the prefilter, and a tight
    * `candidates` then evicts true neighbors) discards the staging and
    * leaves any prior published store serving. Returns the measured
    * recall — the build's acceptance evidence. */
  def writeIndexGated(spark: SparkSession, index: DataFrame,
                      idCol: String, vecCol: String, indexDir: String,
                      queries: DataFrame, k: Int = 10, candidates: Int = 100,
                      recallFloor: Double = 0.9): Double = {
    import graft.functions.VectorFunctions.cosine
    import org.apache.spark.sql.expressions.Window
    val qcols = queries.columns
    require(qcols.length == 2,
      s"writeIndexGated: queries must be (query_id, vector), got ${qcols.toSeq}")
    val qDf = queries.select(col(qcols(0)).as("_qid"),
      col(qcols(1)).cast("array<double>").as("_qv"))
    val workload = qDf.collect()
      .map(r => (r.get(0), r.getSeq[Double](1).toSeq))
    require(workload.nonEmpty,
      "writeIndexGated: the query workload produced zero probes — " +
        "refusing to build a store that would publish ungated")
    Ann.gatedPublish(spark, indexDir, recallFloor, "Sq.writeIndexGated",
      s"k=$k, candidates=$candidates") { staging =>
      quantize(index, vecCol).write.mode("overwrite").parquet(staging)
    } { staged =>
      val w = Window.partitionBy("_qid").orderBy(desc("_sim"), col(idCol))
      val exact = index.crossJoin(broadcast(qDf))
        .withColumn("_sim", cosine(col(vecCol).cast("array<double>"), col("_qv")))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= k)
        .select(col("_qid"), col(idCol))
        .collect().groupBy(_.get(0)).map { case (q, rs) => q -> rs.map(_.get(1)).toSet }
      val store = spark.read.parquet(staged)
      val got: Map[Any, Set[Any]] = workload.map { case (qid, qv) =>
        (qid: Any) -> searchRerank(store, store, idCol, vecCol, qv, k, candidates)
          .select(col(idCol)).collect().map(_.get(0)).toSet[Any]
      }.toMap
      Ann.meanRecall(exact, got, k, "writeIndexGated")
    }
  }
}
