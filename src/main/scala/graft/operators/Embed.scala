package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deterministic embedding stand-in (SURVEY.md §2 F-3) + L2 normalize (F-2).
  *
  * The reference embeds via an external model service
  * (`ollama_embed_text` app/main.py:134-145, mxbai-embed-large, dim 1024).
  * Our Spark-native stand-in is a hashed bag-of-words ("hashing trick")
  * projection: token → md5-derived bucket and ±1 sign, summed per bucket,
  * then L2-normalized with the reference's 1e-9 epsilon (app/main.py:316).
  *
  * Design notes for scale:
  *  - It is a pure per-row expression (no explode→groupBy→pivot shuffle):
  *    embedding a corpus is map-only, so it parallelizes trivially and
  *    pipelines into the downstream normalize + index write.
  *  - It is deterministic across JVMs and engines (md5 hex arithmetic, no
  *    engine-native hash, no RNG) — required for the DuckDB oracle and for
  *    re-ingestion idempotency.
  *  - Cost is O(dim × tokens) per row from the transform×aggregate nesting;
  *    fine for dim 64. For large dims switch to the explode/agg form or a
  *    custom TypedImperativeAggregate.
  */
object Embed {

  /** Hashed bag-of-words embedding of a text column → array<double>[dim].
    * md5 is computed once per token (the (bucket, sign) pair array), then
    * the dim × tokens accumulation is pure arithmetic. */
  def embedText(text: Column, dim: Int = graft.Schemas.EmbeddingDim): Column = {
    val toks = tokens(lower(text))
    val pairs = transform(toks, t => struct(md5Bucket(t, dim).as("b"), md5Sign(t).as("s")))
    transform(
      sequence(lit(0), lit(dim - 1)),
      j => aggregate(pairs, lit(0.0),
        (acc, p) => acc + when(p.getField("b") === j, p.getField("s")).otherwise(lit(0.0))))
  }

  /** text column → L2-normalized embedding column.
    *
    * Scale shape: explode tokens → hash once per token → partial-agg the
    * ±1 signs per (row, bucket) → assemble the dense vector from a map.
    * This is O(tokens + dim) per row with md5 inside codegen, vs the
    * per-row expression form's O(dim × tokens) interpreted lambdas — at
    * the reference's dim=1024 the difference is ~30×. Bucket sums are
    * exact ±1 integer sums, so results are bitwise identical to
    * [[embedText]] regardless of aggregation order.
    *
    * Rows whose text has no tokens keep the zero vector (reference's
    * blank-embed sentinel, app/embedding_gen.py:147-148). */
  def withEmbedding(df: DataFrame, textCol: String, outCol: String,
                    dim: Int = graft.Schemas.EmbeddingDim): DataFrame = {
    // freeze row ids so both join branches see the same assignment
    val withId = df.withColumn("_rowid", monotonically_increasing_id()).localCheckpoint(false)
    val toks = withId.select(col("_rowid"),
      explode(tokens(lower(col(textCol)))).as("_t"))
    val vecs = toks
      .select(col("_rowid"), md5Bucket(col("_t"), dim).as("_b"), md5Sign(col("_t")).as("_s"))
      .groupBy("_rowid", "_b").agg(sum("_s").as("_v"))
      .groupBy("_rowid")
      .agg(map_from_entries(collect_list(struct(col("_b"), col("_v")))).as("_m"))
      .select(col("_rowid"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => coalesce(element_at(col("_m"), j), lit(0.0))).as("_rawvec"))
    withId.join(vecs, Seq("_rowid"), "left")
      .withColumn("_rawvec",
        coalesce(col("_rawvec"), array_repeat(lit(0.0), lit(dim))))
      .withColumn("_l2norm", l2Norm(col("_rawvec")))
      .withColumn(outCol, l2NormalizeWith(col("_rawvec"), col("_l2norm")))
      .drop("_rowid", "_rawvec", "_l2norm")
  }

  /** Embed a literal query string on the driver — mirrors the reference's
    * single-query embed path (app/main.py:172-180) without a remote call. */
  def embedQuery(spark: org.apache.spark.sql.SparkSession, query: String,
                 dim: Int = graft.Schemas.EmbeddingDim): Array[Double] = {
    val row = spark.range(1)
      .select(l2Normalize(embedText(lit(query), dim)).as("v"))
      .head()
    row.getSeq[Double](0).toArray
  }
}
