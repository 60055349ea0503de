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
  *  - It is a pure per-row codegen expression ([[graft.functions.HashedBow]]:
  *    one md5 + bucket-accumulate loop, O(tokens + dim) per row). Embedding
  *    a corpus is map-only — no explode, no shuffle, no join-back — so it
  *    parallelizes trivially and pipelines into the index write.
  *  - It is deterministic across JVMs and engines (md5 arithmetic, no
  *    engine-native hash, no RNG) — required for the DuckDB oracle and for
  *    re-ingestion idempotency. ±1 bucket sums are exact integers in
  *    double, so results are independent of token accumulation order.
  */
object Embed {

  /** Hashed bag-of-words embedding of a text column → raw (unnormalized)
    * array<double>[dim]. Blank text → zero vector. */
  def embedText(text: Column, dim: Int = graft.Schemas.EmbeddingDim): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(graft.functions.HashedBow(expression(tokens(lower(text))), dim))
  }

  /** text column → L2-normalized embedding column (map-only projection).
    *
    * Rows whose text has no tokens keep the zero vector (reference's
    * blank-embed sentinel, app/embedding_gen.py:147-148). Pass `normCol`
    * to also retain the pre-normalization L2 norm. */
  def withEmbedding(df: DataFrame, textCol: String, outCol: String,
                    dim: Int = graft.Schemas.EmbeddingDim,
                    normCol: Option[String] = None): DataFrame = {
    val out = df
      .withColumn("_rawvec", embedText(col(textCol), dim))
      .withColumn("_l2norm", l2Norm(col("_rawvec")))
      .withColumn(outCol, l2NormalizeWith(col("_rawvec"), col("_l2norm")))
    normCol.map(n => out.withColumn(n, col("_l2norm")))
      .getOrElse(out)
      .drop("_rawvec", "_l2norm")
  }

  /** Alphanumeric-only token stream for the TF-IDF variant (strips the
    * punctuation that dominates hash collisions on real corpora). */
  private def alnumTokens(text: Column): Column =
    filter(transform(tokens(lower(text)), t => regexp_replace(t, "[^a-z0-9]", "")),
      t => length(t) > 0)

  /** TF-IDF-weighted hashed embedding over a corpus: bucket contributions
    * are tf × ln(1 + N/df) instead of raw ±1 counts, which stops
    * high-frequency tokens (and hash collisions with them) from drowning
    * the informative terms — the difference between noise and usable
    * retrieval on a real 100k-term vocabulary.
    *
    * Returns (embedded df, document-frequency table, corpus size); feed
    * the latter two to [[embedQueryTfIdf]] so queries live in the same
    * weighted space. All stats are computed with exact integer counts —
    * deterministic for a given corpus. Two aggregates + two joins, all
    * on (row, token) keys: scales linearly, never shuffles documents. */
  def withTfIdfEmbedding(df: DataFrame, textCol: String, outCol: String,
                         dim: Int = graft.Schemas.EmbeddingDim): (DataFrame, DataFrame, Long) = {
    val withId = df.withColumn("_rowid", monotonically_increasing_id()).localCheckpoint(false)
    val nDocs = withId.count()
    val toks = withId.select(col("_rowid"), explode(alnumTokens(col(textCol))).as("_t"))
    val tf = toks.groupBy("_rowid", "_t").agg(count(lit(1)).as("_tf"))
    val dfreq = tf.groupBy("_t").agg(count(lit(1)).as("_df")).localCheckpoint(false)
    val weighted = tf.join(dfreq, "_t")
      .select(col("_rowid"), md5Bucket16(col("_t"), dim).as("_b"),
        (md5Sign(col("_t")) * col("_tf") *
          log(lit(1.0) + lit(nDocs.toDouble) / col("_df"))).as("_w"))
    val vecs = weighted
      .groupBy("_rowid", "_b").agg(sum("_w").as("_v"))
      .groupBy("_rowid")
      .agg(map_from_entries(collect_list(struct(col("_b"), col("_v")))).as("_m"))
      .select(col("_rowid"), denseFromMap(col("_m"), dim).as("_rawvec"))
    val out = withId.join(vecs, Seq("_rowid"), "left")
      .withColumn("_rawvec", coalesce(col("_rawvec"), array_repeat(lit(0.0), lit(dim))))
      .withColumn("_l2norm", l2Norm(col("_rawvec")))
      .withColumn(outCol, l2NormalizeWith(col("_rawvec"), col("_l2norm")))
      .drop("_rowid", "_rawvec", "_l2norm")
    (out, dfreq, nDocs)
  }

  /** Embed a query in the TF-IDF space of a corpus (unseen tokens get the
    * maximum IDF, df=1). */
  def embedQueryTfIdf(spark: org.apache.spark.sql.SparkSession, query: String,
                      dfreq: DataFrame, nDocs: Long,
                      dim: Int = graft.Schemas.EmbeddingDim): Array[Double] = {
    import spark.implicits._
    val toks = Seq(query).toDF("q")
      .select(explode(alnumTokens(col("q"))).as("_t"))
      .groupBy("_t").agg(count(lit(1)).as("_tf"))
    val weighted = toks.join(dfreq, Seq("_t"), "left")
      .select(md5Bucket16(col("_t"), dim).as("_b"),
        (md5Sign(col("_t")) * col("_tf") *
          log(lit(1.0) + lit(nDocs.toDouble) / coalesce(col("_df"), lit(1L)))).as("_w"))
    val entries = weighted.groupBy("_b").agg(sum("_w").as("_v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val raw = Array.tabulate(dim)(j => entries.getOrElse(j, 0.0))
    val norm = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / (norm + 1e-9))
  }

  /** MLlib Word2Vec upgrade path (SURVEY §2 F-3): a learned embedding
    * that replaces the hashed stand-in when semantic quality matters and
    * determinism-by-construction is relaxed to determinism-by-seed.
    * Returns (model, docs + outCol) with the embedding as array<double>
    * for drop-in use with the Similarity operators. */
  def fitWord2Vec(docs: DataFrame, textCol: String, outCol: String,
                  dim: Int = graft.Schemas.EmbeddingDim, seed: Long = 42L,
                  minCount: Int = 1)
      : (org.apache.spark.ml.feature.Word2VecModel, DataFrame) = {
    val withToks = docs.withColumn("_toks", tokens(lower(col(textCol))))
    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("_toks").setOutputCol("_w2v")
      .setVectorSize(dim).setSeed(seed).setMinCount(minCount)
    val model = w2v.fit(withToks)
    val out = model.transform(withToks)
      .withColumn(outCol, org.apache.spark.ml.functions.vector_to_array(col("_w2v")))
      .drop("_toks", "_w2v")
    (model, out)
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
