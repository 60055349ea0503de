package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and shard packing for training-data pipelines
  * (north-star surface: corpus mixing and shard layout).
  *
  * Sampling here is HASH-based, not RNG-based, on purpose: at 100 TB a
  * sample must be reproducible across reruns, engines, partitionings and
  * cluster sizes — `rand(seed)` is none of those (it depends on row
  * order within partitions). An md5-derived uniform per row id is all of
  * them, keeps the decision a map-only codegen predicate, and never
  * flips earlier keep/drop decisions when new data arrives.
  */
object Sampling {

  /** Uniform in [0, 1) derived from the first 4 hex chars of md5(id) —
    * 65536 buckets, the same md5-hex discipline every other derived hash
    * in the engine uses (portable to the DuckDB oracle verbatim).
    * Delegates to the shared Catalyst tree behind the `graft_uniform`
    * SQL function, so DSL and SQL samples are identical by construction. */
  def uniformByHash(idCol: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(graft.GraftExtensions.uniformByHashExpr(expression(idCol)))
  }

  /** Keep ~`rate` of rows, decided per row id (map-only, no shuffle). */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(uniformByHash(col(idCol)) < lit(rate))

  /** Per-stratum sampling rates — the data-mixing primitive (e.g. keep
    * 100% of one source, 10% of a crawl). Strata absent from `rates`
    * are dropped (rate 0). */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
                           rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "need at least one stratum rate")
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(uniformByHash(col(idCol)) < rateCol)
  }

  /** Pack rows into training shards of ~`budgetTokens` tokens within a
    * stratum, in deterministic `idCol` order: a row joins shard
    * floor(tokens-before-it / budget), so each shard spans rows until
    * its start offset crosses the next budget boundary (a shard may
    * overrun by at most one document — the standard greedy layout).
    *
    * Scale: ONE running-sum window per stratum. At 100 TB a single
    * stratum's window would serialize into one task, so callers shard
    * the stratum first (e.g. stratumCol = (source, id div 1e6) — packing
    * is independent per bucket by construction since shard ids are
    * relative offsets). Integer `div`, not `/`: exact at any prefix sum
    * magnitude. */
  def packShards(df: DataFrame, stratumCol: String, idCol: String,
                 tokensCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokensCol).cast("long")).over(w))
      .withColumn("shard_id",
        expr(s"(_cum - cast($tokensCol as long)) div ${budgetTokens}L"))
      .drop("_cum")
  }

  /** [[packShards]] that PARALLELIZES within a stratum — the 100 TB form.
    * Rows are bucketed by `idCol div bucketRows` inside each stratum and
    * each bucket runs its own running-sum window concurrently; a tiny
    * side aggregate (one row per bucket) prefix-sums the per-bucket token
    * totals so every row's global cumulative offset — and therefore its
    * shard id — is IDENTICAL to the single-window [[packShards]], for any
    * bucketRows (global cumsum = bucket prefix + local cumsum; SamplingSpec
    * asserts the equivalence). Requires a numeric `idCol` (the bucket is
    * integer `div`); the bucket-totals broadcast is one row per ~bucketRows
    * input rows, KBs/MBs at any realistic scale. */
  def packShardsBucketed(df: DataFrame, stratumCol: String, idCol: String,
                         tokensCol: String, budgetTokens: Long,
                         bucketRows: Long = 1000000L): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(bucketRows > 0, "bucketRows must be positive")
    val b = df.withColumn("_bucket", expr(s"cast($idCol as long) div ${bucketRows}L"))
    val totals = b.groupBy(col(stratumCol), col("_bucket"))
      .agg(sum(col(tokensCol).cast("long")).as("_btokens"))
    // per-stratum prefix over BUCKETS: |buckets| rows, not |rows| — the
    // only sequential piece, and it is corpus_size/bucketRows small
    val wb = Window.partitionBy(col(stratumCol)).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val starts = totals
      .withColumn("_bstart", sum(col("_btokens")).over(wb) - col("_btokens"))
      .select(col(stratumCol), col("_bucket"), col("_bstart"))
    val wl = Window.partitionBy(col(stratumCol), col("_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.join(broadcast(starts), Seq(stratumCol, "_bucket"))
      .withColumn("_cum", sum(col(tokensCol).cast("long")).over(wl) + col("_bstart"))
      .withColumn("shard_id",
        expr(s"(_cum - cast($tokensCol as long)) div ${budgetTokens}L"))
      .drop("_cum", "_bstart", "_bucket")
  }
}
