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
}
