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

  /** Deterministic global shuffle into `nShards` ordered shards — the
    * training-order primitive: a model must not see the corpus in
    * storage order, yet the shuffle must be reproducible across reruns,
    * engines, and cluster sizes (rand(seed) is none of those). Each row
    * gets `shard` = its 16-bit md5 bucket of (salt ++ id) mod nShards
    * (map-only) and `pos` = its rank within the shard by full md5 hex
    * (ties by id), via ONE shard-partitioned window — no global sort,
    * no single-partition stage. A writer emitting each shard in pos
    * order materializes the epoch order; vary `salt` per epoch for a
    * fresh permutation. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    salt: String = ""): DataFrame = {
    require(nShards > 0, s"shuffleShards: nShards must be positive, got $nShards")
    val h = md5(concat(lit(salt), col(idCol).cast("string")).cast("binary"))
    df.withColumn("_h", h)
      .withColumn("shard", pmod(conv(substring(col("_h"), 1, 4), 16, 10).cast("long"),
        lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("_h"), col(idCol))).cast("long"))
      .drop("_h")
  }

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

  /** Leakage-proof train/validation split: assign each document to a
    * split by the md5-uniform of its DEDUP CLUSTER id, not its own id,
    * so every member of a near-dup cluster lands in the SAME split.
    * Splitting by doc id leaks: a val doc's near-duplicate sits in
    * train and the val loss stops measuring generalization — the
    * split-level counterpart of benchmark decontamination. `pairs` are
    * candidate near-dup edges (MinHash/SimHash/Jaccard — already
    * LSH-confined); docs in no pair are their own singleton cluster.
    * Appends (cluster_id, split) to `docs`.
    *
    * Scale: [[Dedup.clusters]] over the edge list (shuffles (id, label)
    * longs only), one left join on the doc id, then a map-only hash
    * predicate — the split decision itself never shuffles. */
  def leakproofSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                     valFraction: Double,
                     idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    require(valFraction >= 0.0 && valFraction <= 1.0,
      s"valFraction=$valFraction out of [0, 1]")
    val cl = Dedup.clusters(pairs, idA, idB).withColumnRenamed("id", "_cid")
    docs.join(cl, docs(idCol) === cl("_cid"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), docs(idCol)))
      .drop("_cid")
      .withColumn("split",
        when(uniformByHash(col("cluster_id")) < lit(valFraction), lit("val"))
          .otherwise(lit("train")))
  }

  /** Temperature-scaled corpus mixing (the multilingual-pretraining
    * α-sampling rule): stratum i contributes
    * floor(budget · n_i^α / Σ_j n_j^α) documents — α < 1 upweights
    * small strata, α = 1 is proportional allocation. Within a stratum
    * the quota goes to the lowest docs by md5-uniform (ties by id):
    * deterministic, engine-portable, and PREFIX-MONOTONE — growing the
    * budget only adds documents, never swaps one (SamplingSpec pins
    * both properties).
    *
    * Float portability: the weight total is a sorted-list fold (the
    * q_entropy trick) so both engines add the same doubles in the same
    * order, and α = 0.5 uses `sqrt` (IEEE exactly-rounded, unlike
    * `pow`) — targets land on identical doubles before `floor`.
    *
    * Scale: the target table is |strata| rows (broadcast); ranking is
    * one row_number window per stratum. For corpus-sized strata use
    * [[stratifiedHashSample]] with rate_i = target_i / n_i — the
    * map-only expected-count form of the same mixture. */
  def temperatureMix(df: DataFrame, idCol: String, stratumCol: String,
                     budget: Long, alpha: Double = 0.5): DataFrame = {
    require(budget >= 0, s"budget=$budget must be non-negative")
    require(alpha > 0.0, s"alpha=$alpha must be positive")
    val n = col("_n").cast("double")
    val weighted = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_w", if (alpha == 0.5) sqrt(n) else pow(n, lit(alpha)))
    // strata are few by contract: the all-rows window is |strata| rows
    val all = Window.partitionBy()
    val targets = weighted
      .withColumn("_tot",
        aggregate(array_sort(collect_list(col("_w")).over(all)),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("_target",
        floor(lit(budget.toDouble) * col("_w") / col("_tot")).cast("long"))
      .select(col(stratumCol), col("_target"))
    val rk = Window.partitionBy(col(stratumCol))
      .orderBy(uniformByHash(col(idCol)), col(idCol))
    df.withColumn("_rk", row_number().over(rk))
      .join(broadcast(targets), Seq(stratumCol))
      .filter(col("_rk") <= col("_target"))
      .drop("_rk")
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

  /** Pack documents into FIXED-LENGTH training sequences (the LM
    * dataloader layout: concatenate docs in deterministic id order,
    * cut every `seqLen` tokens, let docs straddle cuts). Each doc
    * occupies the global token interval [offset, offset + n) of its
    * stratum; the output has one row per (doc × overlapped sequence):
    *
    *  - `seq_id`: which fixed-length sequence the span lands in;
    *  - `tok_begin` / `tok_end`: the span's half-open position WITHIN
    *    the sequence (0-based, ≤ seqLen);
    *  - `doc_tok_begin`: where the span starts WITHIN the doc — so a
    *    loader can slice the doc's token array directly.
    *
    * Every sequence is exactly seqLen tokens except its stratum's last;
    * spans tile each sequence with no gaps or overlaps (SamplingSpec
    * asserts both). Zero-token docs are dropped.
    *
    * Scale: same shape as [[packShards]] — one running-sum window per
    * stratum plus a map-only explode of each doc's overlapped sequence
    * range (a doc of n tokens emits ceil-ish(n/seqLen)+1 rows, so the
    * explode is output-proportional). For one huge stratum, compose
    * with the bucketed prefix-sum trick of [[packShardsBucketed]]. */
  def packSequences(df: DataFrame, stratumCol: String, idCol: String,
                    tokensCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(tokensCol).cast("long") > 0)
      .withColumn("_cum", sum(col(tokensCol).cast("long")).over(w))
      .withColumn("_off", col("_cum") - col(tokensCol).cast("long"))
      .withColumn("seq_id", explode(sequence(
        expr(s"_off div ${seqLen}L"), expr(s"(_cum - 1L) div ${seqLen}L"))))
      .withColumn("_sbase", col("seq_id") * seqLen)
      .withColumn("_gbegin", greatest(col("_off"), col("_sbase")))
      .withColumn("tok_begin", col("_gbegin") - col("_sbase"))
      .withColumn("tok_end",
        least(col("_cum"), col("_sbase") + seqLen) - col("_sbase"))
      .withColumn("doc_tok_begin", col("_gbegin") - col("_off"))
      .drop("_cum", "_off", "_sbase", "_gbegin")
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
