package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.stableRound

/** Distribution statistics for corpus profiling (the "what does this
  * 100 TB crawl look like" pass that precedes every curation decision):
  * per-group length quantiles, exact and sketched.
  *
  * Two paths on purpose:
  *  - [[lengthQuantiles]] uses Spark's exact `percentile` aggregate —
  *    linear-interpolated, identical semantics to DuckDB/Postgres
  *    `quantile_cont`, so it sits under the hash oracle. Exact
  *    percentile buffers each group's values on the reducer: fine for
  *    bounded group counts × bounded group sizes (a per-SOURCE profile —
  *    thousands of groups), wrong for 100 TB single-group use.
  *  - [[approxLengthQuantiles]] is the scale path: `percentile_approx`
  *    (t-digest-style sketch, fixed memory per group, mergeable
  *    map-side like any partial aggregate). StatsSpec bounds its error
  *    against the exact path.
  */
object Stats {

  /** Per-group exact quantiles of a numeric column: (groupCol, n, mean,
    * one p<q> column per requested quantile), rounded for oracle
    * stability. */
  def lengthQuantiles(df: DataFrame, groupCol: String, valCol: String,
                      qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(qs.nonEmpty, "no quantiles requested")
    val aggs = Seq(
      count(lit(1)).as("n"),
      stableRound(avg(col(valCol))).as("mean")) ++
      qs.map(q => stableRound(
        percentile(col(valCol), lit(q))).as(s"p${(q * 100).round}"))
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Sketched quantiles — same output shape as [[lengthQuantiles]] but
    * fixed memory per group at any scale. `accuracy` is Spark's
    * percentile_approx knob (1/accuracy relative rank error). */
  def approxLengthQuantiles(df: DataFrame, groupCol: String, valCol: String,
                            qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                            accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty, "no quantiles requested")
    val aggs = Seq(
      count(lit(1)).as("n"),
      stableRound(avg(col(valCol))).as("mean")) ++
      qs.map(q => percentile_approx(col(valCol), lit(q), lit(accuracy))
        .cast("double").as(s"p${(q * 100).round}"))
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
