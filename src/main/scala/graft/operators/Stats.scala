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

  /** Column name for quantile q — the decimal digits of q, right-padded
    * to two: 0.5→p50, 0.9→p90, 0.99→p99, 0.995→p995, 0.005→p005,
    * 0.01→p01. Derived from the full decimal so sub-percent quantiles
    * can't collide the way `round(q*100)` did (0.005 and 0.01 both
    * rounded to `p1`). */
  private[graft] def qName(q: Double): String = {
    require(q >= 0.0 && q <= 1.0, s"quantile $q out of [0, 1]")
    if (q == 0.0) "p0"
    else if (q == 1.0) "p100"
    else {
      val digits = BigDecimal(q).bigDecimal.stripTrailingZeros
        .toPlainString.drop(2) // "0.995" -> "995"
      "p" + (if (digits.length < 2) digits + "0" else digits)
    }
  }

  private def validated(qs: Seq[Double]): Seq[(Double, String)] = {
    require(qs.nonEmpty, "no quantiles requested")
    val named = qs.map(q => (q, qName(q)))
    val dups = named.groupBy(_._2).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"quantile column names collide: ${dups.mkString(", ")}")
    named
  }

  /** Per-group exact quantiles of a numeric column: (groupCol, n, mean,
    * one p<q> column per requested quantile), rounded for oracle
    * stability. */
  def lengthQuantiles(df: DataFrame, groupCol: String, valCol: String,
                      qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("n"),
      stableRound(avg(col(valCol))).as("mean")) ++
      validated(qs).map { case (q, name) =>
        stableRound(percentile(col(valCol), lit(q))).as(name) }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Sketched quantiles — same output shape as [[lengthQuantiles]] but
    * fixed memory per group at any scale. `accuracy` is Spark's
    * percentile_approx knob (1/accuracy relative rank error). */
  def approxLengthQuantiles(df: DataFrame, groupCol: String, valCol: String,
                            qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                            accuracy: Int = 10000): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("n"),
      stableRound(avg(col(valCol))).as("mean")) ++
      validated(qs).map { case (q, name) =>
        percentile_approx(col(valCol), lit(q), lit(accuracy))
          .cast("double").as(name) }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
