package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable document-quality rule engine for training-data curation —
  * the Gopher (Rae et al. 2021) / C4 (Raffel et al. 2020) filtering
  * recipe as a configurable rule set instead of a fixed score.
  *
  * A rule is just (name, boolean Column): evaluation is ONE map-only
  * projection per document (every predicate below reads the shared
  * fused [[graft.functions.TextStats]] scan, so adding rules does not
  * add string passes), and the survival report is ONE hash-aggregate of
  * integer flags — both shapes scale linearly to 100 TB with zero
  * text ever crossing a shuffle.
  *
  * Unlike [[TextAnalysis.qualityScore]] (a soft composite signal), rules
  * are hard gates with per-rule attribution: a curation run can report
  * exactly WHY each document died, which is what a 100 TB pipeline needs
  * to debug a filter that eats 40% of a crawl.
  */
object QualityRules {

  /** Gopher-style default rule set over a text column. Thresholds are
    * parameters because every corpus tunes them (the Gopher paper's own
    * values assume web crawl English; see Rae et al. §A1.1). */
  def gopherRules(text: Column,
                  minWords: Int = 50,
                  maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0,
                  maxMeanWordLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  minStopwordHits: Int = 2,
                  maxRepetition: Double = 0.2): Seq[(String, Column)] = {
    val st = TextAnalysis.textStats(text)
    val nTokens = st.getField("n_tokens")
    val meanLen = when(nTokens === 0, 0.0)
      .otherwise(st.getField("nonws_chars").cast("double") / nTokens)
    val symRatio = when(st.getField("clean_len") === 0, 0.0)
      .otherwise(st.getField("punct_chars").cast("double") / st.getField("clean_len"))
    Seq(
      "min_words" -> (nTokens >= minWords),
      "max_words" -> (nTokens <= maxWords),
      "mean_word_len" -> (meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen),
      "symbol_ratio" -> (symRatio <= maxSymbolRatio),
      "stopwords" -> (st.getField("hits_all") >= minStopwordHits),
      "repetition" -> (TextAnalysis.repetitionRatio(text, 3) <= maxRepetition))
  }

  /** Evaluate a rule set: adds one boolean `r_<name>` column per rule,
    * plus `passed` (all rules hold) and `n_failed`. Pure projection. */
  def evaluate(docs: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "empty rule set")
    val flagged = rules.foldLeft(docs) { case (df, (name, pred)) =>
      df.withColumn(s"r_$name", pred)
    }
    flagged
      .withColumn("passed", rules.map(r => col(s"r_${r._1}")).reduce(_ && _))
      .withColumn("n_failed",
        rules.map(r => when(col(s"r_${r._1}"), 0).otherwise(1)).reduce(_ + _)
          .cast("long"))
  }

  /** Survival report over an [[evaluate]] result: total docs, survivors,
    * and per-rule kill counts — one aggregate, map-side combinable. */
  def survivalStats(evaluated: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      sum(when(col("passed"), 1L).otherwise(0L)).as("n_passed")) ++
      rules.map { case (name, _) =>
        sum(when(col(s"r_$name"), 0L).otherwise(1L)).as(s"killed_by_$name")
      }
    evaluated.agg(aggs.head, aggs.tail: _*)
  }
}
