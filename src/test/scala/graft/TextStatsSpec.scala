package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._
import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.StopwordProfiles

/** The fused one-pass [[graft.functions.TextStats]] must be BITWISE
  * equal to the composable regexp forms it replaced — the DuckDB oracles
  * mirror those forms, so any divergence is an oracle-gate failure. The
  * composable definitions are reproduced here verbatim (as of the
  * pre-fusion TextAnalysis) and compared field-by-field on adversarial
  * strings plus the real documents table.
  */
class TextStatsSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  // ---- the pre-fusion composable forms (pinned copies) ----
  private def cTokenCount(text: Column): Column = size(tokens(text))
  private def cPunctRatio(text: Column): Column = {
    val t = cleanText(text)
    when(length(t) === 0, 0.0)
      .otherwise(length(regexp_replace(t, "[a-zA-Z0-9\\s]", "")).cast("double") / length(t))
  }
  private def cMeanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    val charSum = length(regexp_replace(cleanText(text), "\\s+", "")).cast("double")
    when(size(toks) === 0, 0.0).otherwise(charSum / size(toks))
  }
  private def cStopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    val all = StopwordProfiles.flatMap(_._2).distinct
    when(size(toks) === 0, 0.0)
      .otherwise(TextAnalysis.stopwordHits(toks, all).cast("double") / size(toks))
  }
  private def cLangId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = StopwordProfiles.map { case (lang, words) =>
      (lang, TextAnalysis.stopwordHits(toks, words))
    }
    val best = greatest(scored.map(_._2): _*)
    scored.foldLeft(when(best <= 0, lit("und"))) { case (acc, (lang, score)) =>
      acc.when(score === best, lit(lang))
    }.otherwise(lit("und"))
  }

  private def assertAgree(df: DataFrame): Unit = {
    val t = col("text")
    val bad = df.select(
      t.as("text"),
      TextAnalysis.tokenCount(t).as("f_tok"), cTokenCount(t).as("c_tok"),
      TextAnalysis.punctRatio(t).as("f_punct"), cPunctRatio(t).as("c_punct"),
      TextAnalysis.meanTokenLen(t).as("f_mtl"), cMeanTokenLen(t).as("c_mtl"),
      TextAnalysis.stopwordRatio(t).as("f_swr"), cStopwordRatio(t).as("c_swr"),
      TextAnalysis.langId(t).as("f_lang"), cLangId(t).as("c_lang"))
      .filter(col("f_tok") =!= col("c_tok") ||
        col("f_punct") =!= col("c_punct") ||
        col("f_mtl") =!= col("c_mtl") ||
        col("f_swr") =!= col("c_swr") ||
        col("f_lang") =!= col("c_lang"))
    val rows = bad.take(5)
    assert(rows.isEmpty, s"fused/composable disagree on: ${rows.mkString("; ")}")
  }

  test("fused stats ≡ composable forms on adversarial strings") {
    val cases = Seq(
      "the quick brown fox and the lazy dog",
      "",                       // empty
      "   ",                    // spaces only → empty clean
      "\n\n\n",                 // newlines → spaces → empty clean
      "\t",                     // tab survives trim → ["",""] = 2 tokens
      "\tleading tab",          // leading empty token
      "trailing tab\t",         // trailing empty token
      "a\t\tb",                 // multi-ws run
      "one",                    // single token, no ws
      "word\nbreaks\nacross\nlines",
      "punct!!! ... ;;; ???",
      "el la de y que en un una es por",   // es profile
      "der die und zu ist von ein",        // de profile
      "le la de et que en un une est pour",// fr (la/de/en/un shared with es)
      "café déjà-vu naïve",     // 2-byte UTF-8
      "emoji 😀 mixed 123",      // 4-byte code point → punct
      "Mixed CASE The THE tHe",
      "KK kelvin İstanbul",      // Kelvin sign, dotted capital I
      "  padded   both   ends  ",
      "tabs\tand  spaces \t mixed",
      "numbers 123 456.789 1e9",
      "\u000b vertical tab", // Java \s includes \x0B
      "x\r\ny crlf")
    assertAgree(cases.toDF("text"))
  }

  test("fused stats ≡ composable forms on the documents table (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assertAgree(docs.select(col("text")))
  }

  test("null text yields null stats fields, as before") {
    val r = Seq[Option[String]](None).toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.punctRatio(col("text")).as("p"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
