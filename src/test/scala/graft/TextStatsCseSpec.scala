package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** The fused-scan claim is only real if subexpression elimination
  * collapses the MANY syntactic `textStats(text)` instances that the
  * ratio helpers build into ONE evaluation per row — otherwise the
  * "fusion" silently multiplies string scans instead of removing them.
  * This pins the generated code, not just the semantics. */
class TextStatsCseSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  test("lang+quality projection evaluates graft_text_stats once per row") {
    // range-backed input: a LocalRelation would be constant-folded by
    // ConvertToLocalRelation and dodge codegen entirely
    val df = spark.range(4)
      .select(col("id").as("doc_id"),
        concat(lit("the quick brown fox "), col("id")).as("text"))
      .select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
        TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
        TextAnalysis.meanTokenLen(col("text")).as("mean_token_len"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, "projection fell out of whole-stage codegen")
    val code = wsc.map(_.doCodeGen()._2.body).mkString("\n")
    val calls = "evalStats\\(".r.findAllIn(code).size
    assert(calls == 1,
      s"expected exactly 1 evalStats call site (CSE), found $calls")
  }
}
