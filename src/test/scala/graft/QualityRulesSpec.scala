package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityRules

class QualityRulesSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  // One doc per failure mode + one that passes everything. Defaults:
  // minWords=50 maxWords=100000 meanLen∈[3,10] symbols≤0.1 stops≥2 rep≤0.2
  // 62 words: 2 stopwords + 60 DISTINCT 4-char words (mean len ≈ 4,
  // zero 3-gram repetition, no symbols).
  private val goodText =
    ("the of " + (0 until 60).map(i => f"wd$i%02d").mkString(" ")).trim
  private def docs = Seq(
    (0L, goodText),                                // passes all
    (1L, "the of tiny"),                           // min_words
    (2L, ("the of and " + "x " * 60).trim),        // mean_word_len (≈1.9)
    (3L, goodText + " " + "!@#$%^&*()".flatMap(a => "!@".map(b => s"$a$b$a")).mkString(" ")), // symbol_ratio (20 distinct symbol tokens, no repetition)
    (4L, ("alpha beta gamma delta epsilon " * 14).trim), // stopwords + repetition
    (5L, ("the of and repeat me now " * 12).trim)  // repetition (stops pass)
  ).toDF("doc_id", "text")

  test("each gopher rule fires on its designed failure and only there") {
    val rules = QualityRules.gopherRules(col("text"))
    val out = QualityRules.evaluate(docs, rules)
      .select("doc_id", "r_min_words", "r_mean_word_len", "r_symbol_ratio",
        "r_stopwords", "r_repetition", "passed", "n_failed")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(0L).getBoolean(6), "good doc must pass")
    assert(out(0L).getLong(7) == 0)
    assert(!out(1L).getBoolean(1) && !out(1L).getBoolean(6))
    assert(!out(2L).getBoolean(2), "1-char filler fails mean_word_len")
    assert(!out(3L).getBoolean(3), "symbol soup fails symbol_ratio")
    assert(!out(4L).getBoolean(4), "no stopwords fails stopword rule")
    assert(!out(4L).getBoolean(5), "5-word loop fails repetition")
    assert(!out(5L).getBoolean(5) && out(5L).getBoolean(4))
  }

  test("survivalStats reconciles with per-doc flags") {
    val rules = QualityRules.gopherRules(col("text"))
    val ev = QualityRules.evaluate(docs, rules)
    val st = QualityRules.survivalStats(ev, rules).collect()(0)
    val byName = st.schema.fieldNames.zipWithIndex.toMap
    assert(st.getLong(byName("n_docs")) == 6)
    assert(st.getLong(byName("n_passed")) ==
      ev.filter(col("passed")).count())
    for ((name, _) <- rules)
      assert(st.getLong(byName(s"killed_by_$name")) ==
        ev.filter(!col(s"r_$name")).count(), s"rule $name")
  }

  test("rule evaluation is map-only (no Exchange in the plan)") {
    val rules = QualityRules.gopherRules(col("text"))
    val plan = QualityRules.evaluate(docs, rules)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("the gate runs unchanged on a stream and matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rules = QualityRules.gopherRules(col("text"))
    val batchExpected = QualityRules.evaluate(docs, rules)
      .select("doc_id", "passed", "n_failed")
      .as[(Long, Boolean, Long)].collect().toSet
    val rows = docs.as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = QualityRules.evaluate(input.toDF().toDF("doc_id", "text"), rules)
      .select("doc_id", "passed", "n_failed")
      .writeStream.outputMode("append").format("memory")
      .queryName("rules_out").start()
    input.addData(rows.take(3): _*)
    q.processAllAvailable()
    input.addData(rows.drop(3): _*)    // map-only => no state, any batching
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("rules_out")
      .as[(Long, Boolean, Long)].collect().toSet
    assert(streamed == batchExpected)
  }
}
