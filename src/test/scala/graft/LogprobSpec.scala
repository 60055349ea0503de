package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

class LogprobSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  test("hand-computed smoothing: in-vocab and OOV floor paths") {
    // corpus: "a a b" / "a z". counts: a=3, b=1, z=1. vocabSize=2 keeps
    // {a:3, b:1} (tie b<z broken lexicographically). N=4, V+1=3.
    // P(a)=(3+1)/7, P(b)=(1+1)/7, OOV=(0+1)/7.
    val docs = Seq((0L, "a a b"), (1L, "a z")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogprob(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val pA = math.log(4.0 / 7.0); val pB = math.log(2.0 / 7.0)
    val oov = math.log(1.0 / 7.0)
    assert(out(0L)._1 == 3L)
    assert(math.abs(out(0L)._2 - (2 * pA + pB) / 3.0) < 1e-6, s"got ${out(0L)._2}")
    assert(out(1L)._1 == 2L)
    assert(math.abs(out(1L)._2 - (pA + oov) / 2.0) < 1e-6, s"got ${out(1L)._2}")
  }

  test("gibberish scores below normal prose") {
    val docs = Seq(
      (0L, "the cat sat on the mat and the dog sat on the cat"),
      (1L, "zxqv wkjh pqzt mnbv zxqv qwer uiop asdf ghjk zzzz")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogprob(docs, "doc_id", "text", vocabSize = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < out(0L), s"gibberish ${out(1L)} !< prose ${out(0L)}")
  }

  test("importance weights: target-like docs up, target == corpus is zero") {
    val docs = Seq(
      (0L, "en", "the cat and the dog and the bird"),
      (1L, "en", "the fish and the cat and the mouse"),
      (2L, "xx", "zorp blug qwix zorp nlum vrek blug")
    ).toDF("doc_id", "lang", "text")
    val w = TextAnalysis.importanceWeights(docs, "doc_id", "text",
        target = docs.filter($"lang" === "en"), vocabSize = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(w(0L) > 0 && w(1L) > 0, s"target-like docs must gain: $w")
    assert(w(2L) < 0, s"off-target doc must lose: $w")
    // degenerate: target == corpus => identical models => weight 0
    val z = TextAnalysis.importanceWeights(docs, "doc_id", "text",
        target = docs, vocabSize = 8)
      .collect().map(_.getDouble(4))
    assert(z.forall(_ == 0.0), s"self-target weights: ${z.toSeq}")
  }

  test("bigram hand-computed: in-model, OOV-bigram and OOV-context paths") {
    // corpus bigrams: "a b" ×2 (doc0: a b a b → (a,b),(b,a),(a,b)), plus
    // (b,a) ×1, doc1: (a,c) ×1. bigramTop=2 keeps {(a,b):2, (a,c):1}
    // (tie (a,c) < (b,a) lexicographically). ctx from kept table:
    // a → 3. vocab {a,b,c} at vocabSize=8 → v1 = 4.
    // P(b|a)=(2+1)/(3+4)=3/7, P(a|b)=(0+1)/(3+4)? NO — context b not in
    // ctx → (0+1)/(0+4)=1/4. P(c|a)=(1+1)/(3+4)=2/7.
    val docs = Seq((0L, "a b a b"), (1L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogprob(docs, "doc_id", "text",
        vocabSize = 8, bigramTop = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val pAB = math.log(3.0 / 7.0); val pBA = math.log(1.0 / 4.0)
    val pAC = math.log(2.0 / 7.0)
    assert(out(0L)._1 == 3L)
    assert(math.abs(out(0L)._2 - (2 * pAB + pBA) / 3.0) < 1e-6, s"got ${out(0L)._2}")
    assert(out(1L)._1 == 1L)
    assert(math.abs(out(1L)._2 - pAC) < 1e-6, s"got ${out(1L)._2}")
  }

  test("bigram catches scrambled word order that unigram cannot see") {
    // doc 10 is a word-order scramble of the SAME multiset the 10
    // fluent docs use, so the unigram scores are EXACTLY equal — only
    // the bigram conditional can separate them (its bigrams occur once
    // in the corpus vs 10× for the fluent pattern)
    val fluent = "the cat sat on the mat"
    val scrambled = "mat the on sat cat the"
    val docs = ((0L until 10L).map(i => (i, fluent)) :+ (10L, scrambled))
      .toDF("doc_id", "text")
    val uni = TextAnalysis.unigramLogprob(docs, "doc_id", "text", vocabSize = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bi = TextAnalysis.bigramLogprob(docs, "doc_id", "text",
        vocabSize = 16, bigramTop = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(0L) == uni(10L),
      s"unigram is word-order-blind, scores must tie exactly: $uni")
    assert(bi(0L) > bi(10L) + 0.5,
      s"bigram must prefer the corpus' consistent word order: $bi")
  }

  test("bigram: single-token and empty docs are absent; n_bigrams = tokens - 1") {
    val docs = Seq((0L, "one"), (1L, ""), (2L, "two words here")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogprob(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(2L))
    assert(out(2L) == 2L)
  }

  test("bigram partitioning-invariant (sorted fold)") {
    val docs = (0 until 120)
      .map(i => (i.toLong, s"tok$i the of and word${i % 7} tok${i % 13} the of"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.bigramLogprob(docs.repartition(1), "doc_id", "text", 16, 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = TextAnalysis.bigramLogprob(docs.repartition(17), "doc_id", "text", 16, 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("partitioning-invariant (sorted fold)") {
    val docs = (0 until 200)
      .map(i => (i.toLong, s"tok$i the of and word${i % 7} tok${i % 13}"))
      .toDF("doc_id", "text")
    val a = TextAnalysis.unigramLogprob(docs.repartition(1), "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = TextAnalysis.unigramLogprob(docs.repartition(17), "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }
}
